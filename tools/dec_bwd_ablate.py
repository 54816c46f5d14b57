"""Isolate the decoder-train backward (DECTRAIN_BISECT follow-up, r5).

Arms (b128/160, bf16, v5e — measured 2026-08-21):
  grad_full    value_and_grad wrt FULL param tree (trainer path)
               -> fwd 4.26 / bwd 13.50 ms
  grad_dec     value_and_grad wrt decoder subtree only (yolo closed over)
               -> fwd 3.99 / bwd 13.12 ms
  dec_only     decoder fwd/bwd on PRECOMPUTED random taps (encoder excluded
               from the program entirely)
               -> fwd 3.98 / bwd 13.24 ms

All three backwards agree ==> the encoder backward is confirmed elided (the
model-level stop_gradient taps, segpp.py:93-98) and the 13+ ms is the
DECODER's own conv backward on lane-starved 16-96ch shapes at 40²-160².
A bilinear->nearest upsample swap moves it only ~0.55 ms (VJP acquitted).
Accepted floor; see CLAUDE.md round-5 status.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/dec_bwd_ablate.py
"""
import os
import time
import numpy as np
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from yolou_tpu.losses.dice import soft_dice_loss
from yolou_tpu.models.segpp import YOLOSegPP
from yolou_tpu.models.yolo import parse_model_spec


def slope(fn, args, sumfn, iters=16):
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0
    run(1); run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return (tn - t1) / iters


b, s = 128, 160
spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
model = YOLOSegPP(spec=spec, dtype=jnp.bfloat16, use_pallas=True)
v = jax.device_get(jax.jit(lambda k, x: model.init(k, x, train=False))(
    jax.random.key(0), jnp.zeros((1, s, s, 4))))
params = jax.device_put(v["params"])
bs = jax.device_put(v["batch_stats"])

rng = np.random.default_rng(0)
img = jnp.asarray(rng.random((b, s, s, 4)), jnp.float32)
mask = jnp.asarray((rng.random((b, s, s, 1)) > 0.7), jnp.float32)
om = jnp.asarray(rng.random((b, s // 8, s // 8, 1)), jnp.float32)


def loss_full(p):
    (pred, _), _ = model.apply({"params": p, "batch_stats": bs},
                               img, logits=om, train=True,
                               mutable=["batch_stats"])
    return soft_dice_loss(pred, mask)


def loss_dec(dec_p):
    p = {**dec_p, "yolo": params["yolo"]}
    (pred, _), _ = model.apply({"params": p, "batch_stats": bs},
                               img, logits=om, train=True,
                               mutable=["batch_stats"])
    return soft_dice_loss(pred, mask)


dec_params = {k: x for k, x in params.items() if k != "yolo"}

for name, loss, p in (("grad_full", loss_full, params),
                      ("grad_dec", loss_dec, dec_params)):
    f = jax.jit(loss)
    g = jax.jit(jax.value_and_grad(loss))
    tf = slope(f, (p,), lambda x: float(x)) * 1e3
    tg = slope(g, (p,), lambda x: float(x[0])) * 1e3
    print(f"{name:10s} fwd {tf:6.2f} ms   grad {tg:6.2f} ms   "
          f"bwd {tg - tf:6.2f} ms", flush=True)

# decoder-only program: bind the decoder module directly on random taps with
# the s=160 shapes (stride-4 64ch, stride-8 128ch)
from yolou_tpu.models.segpp import SegPPDecoder

dec = SegPPDecoder(True, dtype=jnp.bfloat16)
s2 = jnp.asarray(rng.random((b, s // 4, s // 4, 64)), jnp.bfloat16)
s4 = jnp.asarray(rng.random((b, s // 8, s // 8, 128)), jnp.bfloat16)
dv = jax.jit(lambda k: dec.init(k, s2, s4, om, True))(jax.random.key(1))
dp = jax.device_put(jax.device_get(dv))


def loss_dec_only(p):
    pred, _ = dec.apply(p, s2, s4, om, True, mutable=["batch_stats"])
    return soft_dice_loss(pred.astype(jnp.float32), mask)


f = jax.jit(loss_dec_only)
g = jax.jit(jax.value_and_grad(loss_dec_only))
tf = slope(f, (dp,), lambda x: float(x)) * 1e3
tg = slope(g, (dp,), lambda x: float(x[0])) * 1e3
print(f"{'dec_only':10s} fwd {tf:6.2f} ms   grad {tg:6.2f} ms   "
      f"bwd {tg - tf:6.2f} ms", flush=True)
