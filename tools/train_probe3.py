"""Round-3 detector-train reconciliation probe.

aug_probe2 showed the full aug pipeline is now 2.5 ms (TRAIN_BISECT's 10.19
predates the reduce_instances rewrite), yet the benched aug+grad surface
(BENCH_EXTRA detector_train_ips_b32_160 = 1857.8 img/s) spends 17.2 ms while
its parts sum to ~9.6. This probe times, with one slope protocol:

  aug             augment_batch (mosaic) on device-resident u8
  grad_fixed      value_and_grad of fwd+loss on a FIXED augmented batch
  bench_step      exactly bench_extra's det_step (aug+grad+sum|g| tail)
  bench_step_lean same without the 630-leaf sum|g| reduction
  full_real       DetectorTrainer._build_step's true step (aug+grad+opt+EMA),
                  donated state — the honest product surface
  full_flat       same with the flat-buffer optimizer (engine/flat_opt.py)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/train_probe3.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from yolou_tpu.data.augment import AugHyp, augment_batch
from yolou_tpu.engine.trainer_detector import (DetectorTrainConfig,
                                               make_detector_tx)
from yolou_tpu.engine.flat_opt import make_flat_detector_opt
from yolou_tpu.losses.v8 import v8_loss
from yolou_tpu.models.yolo import build_yolo


def slope(fn, args, iters=16, fetch=None):
    if fetch is None:
        fetch = lambda o: float(sum(jnp.sum(t.astype(jnp.float32))
                                    for t in jax.tree_util.tree_leaves(o)
                                    if hasattr(t, "astype")))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        fetch(out)
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return max((tn - t1) / iters, 1e-9) * 1e3


def step(msg):
    print(f"[train_probe3] {msg}", flush=True)


def main(b=32, s=160, g=8, only=()):
    """only: subset of stage names to run (remote compiles are ~90s each and
    uncached; select stages to fit a timeout). Empty = all."""
    want = lambda name: not only or name in only
    rng = np.random.default_rng(0)
    det = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                     dtype=jnp.bfloat16, use_pallas=True)
    dv = jax.jit(lambda k, x: det.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, s, s, 4)))
    img_u8 = jnp.asarray(rng.integers(0, 255, (b, s, s, 4)), jnp.uint8)
    idmap = jnp.zeros((b, s, s), jnp.int32).at[:, 40:100, 40:120].set(1)
    cls = jnp.zeros((b, g), jnp.int32)
    valid = jnp.zeros((b, g), bool).at[:, 0].set(True)
    key = jax.random.key(1)
    params = dv["params"]
    bs0 = dv["batch_stats"]
    results = {}

    # ---- aug alone
    jaug = jax.jit(lambda i, k: augment_batch(
        i.astype(jnp.float32) / 255.0, idmap, cls, valid, k, AugHyp(),
        g_out=g))
    if want("aug"):
        step("aug")
        results["aug"] = slope(jaug, (img_u8, key))
        step(f"aug {results['aug']:.3f} ms")

    def loss_fn(p, batch):
        o, upd = det.apply({"params": p, "batch_stats": bs0},
                           batch["img"], train=True, mutable=["batch_stats"])
        lo = v8_loss(o.raw, o.mask_coefs, o.protos,
                     {"cls": batch["cls"], "bboxes": batch["bboxes"],
                      "valid": batch["valid"], "masks": batch["masks"]},
                     nc=1)
        return lo.total, upd

    # ---- grad on a fixed batch
    fixed = jax.device_get(jaug(img_u8, key))
    fixed = {k: jnp.asarray(v) for k, v in fixed.items()}
    jgrad = jax.jit(lambda p, bt: jax.value_and_grad(
        lambda pp: loss_fn(pp, bt)[0])(p))
    if want("grad_fixed"):
        step("grad_fixed")
        results["grad_fixed"] = slope(jgrad, (params, fixed),
                                      fetch=lambda o: float(o[0]))
        step(f"grad_fixed {results['grad_fixed']:.3f} ms")

    # ---- exactly the benched surface (aug + grad + sum|g|)
    @jax.jit
    def bench_step(p, img_u8, key):
        batch = augment_batch(img_u8.astype(jnp.float32) / 255.0, idmap,
                              cls, valid, key, AugHyp(), g_out=g)
        loss, grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, batch)[0])(p)
        return loss, sum(jnp.sum(jnp.abs(gg)) for gg in
                         jax.tree_util.tree_leaves(grads))

    if want("bench_step"):
        step("bench_step")
        results["bench_step"] = slope(bench_step, (params, img_u8, key),
                                      fetch=lambda o: float(o[0]))
        step(f"bench_step {results['bench_step']:.3f} ms")

    # ---- same without the per-leaf |g| reduction tail
    @jax.jit
    def bench_step_lean(p, img_u8, key):
        batch = augment_batch(img_u8.astype(jnp.float32) / 255.0, idmap,
                              cls, valid, key, AugHyp(), g_out=g)
        loss, grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, batch)[0])(p)
        return loss, grads

    if want("bench_step_lean"):
        step("bench_step_lean")
        results["bench_step_lean"] = slope(
            bench_step_lean, (params, img_u8, key),
            fetch=lambda o: float(o[0]))
        step(f"bench_step_lean {results['bench_step_lean']:.3f} ms")

    # ---- the real trainer step: grad + optax opt + EMA, donated
    cfg = DetectorTrainConfig(imgsz=s, batch_size=b, max_instances=g)
    tx, _, _, _ = make_detector_tx(cfg, steps_per_epoch=100)
    opt0 = tx.init(params)
    ema0 = jax.tree_util.tree_map(jnp.copy, params)

    @jax.jit
    def full_real(p, opt, ema, stp, img_u8, key):
        batch = augment_batch(img_u8.astype(jnp.float32) / 255.0, idmap,
                              cls, valid, key, AugHyp(), g_out=g)
        (loss, _), grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, batch), has_aux=True)(p)
        updates, new_opt = tx.update(grads, opt, p)
        new_p = optax.apply_updates(p, updates)
        stp = stp + 1
        d = cfg.ema_decay * (1 - jnp.exp(-stp / cfg.ema_tau))
        new_ema = jax.tree_util.tree_map(
            lambda e, pp: e * d + pp.astype(e.dtype) * (1 - d), ema, new_p)
        return new_p, new_opt, new_ema, stp, loss

    stp0 = jnp.zeros((), jnp.int32)
    if want("full_real"):
        step("full_real")
        results["full_real"] = slope(
            lambda *a: full_real(*a), (params, opt0, ema0, stp0, img_u8, key),
            fetch=lambda o: float(o[4]))
        step(f"full_real {results['full_real']:.3f} ms")

    # ---- the flat-optimizer variant
    flat = make_flat_detector_opt(cfg, 100, params)
    pflat0 = flat.ravel(params)
    fopt0 = flat.init(pflat0)

    @jax.jit
    def full_flat(p, fopt, eflat, stp, img_u8, key):
        batch = augment_batch(img_u8.astype(jnp.float32) / 255.0, idmap,
                              cls, valid, key, AugHyp(), g_out=g)
        (loss, _), grads = jax.value_and_grad(
            lambda pp: loss_fn(pp, batch), has_aux=True)(p)
        pflat = flat.ravel(p)
        new_pflat, new_fopt = flat.update(grads, fopt, pflat)
        new_p = flat.unravel(new_pflat)
        stp = stp + 1
        d = cfg.ema_decay * (1 - jnp.exp(-stp / cfg.ema_tau))
        new_eflat = eflat * d + new_pflat * (1 - d)
        return new_p, new_fopt, new_eflat, stp, loss

    if want("full_flat"):
        step("full_flat")
        results["full_flat"] = slope(
            lambda *a: full_flat(*a),
            (params, fopt0, pflat0, stp0, img_u8, key),
            fetch=lambda o: float(o[4]))
        step(f"full_flat {results['full_flat']:.3f} ms")

    if want("full_real") and want("full_flat"):
        # parity: one step both ways
        po = full_real(params, opt0, ema0, stp0, img_u8, key)[0]
        pf = full_flat(params, fopt0, pflat0, stp0, img_u8, key)[0]
        md = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, c: float(jnp.max(jnp.abs(a - c))), po, pf)))
        results["flat_vs_optax_max_diff"] = md
        step(f"flat vs optax params max diff {md:.3e}")
    if "bench_step" in results:
        results["ips_bench_step"] = b / results["bench_step"] * 1e3
    if "full_flat" in results:
        results["ips_full_flat"] = b / results["full_flat"] * 1e3
    print(json.dumps({k: round(v, 4) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    import sys
    main(only=tuple(sys.argv[1:]))
