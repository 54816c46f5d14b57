"""In-situ A/B of the whole-A2C2f mega-kernel routing (nn/attention.py):
full-model eval forward at b128/640, mega at {off, L6 only, L6+L8}.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/mega_probe.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.ops import pallas_a2c2f
from yolou_tpu.models.yolo import build_yolo

_real_gate = pallas_a2c2f.a2c2f_mega_eligible
_MEGA = False


def slope(fn, args, iters=16):
    sumfn = jax.jit(lambda o: jnp.sum(o[0].astype(jnp.float32)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return max((tn - t1) / iters, 1e-9)


def build(batch=128, imgsz=640):
    model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                       dtype=jnp.bfloat16, use_pallas=True, stem_s2d=True,
                       mega_kernel=_MEGA)
    init_model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                            dtype=jnp.bfloat16, use_pallas=True)
    variables = jax.jit(lambda k, x: init_model.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, imgsz, imgsz, 4)))
    rng = np.random.default_rng(0)
    b4 = imgsz // 4
    imgs = rng.integers(0, 255, (batch, imgsz, imgsz, 4), dtype=np.uint8)
    imgs = imgs.reshape(batch, b4, 4, b4, 4, 4).transpose(
        0, 1, 3, 2, 4, 5).reshape(batch, b4, b4, 64)
    x = (jnp.asarray(imgs).astype(jnp.float32) / 255.0).astype(jnp.bfloat16)

    def fwd(variables, x):
        out = model.apply(variables, x, train=False)
        return out.preds, out.protos

    return fwd, variables, x


def main():
    global _MEGA
    for label, mega, gate in (
            ("mega off", False, _real_gate),
            ("mega L6 only", True, lambda H, W, cin, c_, area, heads:
                _real_gate(H, W, cin, c_, area, heads) and area > 1),
            ("mega L6+L8", True, _real_gate)):
        _MEGA = mega
        pallas_a2c2f.a2c2f_mega_eligible = gate
        fwd, v, x = build()
        ms = slope(jax.jit(fwd), (v, x)) * 1e3
        print(f"forward b128/640 [{label}]: {ms:.3f} ms", flush=True)
    pallas_a2c2f.a2c2f_mega_eligible = _real_gate


if __name__ == "__main__":
    main()
