"""Decoder train-step bisection: /255 cast / forward / backward / optimizer.

BENCH_EXTRA's decoder_train_step_ms (18.8 ms b128/160, r5) was never floor-
attributed (VERDICT r4 Missing #3 asked for "device-bound proof"). This jits
each nested sub-program of DecoderTrainer._build_steps.train_step on
identical data and slope-times them:

    cast      u8 -> f32/255 on img+mask alone
    fwd       model.apply(train=True) + soft-dice loss value (no grad)
    grad      value_and_grad of the same loss     (adds the backward pass;
              encoder backward is structurally absent — stop_gradient taps)
    full      the real donated train step         (adds masked AdamW + metric)

and reports the differences. Reference point: the decoder stage this step
replaces re-ships every batch through a DataLoader per step
(/root/reference/train.py:228-236).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/dectrain_bisect.py \
      [--batch 128] [--imgsz 160] [--out DECTRAIN_BISECT.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def slope(fn, args, sumfn, iters=16):
    import jax
    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0
    run(1)
    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return (tn - t1) / iters


def slope_stateful(step, state, args, sumfn, iters=16):
    def run(n):
        nonlocal state
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            state, out = step(state, *args)
        float(sumfn(out))
        return time.perf_counter() - t0
    run(1)
    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return (tn - t1) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=160)
    ap.add_argument("--out", default="DECTRAIN_BISECT.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from yolou_tpu.engine.trainer_decoder import (DecoderTrainConfig,
                                                  DecoderTrainer)
    from yolou_tpu.losses.dice import soft_dice_loss
    from yolou_tpu.models.segpp import YOLOSegPP
    from yolou_tpu.models.yolo import parse_model_spec

    b, s = args.batch, args.imgsz
    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
    model = YOLOSegPP(spec=spec, dtype=jnp.bfloat16, use_pallas=True)
    v = jax.device_get(jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, s, s, 4))))

    rng = np.random.default_rng(0)
    img_u8 = jnp.asarray(rng.integers(0, 255, (b, s, s, 4)), jnp.uint8)
    mask_u8 = jnp.asarray((rng.random((b, s, s, 1)) > 0.7) * 255, jnp.uint8)
    om = jnp.asarray(rng.random((b, s // 8, s // 8, 1)), jnp.float32)

    tr = DecoderTrainer(model, v, "/tmp",
                        DecoderTrainConfig(image_size=s, batch_size=b,
                                           val_hd95=False,
                                           run_dir="/tmp/dectrain_bisect"))
    tr.ensure_ready(steps_per_epoch=4)
    # device_put once: tr.state leaves are host numpy (v was device_get), and
    # numpy args re-upload per call — that would put the whole param tree's
    # H2D into the fwd/grad slopes. The donated full step threads its own
    # uploaded copy via slope_stateful, so no aliasing with these buffers.
    params = jax.device_put(tr.state.params)
    batch_stats = jax.device_put(tr.state.batch_stats)

    def to_unit(x):
        return x.astype(jnp.float32) / 255.0 if x.dtype == jnp.uint8 else x

    @jax.jit
    def cast_only(i, m):
        return to_unit(i).sum() + to_unit(m).sum()

    def loss_val(params, i, m, o):
        i, m = to_unit(i), to_unit(m)
        (pred, _), _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            i, logits=o, train=True, mutable=["batch_stats"])
        return soft_dice_loss(pred, m)

    fwd = jax.jit(loss_val)
    grad = jax.jit(jax.value_and_grad(loss_val))

    out = {"batch": b, "imgsz": s}
    out["cast_ms"] = slope(cast_only, (img_u8, mask_u8),
                           lambda x: float(x)) * 1e3
    out["fwd_loss_ms"] = slope(fwd, (params, img_u8, mask_u8, om),
                               lambda x: float(x)) * 1e3
    out["grad_ms"] = slope(grad, (params, img_u8, mask_u8, om),
                           lambda x: float(x[0])) * 1e3
    out["full_step_ms"] = slope_stateful(
        lambda st, *a: tr._train_step(st, *a)[:2],
        tr.state, (img_u8, mask_u8, om), lambda x: float(x)) * 1e3
    out["backward_ms"] = out["grad_ms"] - out["fwd_loss_ms"]
    out["opt_metric_ms"] = out["full_step_ms"] - out["grad_ms"]
    out["ips_full"] = b / (out["full_step_ms"] / 1e3)

    import subprocess
    try:
        out["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))).stdout.strip()
    except Exception:
        pass
    out["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), args.out)
    with open(path, "w") as f:
        json.dump({k: (round(x, 3) if isinstance(x, float) else x)
                   for k, x in out.items()}, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
