"""Detector train-step bisection: aug / forward / loss / backward / optimizer.

The detector train step (BENCH_EXTRA detector_train_ips_b32_160: 567 img/s,
~56 ms/step) is the slowest product surface and had no floor analysis
(VERDICT r2 weak #5). This harness jits each nested sub-program of
DetectorTrainer._build_step on identical data and slope-times them:

    aug        augment_batch alone (mosaic on and off)
    fwd        model.apply(train=True) on the augmented batch
    fwd_loss   + v8_loss (TAL assignment, CIoU/DFL/BCE, proto-mask term)
    grad       value_and_grad of fwd_loss       (adds the backward pass)
    full       the real train step              (adds optimizer + EMA)

and reports the differences (loss = fwd_loss - fwd, backward = grad -
fwd_loss, opt+ema = full - grad). Also audits pipeline dtypes.

Usage:
  PYTHONPATH=/root/repo python tools/train_bisect.py --batch 32 --imgsz 160 \
      [--dtype bfloat16] [--out TRAIN_BISECT.json]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--imgsz", type=int, default=160)
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--max-instances", type=int, default=8)
    ap.add_argument("--out", default="TRAIN_BISECT.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from yolou_tpu.data.augment import AugHyp, augment_batch
    from yolou_tpu.engine.trainer_detector import (DetectorTrainConfig,
                                                   make_detector_tx)
    from yolou_tpu.losses.v8 import LossHyp, v8_loss
    from yolou_tpu.models.yolo import build_yolo
    from yolou_tpu.tools.profile_layers import make_runner

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment", dtype=dtype)
    spec = model.spec
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.key(0), jnp.zeros((1, args.imgsz, args.imgsz, 4)))

    # synthetic collated batch (same layout as collate_idmap)
    rng = np.random.default_rng(0)
    b, s, g = args.batch, args.imgsz, args.max_instances
    img_u8 = jnp.asarray(rng.integers(0, 255, (b, s, s, 4), np.uint8))
    idmap = jnp.asarray(
        rng.integers(0, g + 1, (b, s, s), np.int32).astype(np.int32))
    cls = jnp.zeros((b, g), jnp.int32)
    valid = jnp.asarray(rng.random((b, g)) < 0.5)
    key = jax.random.key(1)
    aug = AugHyp()
    hyp = LossHyp()
    cfg = DetectorTrainConfig(imgsz=s, batch_size=b,
                              max_instances=g)
    tx, _, _, _ = make_detector_tx(cfg, steps_per_epoch=100)
    params = variables["params"]
    bs0 = variables["batch_stats"]
    opt_state = tx.init(params)

    def aug_fn(img_u8, key, use_mosaic):
        img = img_u8.astype(jnp.float32) / 255.0
        return augment_batch(img, idmap, cls, valid, key, aug, g_out=g,
                             mask_ratio=cfg.mask_ratio, use_mosaic=use_mosaic)

    batch = jax.jit(lambda i, k: aug_fn(i, k, True))(img_u8, key)
    batch = jax.device_get(batch)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    dtypes = {k: str(v.dtype) for k, v in batch.items()}

    def fwd(params, img):
        out, _ = model.apply({"params": params, "batch_stats": bs0},
                             img, train=True, mutable=["batch_stats"])
        return out.raw, out.mask_coefs, out.protos

    def fwd_loss(params, batch):
        out, updates = model.apply({"params": params, "batch_stats": bs0},
                                   batch["img"], train=True,
                                   mutable=["batch_stats"])
        targets = {"cls": batch["cls"], "bboxes": batch["bboxes"],
                   "valid": batch["valid"], "masks": batch["masks"]}
        lo = v8_loss(out.raw, out.mask_coefs, out.protos, targets,
                     nc=spec.nc, strides=spec.strides, reg_max=spec.reg_max,
                     hyp=hyp, with_masks=True)
        return lo.total, updates["batch_stats"]

    def grad_fn(params, batch):
        (loss, new_bs), grads = jax.value_and_grad(
            lambda p: fwd_loss(p, batch), has_aux=True)(params)
        return loss, grads

    def full_step(params, opt_state, batch):
        (loss, new_bs), grads = jax.value_and_grad(
            lambda p: fwd_loss(p, batch), has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        ema = jax.tree_util.tree_map(
            lambda e, p: e * 0.999 + p.astype(e.dtype) * 0.001,
            params, new_params)
        return loss, new_params, new_opt, ema

    progs = {
        "aug_mosaic": (jax.jit(lambda i, k: aug_fn(i, k, True)), (img_u8, key)),
        "aug_nomosaic": (jax.jit(lambda i, k: aug_fn(i, k, False)),
                         (img_u8, key)),
        "fwd": (jax.jit(fwd), (params, batch["img"])),
        "fwd_loss": (jax.jit(fwd_loss), (params, batch)),
        "grad": (jax.jit(grad_fn), (params, batch)),
        "full": (jax.jit(full_step), (params, opt_state, batch)),
    }

    times = {}
    for name, (f, a) in progs.items():
        sample, n = make_runner(f, a)
        times[name] = float(np.median([sample() for _ in range(5)])) * 1e3
        print(f"{name:<12} {times[name]:8.2f} ms  (chain n={n})", flush=True)

    derived = {
        "loss_only": times["fwd_loss"] - times["fwd"],
        "backward_only": times["grad"] - times["fwd_loss"],
        "opt_ema_only": times["full"] - times["grad"],
    }
    out = {"batch": b, "imgsz": s, "dtype": args.dtype,
           "max_instances": g, "times_ms": {k: round(v, 2)
                                            for k, v in times.items()},
           "derived_ms": {k: round(v, 2) for k, v in derived.items()},
           "step_ips": round(b / (times["full"] + times["aug_mosaic"]) * 1e3,
                             1),
           "aug_output_dtypes": dtypes}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
