"""Secondary benchmarks: BASELINE.json configs 2-5 (the driver's bench.py
covers config 1). Writes BENCH_EXTRA.json; not part of the driver loop.

  2. YOLO-Seg++ e2e inference (fused detector+decoder mask) @160, batch 64
  3. batched evaluate step (fused forward + NMS + binarize) @160, batch 16
  4. decoder train step (Dice loss, frozen encoder) @160, batch 128
  5. detector train step (on-device aug + v8 seg loss + TAL) @160, batch 32
"""

import json
import os
import time

import numpy as np


def slope(fn, args, sumfn, iters=8):
    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0
    run(1)
    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return (tn - t1) / iters


def main(only: str = ""):
    """only: ''=all, 'infer'=configs 2-4, 'train'=config 5 (split to keep
    each run under the sandbox command timeout; results merge into the json)."""
    import jax
    import jax.numpy as jnp

    from yolou_tpu.data.augment import AugHyp, augment_batch
    from yolou_tpu.losses.dice import soft_dice_loss
    from yolou_tpu.losses.v8 import v8_loss
    from yolou_tpu.models.segpp import YOLOSegPP
    from yolou_tpu.models.yolo import build_yolo, parse_model_spec
    from yolou_tpu.ops.nms import non_max_suppression

    rng = np.random.default_rng(0)
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = os.path.join(here, "BENCH_EXTRA.json")
    out = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            out = json.load(f)
    sum_leaves = jax.jit(
        lambda t: sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(t)))

    do_infer = only in ("", "infer")
    do_train = only in ("", "train")

    # ---- config 2/3: fused SegPP inference + eval step at 160
    if do_infer:
        spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
        # use_pallas: the fused attention kernels serve the e2e surface too
        # (round-3: previously this bench ran the staged XLA attention)
        segpp = YOLOSegPP(spec=spec, dtype=jnp.bfloat16, use_pallas=True)
        sv = jax.jit(lambda k, x: segpp.init(k, x, train=False))(
            jax.random.key(0), jnp.zeros((1, 160, 160, 4)))

        @jax.jit
        def e2e(v, x):
            mask_logits, outp = segpp.apply(v, x, train=False)
            dets = non_max_suppression(outp.preds.astype(jnp.float32), nc=1)
            return ((jax.nn.sigmoid(mask_logits) > 0.5).astype(jnp.float32),
                    dets.conf)

        for b, key in ((64, "segpp_e2e_ips_b64_160"),
                       (16, "eval_step_ips_b16_160")):
            x = jnp.asarray(rng.random((b, 160, 160, 4)), jnp.float32)
            t = slope(e2e, (sv, x), sum_leaves)
            out[key] = b / t

        # ---- config 4: decoder train step
        import optax
        tx = optax.adamw(1e-4)
        params = sv["params"]
        opt = tx.init(params)
        masks = jnp.asarray(rng.random((128, 160, 160, 1)) > 0.7, jnp.float32)
        oms = jnp.asarray(rng.random((128, 20, 20, 1)), jnp.float32)
        imgs = jnp.asarray(rng.random((128, 160, 160, 4)), jnp.float32)

        @jax.jit
        def dec_step(params, opt, img, mask, om):
            def loss_fn(p):
                (pred, _), upd = segpp.apply(
                    {"params": p, "batch_stats": sv["batch_stats"]}, img,
                    logits=om, train=True, mutable=["batch_stats"])
                return soft_dice_loss(pred, mask), upd
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        t = slope(lambda i, m, o: dec_step(params, opt, i, m, o)[2],
                  (imgs, masks, oms), lambda x: float(x))
        out["decoder_train_ips_b128_160"] = 128 / t

    if do_train:
        # ---- config 5: detector train step with on-device augmentation
        det = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                         dtype=jnp.bfloat16, use_pallas=True)
        dv = jax.jit(lambda k, x: det.init(k, x, train=False))(
            jax.random.key(0), jnp.zeros((1, 160, 160, 4)))
        b = 32
        img_u8 = jnp.asarray(rng.integers(0, 255, (b, 160, 160, 4)), jnp.uint8)
        idmap = jnp.zeros((b, 160, 160), jnp.int32).at[:, 40:100, 40:120].set(1)
        cls = jnp.zeros((b, 8), jnp.int32)
        valid = jnp.zeros((b, 8), bool).at[:, 0].set(True)

        @jax.jit
        def det_step(params, img_u8, idmap, cls, valid, key):
            batch = augment_batch(img_u8.astype(jnp.float32) / 255.0, idmap,
                                  cls, valid, key, AugHyp(), g_out=8)
            def loss_fn(p):
                o, upd = det.apply(
                    {"params": p, "batch_stats": dv["batch_stats"]},
                    batch["img"], train=True, mutable=["batch_stats"])
                lo = v8_loss(o.raw, o.mask_coefs, o.protos,
                             {"cls": batch["cls"], "bboxes": batch["bboxes"],
                              "valid": batch["valid"], "masks": batch["masks"]},
                             nc=1)
                return lo.total, upd
            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, sum(jnp.sum(jnp.abs(g)) for g in
                             jax.tree_util.tree_leaves(grads))

        t = slope(lambda *a: det_step(*a)[0],
                  (dv["params"], img_u8, idmap, cls, valid, jax.random.key(1)),
                  lambda x: float(x))
        out["detector_train_ips_b32_160"] = b / t

    with open(out_path, "w") as f:
        json.dump({k: round(v, 2) for k, v in out.items()}, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else "")
