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


def slope_stateful(step, state, args, sumfn, iters=8):
    """Slope protocol for donated-state train steps: the state buffer is
    consumed each call, so it must thread through (state, out = step(state,
    *args)); timing semantics match `slope`."""
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


def synth_root(size: int = 160, n_train: int = 512) -> str:
    """Synthetic on-disk dataset for the e2e trainer surfaces (persisted in
    /tmp so repeat bench runs skip the generation)."""
    root = f"/tmp/bench_synth_{size}_{n_train}"
    marker = os.path.join(root, ".done")
    if not os.path.exists(marker):
        from yolou_tpu.data.synthetic import generate, write_objectmaps
        generate(root, {"train": n_train, "val": 32}, size=size, seed=0)
        rng = np.random.default_rng(1)
        for split in ("train", "val"):
            img_dir = os.path.join(root, "images", split)
            names = [os.path.splitext(n)[0] for n in os.listdir(img_dir)]
            write_objectmaps(
                root, {n: rng.normal(-4, 2, (20, 20)) for n in names}, split)
        with open(marker, "w") as f:
            f.write("ok")
    return root


def main(only: str = ""):
    """only: ''=all, 'infer'=configs 2-4, 'train'=config 5 (split to keep
    each run under the sandbox command timeout; results merge into the json)."""
    import jax
    import jax.numpy as jnp

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

        # ---- config 4: decoder train step — the REAL DecoderTrainer fused
        # step (frozen-encoder masked AdamW, donated state, uint8 inputs),
        # plus the e2e trainer loop (host decode-cache + collate + transfer
        # included) for the host/device reconciliation (VERDICT r3 #3)
        from yolou_tpu.engine.trainer_decoder import (DecoderTrainConfig,
                                                      DecoderTrainer)
        root = synth_root(160, 512)
        dcfg = DecoderTrainConfig(image_size=160, batch_size=128, epochs=3,
                                  val_hd95=False, early_stopping=False,
                                  run_dir="/tmp/bench_runs_dec")
        # host-copy the variables: the donated _train_step below deletes the
        # state's param buffers, and dtr.state aliases whatever device arrays
        # it was constructed from — passing `sv` directly would delete the
        # e2e surface's params (and dtr2's) out from under them
        sv_host = jax.device_get(sv)
        dtr = DecoderTrainer(segpp, sv_host, root, dcfg)
        dtr.ensure_ready(steps_per_epoch=4)
        imgs_u8 = jnp.asarray(rng.integers(0, 255, (128, 160, 160, 4)),
                              jnp.uint8)
        masks_u8 = jnp.asarray(
            (rng.random((128, 160, 160, 1)) > 0.7) * 255, jnp.uint8)
        oms = jnp.asarray(rng.random((128, 20, 20, 1)), jnp.float32)
        t = slope_stateful(
            lambda s, i, m, o: dtr._train_step(s, i, m, o)[:2],
            dtr.state, (imgs_u8, masks_u8, oms), lambda x: float(x))
        out["decoder_train_ips_b128_160"] = 128 / t
        out["decoder_train_step_ms"] = t * 1e3

        dtr2 = DecoderTrainer(segpp, sv_host, root, dcfg)
        dtr2.train()
        e2e_s = min(dtr2.epoch_times[1:])    # epoch 0 pays compile + decode
        n_imgs = 512
        out["decoder_train_e2e_ips_b128_160"] = n_imgs / e2e_s
        steps = -(-n_imgs // 128)
        out["decoder_train_host_gap_ms"] = (e2e_s / steps - t) * 1e3

    if do_train:
        # ---- config 5: detector train step — the REAL DetectorTrainer fused
        # step (on-device aug -> v8 seg loss/TAL -> flat-vector SGD+EMA,
        # donated state), plus the e2e trainer loop over a synthetic on-disk
        # dataset for the host/device reconciliation (VERDICT r3 #2)
        from yolou_tpu.data.config import DataConfig
        from yolou_tpu.engine.trainer_detector import (DetectorTrainConfig,
                                                       DetectorTrainer)
        det = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                         dtype=jnp.bfloat16, use_pallas=True)
        dv = jax.jit(lambda k, x: det.init(k, x, train=False))(
            jax.random.key(0), jnp.zeros((1, 160, 160, 4)))
        b = 32
        root = synth_root(160, 512)
        # close_mosaic=0: mosaic every epoch -> ONE jit specialization, so
        # epochs 1..3 are steady-state samples for the e2e number
        tcfg = DetectorTrainConfig(imgsz=160, batch_size=b, epochs=4,
                                   max_instances=8, close_mosaic=0,
                                   run_dir="/tmp/bench_runs_det")
        data_cfg = DataConfig(path=root, train="images/train",
                              val="images/val", channels=4)
        tr = DetectorTrainer(det, jax.device_get(dv), data_cfg, tcfg)
        tr.ensure_ready(steps_per_epoch=16)
        img_u8 = jnp.asarray(rng.integers(0, 255, (b, 160, 160, 4)), jnp.uint8)
        idmap = jnp.zeros((b, 160, 160), jnp.uint8).at[:, 40:100, 40:120].set(1)
        cls = jnp.zeros((b, 8), jnp.int32)
        valid = jnp.zeros((b, 8), bool).at[:, 0].set(True)
        t = slope_stateful(
            lambda s, *a: tr._step[True](s, a[:-1], a[-1])[:2],
            tr.state, (img_u8, idmap, cls, valid, jax.random.key(1)),
            lambda x: float(x))
        out["detector_train_ips_b32_160"] = b / t
        out["detector_train_step_ms"] = t * 1e3

        tr2 = DetectorTrainer(det, jax.device_get(dv), data_cfg, tcfg)
        tr2.train()
        e2e_s = min(tr2.epoch_times[1:])     # epoch 0 pays compile + decode
        n_imgs = 512
        out["detector_train_e2e_ips_b32_160"] = n_imgs / e2e_s
        steps = -(-n_imgs // b)
        out["detector_train_host_gap_ms"] = (e2e_s / steps - t) * 1e3

    # provenance: which commit/when produced the keys this run REFRESHED
    # (merged stale keys keep their old stamp under provenance[<branch>])
    import subprocess
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True,
                                cwd=here).stdout.strip()
    except Exception:
        commit = "unknown"
    prov = out.get("provenance", {})
    stamp = {"measured_at": time.strftime("%Y-%m-%d %H:%M:%S"),
             "commit": commit}
    for branch, on in (("infer", do_infer), ("train", do_train)):
        if on:
            prov[branch] = stamp
    out["provenance"] = prov
    with open(out_path, "w") as f:
        json.dump({k: (round(v, 2) if isinstance(v, float) else v)
                   for k, v in out.items()}, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else "")
