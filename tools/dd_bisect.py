"""Bisect the detector-trainer device-data epoch scan (VERDICT r4 #1).

BENCH_EXTRA r4: standalone fused step 11.27 ms (2838.7 img/s b32/160) but the
e2e epoch loop ran at 41.4 ms/step (773.5 img/s) even though the device-data
path dispatches ONE lax.scan per epoch. The residual must be inside the scan
(gather cost, scan-body fusion/donation loss) or the standalone slope number
flatters the step. This tool times every layer between those two numbers on
the real chip and writes DD_BISECT.json:

  A step_standalone_ms   — tr._step[True] on a static uploaded batch
                           (bench_extra's exact surface; expect ~11.3)
  B ddstep_standalone_ms — jitted dd_step: HBM-dataset gather + step
  C scan_epoch_ms_per_step   — tr._epoch_dd[True], real epoch / spe
  C2 scan_epoch_nomosaic     — tr._epoch_dd[False] (mosaic gather ablated)
  D scan_static_ms_per_step  — same scan, gathers replaced by a static batch
  E scan_len64_ms_per_step   — 4x longer scan on the same data (dispatch
                               amortization check)
  F epoch_e2e_ms_per_step    — the real train() epoch wall (reproduces the
                               BENCH_EXTRA e2e number)

Run (serialize on the TPU!):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/dd_bisect.py > /tmp/dd_bisect.log 2>&1
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(label, fn, reps=5):
    """Median wall time of fn() (fn must block), after 2 warmups."""
    fn(); fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    med = sorted(ts)[len(ts) // 2]
    print(f"{label}: {med * 1e3:.2f} ms  (all: "
          + " ".join(f"{t * 1e3:.1f}" for t in ts) + ")", flush=True)
    return med


def main():
    import jax
    import jax.numpy as jnp

    from bench_extra import slope_stateful, synth_root
    from yolou_tpu.data.config import DataConfig
    from yolou_tpu.engine.trainer_detector import (DetectorTrainConfig,
                                                   DetectorTrainer,
                                                   epoch_index_batches)
    from yolou_tpu.data.yolo_dataset import (YoloSegDataset,
                                             collate_idmap_cached)
    from yolou_tpu.models.yolo import build_yolo

    rng = np.random.default_rng(0)
    b, spe = 32, 16
    root = synth_root(160, 512)
    det = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                     dtype=jnp.bfloat16, use_pallas=True)
    dv = jax.jit(lambda k, x: det.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 160, 160, 4)))
    tcfg = DetectorTrainConfig(imgsz=160, batch_size=b, epochs=4,
                               max_instances=8, close_mosaic=0,
                               run_dir="/tmp/dd_bisect_runs")
    data_cfg = DataConfig(path=root, train="images/train", val="images/val",
                          channels=4)
    tr = DetectorTrainer(det, jax.device_get(dv), data_cfg, tcfg)
    tr.ensure_ready(steps_per_epoch=spe)

    out = {}

    # --- device-resident dataset, exactly as train() builds it
    ds = YoloSegDataset(data_cfg.split_dir("train"), imgsz=160, channels=4,
                        cache_images=True)
    cb = collate_idmap_cached(ds, list(range(len(ds))), tcfg.max_instances)
    dset_dev = {k: jnp.asarray(v) for k, v in cb.items()}
    idx = np.random.default_rng(tcfg.seed).permutation(len(ds))
    perm = np.concatenate([np.asarray(sel, np.int32)
                           for sel in epoch_index_batches(idx, b)])
    perm_dev = jnp.asarray(perm)

    # --- A: bench_extra's standalone step surface (static uploaded batch)
    img_u8 = jnp.asarray(rng.integers(0, 255, (b, 160, 160, 4)), jnp.uint8)
    idmap = jnp.zeros((b, 160, 160), jnp.uint8).at[:, 40:100, 40:120].set(1)
    cls = jnp.zeros((b, 8), jnp.int32)
    valid = jnp.zeros((b, 8), bool).at[:, 0].set(True)
    t = slope_stateful(
        lambda s, *a: tr._step[True](s, a[:-1], a[-1])[:2],
        tr.state, (img_u8, idmap, cls, valid, jax.random.key(1)),
        lambda x: float(x))
    out["A_step_standalone_ms"] = t * 1e3
    print(f"A step_standalone: {t * 1e3:.2f} ms", flush=True)

    # rebuild a fresh trainer (A consumed the state buffers via donation)
    tr = DetectorTrainer(det, jax.device_get(dv), data_cfg, tcfg)
    tr.ensure_ready(steps_per_epoch=spe)

    # --- B: jitted dd_step standalone (gather + step), non-donated wrapper
    @jax.jit
    def ddstep(state, dset, perm, key):
        off = (state.step % spe) * b
        sel = jax.lax.dynamic_slice(perm, (off,), (b,))
        img = jnp.take(dset["img"], sel, axis=0)
        idm = jnp.take(dset["idmap"], sel, axis=0)
        c = jnp.take(dset["cls"], sel, axis=0)
        v = jnp.take(dset["valid"], sel, axis=0)
        return tr._step[True](state, (img, idm, c, v), key)

    t = slope_stateful(lambda s, d, p, k: ddstep(s, d, p, k)[:2],
                       tr.state, (dset_dev, perm_dev, jax.random.key(1)),
                       lambda x: float(x))
    out["B_ddstep_standalone_ms"] = t * 1e3
    print(f"B ddstep_standalone: {t * 1e3:.2f} ms", flush=True)

    tr = DetectorTrainer(det, jax.device_get(dv), data_cfg, tcfg)
    tr.ensure_ready(steps_per_epoch=spe)

    # --- C / C2: the real epoch scan (per-step = epoch wall / spe)
    def run_scan(mosaic):
        st, k2, acc = tr._epoch_dd[mosaic](tr.state, dset_dev, perm_dev,
                                           jax.random.key(2))
        tr.state = st
        jax.device_get(acc)

    out["C_scan_epoch_ms_per_step"] = timed(
        "C scan_epoch(mosaic)", lambda: run_scan(True)) / spe * 1e3
    out["C2_scan_epoch_nomosaic_ms_per_step"] = timed(
        "C2 scan_epoch(no mosaic)", lambda: run_scan(False)) / spe * 1e3

    # --- D: scan with the gathers replaced by a static batch (jit-of-jit on
    # the SAME traced step, so only the gather is ablated)
    @jax.jit
    def scan_static(state, img, idm, c, v, key):
        def body(carry, _):
            st, k, acc = carry
            k, sub = jax.random.split(k)
            st, loss, parts = tr._step[True](st, (img, idm, c, v), sub)
            return (st, k, acc + loss.astype(jnp.float32)), None
        (state, key, acc), _ = jax.lax.scan(
            body, (state, key, jnp.zeros((), jnp.float32)), None, length=spe)
        return state, acc

    def run_static():
        st, acc = scan_static(tr.state, img_u8, idmap, cls, valid,
                              jax.random.key(2))
        tr.state = st
        jax.device_get(acc)

    out["D_scan_static_ms_per_step"] = timed(
        "D scan_static", run_static) / spe * 1e3

    # --- E: 4x longer scan over the same data (dispatch amortization)
    spe4 = spe * 4
    perm4 = jnp.asarray(np.concatenate([perm] * 4))

    @jax.jit
    def scan_len4(state, dset, perm, key):
        def body(carry, _):
            st, k, acc = carry
            k, sub = jax.random.split(k)
            off = (st.step % spe4) * b
            sel = jax.lax.dynamic_slice(perm, (off,), (b,))
            st, loss, parts = tr._step[True](
                st, (jnp.take(dset["img"], sel, axis=0),
                     jnp.take(dset["idmap"], sel, axis=0),
                     jnp.take(dset["cls"], sel, axis=0),
                     jnp.take(dset["valid"], sel, axis=0)), sub)
            return (st, k, acc + loss.astype(jnp.float32)), None
        (state, key, acc), _ = jax.lax.scan(
            body, (state, key, jnp.zeros((), jnp.float32)), None, length=spe4)
        return state, acc

    def run_len4():
        st, acc = scan_len4(tr.state, dset_dev, perm_dev, jax.random.key(2))
        tr.state = st
        jax.device_get(acc)

    out["E_scan_len64_ms_per_step"] = timed(
        "E scan_len64", run_len4, reps=3) / spe4 * 1e3

    # --- F: the real train() epoch loop (reproduces BENCH_EXTRA e2e)
    tr2 = DetectorTrainer(det, jax.device_get(dv), data_cfg, tcfg)
    tr2.train()
    e2e_s = min(tr2.epoch_times[1:])
    out["F_epoch_e2e_ms_per_step"] = e2e_s / spe * 1e3
    out["F_e2e_ips"] = 512 / e2e_s
    print(f"F epoch_e2e: {e2e_s / spe * 1e3:.2f} ms/step "
          f"({512 / e2e_s:.1f} img/s)", flush=True)

    out["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "DD_BISECT.json"), "w") as f:
        json.dump({k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in out.items()}, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
