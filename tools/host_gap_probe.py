"""Round-4 detector-trainer HOST-GAP bisect.

BENCH_EXTRA r4 first cut: real fused step 11.0 ms device, but the e2e
trainer loop ran at 181 ms/step — a 170 ms/step host gap. Tunnel transfer
is NOT it (measured 1.5 GB/s; the 4 MB batch uploads in 2.1 ms). Candidates,
each timed here against the REAL DetectorTrainer step on the bench synthetic
dataset:

  step_chained     N chained steps, one final scalar fetch (device+dispatch)
  fetch_pair       jax.device_get((loss, parts)) per step  [ScalarPipeline]
  fetch_loss       jax.device_get(loss) per step (1 leaf vs 5)
  split            jax.random.split dispatch per step
  collate_upload   collate_idmap_cached + jnp.asarray per step
  loop_asis        the actual train() inner-loop shape, 1 epoch

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/host_gap_probe.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from yolou_tpu.data.config import DataConfig
from yolou_tpu.data.yolo_dataset import YoloSegDataset, collate_idmap_cached
from yolou_tpu.engine.trainer_detector import (DetectorTrainConfig,
                                               DetectorTrainer)
from yolou_tpu.models.yolo import build_yolo

OUT = {}


def bench(name, fn, iters=16, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    ms = (time.perf_counter() - t0) / iters * 1e3
    OUT[name] = round(ms, 3)
    print(f"[host_gap] {name}: {ms:.2f} ms", flush=True)


def main():
    import bench_extra
    root = bench_extra.synth_root(160, 512)
    b = 32
    det = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                     dtype=jnp.bfloat16, use_pallas=True)
    dv = jax.jit(lambda k, x: det.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 160, 160, 4)))
    tcfg = DetectorTrainConfig(imgsz=160, batch_size=b, epochs=4,
                               max_instances=8, close_mosaic=0,
                               run_dir="/tmp/bench_runs_det")
    data_cfg = DataConfig(path=root, train="images/train", val="images/val",
                          channels=4)
    tr = DetectorTrainer(det, jax.device_get(dv), data_cfg, tcfg)
    tr.ensure_ready(steps_per_epoch=16)
    ds = YoloSegDataset(data_cfg.split_dir("train"), imgsz=160, channels=4,
                        cache_images=True)
    cb = collate_idmap_cached(ds, list(range(b)), 8)
    args = tuple(jnp.asarray(cb[k]) for k in ("img", "idmap", "cls", "valid"))
    key = jax.random.key(1)

    # warm-compile the step; keep (loss, parts) of the last call for fetches
    state = tr.state
    state, loss, parts = tr._step[True](state, args, key)
    jax.block_until_ready(loss)

    # 1. chained steps, single tail fetch — device + dispatch floor
    def chained():
        nonlocal state, loss, parts
        state, loss, parts = tr._step[True](state, args, key)
    t0 = time.perf_counter()
    for _ in range(16):
        chained()
    float(loss)
    OUT["step_chained"] = round((time.perf_counter() - t0) / 16 * 1e3, 3)
    print(f"[host_gap] step_chained: {OUT['step_chained']:.2f} ms", flush=True)

    # 2. scalar fetch variants on settled arrays
    jax.block_until_ready(loss)
    bench("fetch_pair", lambda: jax.device_get((loss, parts)))
    bench("fetch_loss", lambda: jax.device_get(loss))
    one = jax.device_put(jnp.zeros(())); jax.block_until_ready(one)
    bench("fetch_tiny_single", lambda: jax.device_get(one))

    # 3. per-step key split (key on the default device)
    k2 = jax.random.key(2)
    def split():
        nonlocal k2
        k2, _s = jax.random.split(k2)
    bench("split", split)
    bench("split_blocked", lambda: jax.block_until_ready(
        jax.random.split(jax.random.key(3))))

    # 4. collate + upload
    sel = list(range(b))
    collate_idmap_cached(ds, sel, 8)
    bench("collate", lambda: collate_idmap_cached(ds, sel, 8))
    def upload():
        cb2 = collate_idmap_cached(ds, sel, 8)
        a = tuple(jnp.asarray(cb2[k]) for k in ("img", "idmap", "cls", "valid"))
        jax.block_until_ready(a[0])
    bench("collate_upload", upload)

    # 5. the actual train() epoch (compile already paid above? train builds
    # its own ds but shares jit cache via identical _step fns)
    tr2 = DetectorTrainer(det, jax.device_get(dv), data_cfg, tcfg)
    h = tr2.train()
    OUT["train_epoch_s"] = [round(s, 3) for s in tr2.epoch_times]
    OUT["train_ms_per_step"] = round(min(tr2.epoch_times[1:]) / 16 * 1e3, 2)
    print(f"[host_gap] epochs: {OUT['train_epoch_s']}")

    with open("/root/repo/HOST_GAP.json", "w") as f:
        json.dump(OUT, f, indent=2)
    print(json.dumps(OUT))


if __name__ == "__main__":
    main()
