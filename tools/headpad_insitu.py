"""In-situ A/B of Segment.pad_p5 on the exact bench surface (b128/640 s2d
predict program, NMS included).

The isolated probe (HEAD_PAD.json) showed the 96-ch box+coef stack at 20²
on a degenerate tiling floor (0.639 -> 0.193 ms padded), but the first
bench rerun with the pad wired came out 0.83 ms SLOWER at b128 than the
pad-free run one hour earlier — which is also within the observed
cross-run spread (33.15 / 33.6 / 33.98 across sessions). This probe
decides it cleanly: both variants compiled in ONE session, slope-timed
interleaved A/B/A/B x3, so tunnel state cancels.

Writes HEADPAD_INSITU.json. Run serialized on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/headpad_insitu.py
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)


def build(device, pad, batch=128):
    import jax
    import jax.numpy as jnp

    import yolou_tpu.models.yolo as my

    orig = my.build_yolo

    def patched(*a, **k):
        k.setdefault("pad_head_p5", pad)
        return orig(*a, **k)

    my.build_yolo = patched
    try:
        # bench._build imports build_yolo inside the function body, so the
        # module attribute patch takes effect
        fn, v, imgs = bench._build(device, "bfloat16", batch)
    finally:
        my.build_yolo = orig
    return fn, v, imgs


def main():
    import jax
    accel = [d for d in jax.devices() if d.platform != "cpu"]
    dev = accel[0]
    out = {}
    surfaces = {}
    for name, pad in (("pad_off", False), ("pad_on", True)):
        surfaces[name] = build(dev, pad)
        # warm compile + one slope to prime
        bench._throughput(*surfaces[name], iters=4)
        print(f"{name} compiled", flush=True)
    for rep in range(3):
        for name in ("pad_off", "pad_on"):
            fn, v, imgs = surfaces[name]
            ips, per_call = bench._throughput(fn, v, imgs, iters=16, warmup=0)
            out.setdefault(f"{name}_ms_reps", []).append(per_call * 1e3)
            print(f"rep{rep} {name}: {per_call*1e3:.3f} ms ({ips:.1f} img/s)",
                  flush=True)
    for name in ("pad_off", "pad_on"):
        out[f"{name}_ms_median"] = float(np.median(out[f"{name}_ms_reps"]))
    out["delta_ms_on_minus_off"] = (out["pad_on_ms_median"]
                                    - out["pad_off_ms_median"])
    out["measured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "HEADPAD_INSITU.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
