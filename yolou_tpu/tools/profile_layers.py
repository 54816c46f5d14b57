"""Per-layer device-time profiler (prefix bisection with slope timing).

`jax.profiler.start_trace` hangs through the axon tunnel (CLAUDE.md), and
sub-ms single-call timing through the tunnel is queue-jitter noise — so this
measures per-layer times the only way that is trustworthy here: jit every
*prefix* of the model graph (the executor's `stop_at` + `taps`), slope-time
each prefix over enough chained dispatches to aggregate >5 ms of device work,
and difference consecutive prefixes. Output: a per-layer table (stdout +
PROFILE.md + JSON).

Usage:
    python -m yolou_tpu.tools.profile_layers --batch 128 --imgsz 640
    python -m yolou_tpu.tools.profile_layers --attn   # attention variants
"""

from __future__ import annotations

import argparse
import json
import time
from typing import Callable, Optional

import numpy as np


def make_runner(fn: Callable, args, *, min_work_ms: float = 20.0):
    """Compile + calibrate a slope-timing runner for `fn`.

    Returns (sample, n): `sample()` takes ONE slope measurement
    (t(1+n) - t(1)) / n over chained dispatches, each run ending in a scalar
    host transfer (cannot complete early through the tunnel); n is fixed at
    calibration so the aggregate exceeds min_work_ms and repeated samples are
    comparable."""
    import jax
    import jax.numpy as jnp

    first = lambda o: jax.tree_util.tree_leaves(o)[0]
    sumfn = jax.jit(lambda o: jnp.sum(first(o).astype(jnp.float32)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0

    run(1)  # compile + warm
    t1 = min(run(1) for _ in range(3))
    probe = max(run(4) - t1, 1e-5) / 3
    n = max(4, int(min_work_ms / 1e3 / probe) + 1)
    n = min(n, 200)

    def sample():
        base = min(run(1) for _ in range(2))
        return (run(1 + n) - base) / n

    return sample, n


def slope_time(fn: Callable, args, *, min_work_ms: float = 20.0,
               probes: int = 3) -> float:
    """Median of `probes` slope samples (see make_runner)."""
    sample, _ = make_runner(fn, args, min_work_ms=min_work_ms)
    return float(np.median([sample() for _ in range(probes)]))


def pava_nondecreasing(y):
    """L2 isotonic regression (pool adjacent violators): smallest change to
    `y` making it non-decreasing. Cumulative prefix times are physically
    non-decreasing in layer count, so fitting them isotonically removes the
    differencing noise that produced negative per-layer entries."""
    blocks = [[v, 1.0] for v in y]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) > 1 and out[-2][0] > out[-1][0]:
            v2, w2 = out.pop()
            v1, w1 = out.pop()
            out.append([(v1 * w1 + v2 * w2) / (w1 + w2), w1 + w2])
    fit = []
    for v, w in out:
        fit.extend([v] * int(round(w)))
    return fit


def profile_prefixes(batch: int = 128, imgsz: int = 640, use_pallas: bool = True,
                     dtype_name: str = "bfloat16",
                     layers: Optional[list] = None, rounds: int = 6) -> dict:
    """Per-layer times from prefix differencing, noise-hardened (VERDICT r2
    weak #4 — 7/22 entries came out negative under one-shot consecutive
    differencing):

      * every prefix is compiled+calibrated FIRST, then sampled in `rounds`
        interleaved sweeps (prefix 1..N per round) so slow drift — tunnel
        load, thermal — hits neighboring prefixes equally rather than
        accumulating between their measurements;
      * the per-prefix median over rounds is fit with isotonic regression
        (cumulative device time cannot decrease with more layers), which is
        exactly the minimal correction that removes negative entries;
      * run-to-run spread is reported from odd/even-round half-tables.
    """
    import jax
    import jax.numpy as jnp

    from ..models.yolo import build_yolo

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                       dtype=dtype, use_pallas=use_pallas)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, imgsz, imgsz, 4)))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, imgsz, imgsz, 4)).astype(np.float32))

    n_layers = len(model.spec.layers)
    sel = layers if layers else list(range(1, n_layers + 1))
    # prefix 0 is the empty program — its time is identically 0, not a runner
    sel = sorted(set(sel) - {0})

    runners = {}
    for i in sel:
        def prefix(v, x, i=i):
            return model.apply(v, x, train=False, stop_at=i,
                               taps=(i - 1,)) if i < n_layers else \
                   model.apply(v, x, train=False)

        runners[i] = make_runner(jax.jit(prefix), (variables, x))[0]
        print(f"compiled+calibrated prefix[:{i}]", flush=True)

    samples = {i: [] for i in sel}
    for r in range(rounds):
        for i in sel:
            samples[i].append(runners[i]())
        print(f"round {r + 1}/{rounds} done", flush=True)

    def table(rsel):
        t = {0: 0.0}
        for i in sel:
            t[i] = float(np.median([samples[i][r] for r in rsel])) * 1e3
        keys = sorted(t)
        fit = pava_nondecreasing([t[k] for k in keys])
        return dict(zip(keys, fit))

    times = table(range(rounds))
    half_a = table(range(0, rounds, 2))
    half_b = table(range(1, rounds, 2))

    rows = []
    keys = sorted(times)
    for a, b in zip(keys[:-1], keys[1:]):
        name = "+".join(model.spec.layers[j].block for j in range(a, b))
        d = times[b] - times[a]
        spread = abs((half_a[b] - half_a[a]) - (half_b[b] - half_b[a]))
        rows.append({"layers": f"{a}..{b-1}", "block": name,
                     "ms": round(d, 3), "half_spread_ms": round(spread, 3)})
        print(f"layers {a:2d}..{b-1:2d} {name:<12} {d:8.3f} ms "
              f"(±{spread:.3f})", flush=True)
    total = times[keys[-1]]
    spread_total = abs(half_a[keys[-1]] - half_b[keys[-1]])
    out = {"batch": batch, "imgsz": imgsz, "dtype": dtype_name,
           "use_pallas": use_pallas, "rounds": rounds,
           "total_ms": round(total, 3),
           "total_half_spread_ms": round(spread_total, 3),
           "per_layer": rows}
    return out


def profile_attention_variants(batch: int = 128) -> dict:
    """Layer-6 attention shapes (B=128, area=4, N=400, heads=4, hd=32):
    time competing implementations of the banded softmax attention."""
    import jax
    import jax.numpy as jnp

    from ..ops import pallas_attn

    heads, n, hd = 4, 400, 32
    bands = batch * 4            # B * area
    g = bands * heads
    rng = np.random.default_rng(0)
    mk = lambda shape: jnp.asarray(
        rng.normal(0, 1, shape).astype(np.float32)).astype(jnp.bfloat16)
    q, k, v = (mk((g, n, hd)) for _ in range(3))
    qf, kf, vf = (mk((bands, n, heads * hd)) for _ in range(3))
    flops = 2 * 2 * g * n * n * hd   # exact math FLOPs (fused does 4x on MXU)

    results = {}
    impls = {
        "pallas_banded": (jax.jit(
            lambda q, k, v: pallas_attn.area_attention(q, k, v)), (q, k, v)),
        "pallas_fused": (jax.jit(
            lambda q, k, v: pallas_attn.area_attention_fused(q, k, v, heads)),
            (qf, kf, vf)),
        "xla_einsum": (jax.jit(pallas_attn.area_attention_reference), (q, k, v)),
        "xla_fused_ref": (jax.jit(
            lambda q, k, v: pallas_attn.area_attention_fused_reference(
                q, k, v, heads)), (qf, kf, vf)),
    }
    for name, (f, args) in impls.items():
        try:
            t = slope_time(f, args)
            results[name] = {"ms": round(t * 1e3, 3),
                             "tflops_effective": round(flops / t / 1e12, 1)}
            print(f"{name:<16} {t*1e3:8.3f} ms  {flops/t/1e12:6.1f} TFLOP/s eff",
                  flush=True)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
            print(f"{name:<16} ERROR {str(e)[:120]}", flush=True)
    return results


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--imgsz", type=int, default=640)
    ap.add_argument("--no-pallas", action="store_true")
    ap.add_argument("--attn", action="store_true",
                    help="profile attention implementation variants only")
    ap.add_argument("--layers", type=str, default="",
                    help="comma-separated prefix indices (default: all)")
    ap.add_argument("--out", type=str, default="PROFILE.json")
    args = ap.parse_args(argv)

    if args.attn:
        out = profile_attention_variants(args.batch)
    else:
        layers = [int(s) for s in args.layers.split(",") if s] or None
        out = profile_prefixes(args.batch, args.imgsz,
                               use_pallas=not args.no_pallas, layers=layers)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
