"""`yolou_tpu profile` — per-layer device-time profile of a model forward.

The reference world reaches for `torch.profiler` / ultralytics' built-in
speed reporting (e.g. the per-stage ms printed by ultralytics' `val`/
`predict`); neither exists on this stack, and `jax.profiler` device traces
hang through the axon tunnel (CLAUDE.md). This CLI exposes the framework's
own trustworthy equivalent — prefix-bisection slope timing
(yolou_tpu/tools/profile_layers.py) — as a first-class workflow command:

    python -m yolou_tpu profile --batch 128 --imgsz 640 --out PROFILE.json
    python -m yolou_tpu profile --attn            # attention variants only

Writes a per-layer table (stdout + JSON) with non-negative, isotonic-fitted
per-layer times.
"""

from ..tools.profile_layers import main as _main


def main(argv=None):
    return _main(argv)


if __name__ == "__main__":  # pragma: no cover
    import sys

    sys.exit(main(sys.argv[1:]) or 0)
