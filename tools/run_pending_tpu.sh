#!/bin/bash
# One-command run of every measurement waiting on the TPU tunnel
# (CLAUDE.md "Pending TPU measurements"). Artifacts land in the repo root.
# Usage: bash tools/run_pending_tpu.sh   (PYTHONPATH is set below)
set -x
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8083' || {
  echo "tunnel down; aborting"; exit 1; }

# 1. headline bench (also refreshes BENCH_DETAILS.json last_good)
timeout 3600 python bench.py | tee /tmp/bench_line.json

# 2. other BASELINE configs (decoder/detector train, eval, segpp e2e)
timeout 3600 python bench_extra.py > /tmp/bench_extra.log 2>&1

# 3. head fusion on/off (now measures the full 3-stage block-diag fusion)
timeout 1800 python tools/headfuse_probe.py > /tmp/headfuse.log 2>&1

# 4. A2C2f pe-early scheduling ablation
timeout 1800 python tools/a2c2f_probe.py --ablate=early > /tmp/a2c2f_early.log 2>&1

# 5. per-layer profile, noise-hardened (expect NO negative entries)
timeout 3600 python -m yolou_tpu.tools.profile_layers --batch 128 --imgsz 640 \
    --out PROFILE.json > /tmp/profile.log 2>&1

# 6. detector train-step bisection (bf16, bench shape)
timeout 3600 python tools/train_bisect.py --batch 32 --imgsz 160 \
    --dtype bfloat16 --out TRAIN_BISECT.json > /tmp/train_bisect.log 2>&1

# 7. decoder train-step bisection (r5: cast/fwd/bwd/opt attribution)
timeout 3600 python tools/dectrain_bisect.py > /tmp/dectrain_bisect.log 2>&1

tail -5 /tmp/bench_extra.log /tmp/headfuse.log /tmp/a2c2f_early.log \
    /tmp/profile.log /tmp/train_bisect.log
echo DONE
