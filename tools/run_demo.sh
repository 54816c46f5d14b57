#!/bin/bash
# End-to-end training demo (TRAINING_DEMO.md): the full reference workflow
# (SURVEY.md §3) on a synthetic BraTS-like set, on the real chip. Re-run each
# time training semantics change (r5: post-TAL-fix + new mAP matcher + the
# device-resident epoch scan both trainers now default to).
#
#   PYTHONPATH=/root/repo:/root/.axon_site bash tools/run_demo.sh /tmp/demo_r5
#
# Stage timings on one v5e chip: ~4 min total after compiles.
set -e
D=${1:-/tmp/demo_r5}
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}
cd "$(dirname "$0")/.."

python - "$D" <<'EOF'
import sys
from yolou_tpu.data.synthetic import generate
generate(sys.argv[1], {"train": 64, "val": 16, "test": 16}, size=160, seed=7)
print("dataset ready")
EOF

echo "=== stage 1: detector fine-tune (120 epochs, b16, mosaic, EMA) ==="
python -m yolou_tpu.cli.train_detector \
  --data "$D/data.yaml" --imgsz 160 --batch 16 --epochs 120 \
  --close-mosaic 30 --val-every 40 --run-dir "$D/runs_det" \
  --out "$D/yolo_best.ckpt"

echo "=== stage 2: objectmap generation (batched fused forward) ==="
python -m yolou_tpu.cli.generate_objectmaps \
  --data_dir "$D" --yolo_dir "$D/yolo_best.ckpt" --image_size 160 \
  --batch_size 96

python - "$D" <<'EOF'
# objectmap quality: mean foreground/background AUC vs downsampled GT masks
import os, sys
import numpy as np
import cv2
D = sys.argv[1]
aucs, fg_means, bg_means = [], [], []
for split in ("train", "val", "test"):
    om_dir = os.path.join(D, "objectmap", split)
    if not os.path.isdir(om_dir):
        continue
    for f in sorted(os.listdir(om_dir)):
        if not f.endswith("_20.npy"):
            continue
        om = np.load(os.path.join(om_dir, f))
        m = cv2.imread(os.path.join(D, "masks", split,
                                    f.replace("_20.npy", ".png")), 0)
        if m is None:
            continue
        gt = cv2.resize(m, om.shape[:2][::-1],
                        interpolation=cv2.INTER_AREA).ravel() > 127
        s = om.ravel()
        if gt.any() and (~gt).any():
            order = np.argsort(s)
            ranks = np.empty(len(s)); ranks[order] = np.arange(len(s))
            aucs.append((ranks[gt].mean() - (gt.sum() - 1) / 2)
                        / (~gt).sum())
            fg_means.append(s[gt].mean()); bg_means.append(s[~gt].mean())
if aucs:
    print(f"objectmap AUC mean={np.mean(aucs):.3f} "
          f"fg_logit={np.mean(fg_means):.2f} bg_logit={np.mean(bg_means):.2f}")
EOF

echo "=== stage 3: decoder training (120 epochs, Dice, frozen encoder) ==="
python -m yolou_tpu.cli.train_decoder \
  --model "$D/yolo_best.ckpt" --data "$D" --imgsz 160 --batch 16 \
  --lr 3e-4 --epochs 120 --early-stopping-start 100 --run-dir "$D/runs_dec"

echo "=== stage 4: fused end-to-end evaluation (test split) ==="
CKPT=$(ls -t "$D"/runs_dec/*/segpp_final.ckpt "$D"/runs_dec/segpp_final.ckpt \
       2>/dev/null | head -1)
python -m yolou_tpu.cli.evaluate \
  --model "$CKPT" --yolo "$D/yolo_best.ckpt" --data "$D" --split test \
  --imgsz 160 --batch 16
echo "=== demo complete ==="
