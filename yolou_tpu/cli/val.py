"""Validation CLI — standalone detector mAP50/mAP50-95/P/R over a split
(the ultralytics `yolo val` surface; the reference only validates inside
its trainers). Wraps engine/validator.py::validate_detector, including
rect-mode batching (custom_base.py:316-339 semantics)."""

from __future__ import annotations

import argparse
import json
import os

from ..data.config import load_data_yaml
from ..engine.validator import validate_detector
from .common import get_or_init_detector


def main(argv=None):
    p = argparse.ArgumentParser(description="Validate a detector checkpoint: "
                                "mAP50 / mAP50-95 / precision / recall.")
    p.add_argument("--data", required=True,
                   help="data.yaml or a directory of images with labels/")
    p.add_argument("--split", default="val", choices=["train", "val", "test"])
    p.add_argument("--model", default="yolo_checkpoint/weights/best.ckpt")
    p.add_argument("--task", default="segment", choices=["detect", "segment"])
    p.add_argument("--imgsz", type=int, default=160)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--rect", action="store_true",
                   help="rect-mode val: aspect-ratio-grouped letterbox batches")
    p.add_argument("--out", default=None, help="optional metrics JSON path")
    args = p.parse_args(argv)

    if args.data.endswith((".yaml", ".yml")):
        cfg = load_data_yaml(args.data)
        img_dir = cfg.split_dir(args.split)
        args.channels = cfg.channels
        nc = cfg.nc
    else:
        nc = 1
        img_dir = os.path.join(args.data, "images", args.split)
        if not os.path.isdir(img_dir):
            img_dir = args.data

    model, variables = get_or_init_detector(
        args.model, nc=nc, ch=args.channels, task=args.task, imgsz=args.imgsz)
    metrics = validate_detector(
        model, variables, img_dir, imgsz=args.imgsz, channels=args.channels,
        batch_size=args.batch, conf=args.conf, iou=args.iou,
        max_det=args.max_det, rect=args.rect)
    print(json.dumps(metrics, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=1)
    return metrics


if __name__ == "__main__":
    main()
