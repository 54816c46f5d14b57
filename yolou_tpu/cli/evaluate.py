"""End-to-end evaluation CLI — reference `python evaluate_model.py`
(/root/reference/evaluate_model.py:217-257)."""

from __future__ import annotations

import argparse
import json

from ..engine.evaluator import Evaluator
from ..utils.model_io import load_model
from .common import build_segpp_from_detector, get_or_init_detector


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate YOLOSegPlusPlus end-to-end")
    p.add_argument("--model", default=None,
                   help="segpp checkpoint (kind=segpp); if absent, builds from "
                        "--yolo with a fresh decoder")
    p.add_argument("--yolo", default="yolo_checkpoint/weights/best.ckpt")
    p.add_argument("--data", default="data/stacked_segmentation")
    p.add_argument("--split", default="test")
    p.add_argument("--imgsz", type=int, default=160)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--no-hd95", action="store_true")
    args = p.parse_args(argv)

    if args.model:
        model, variables = load_model(args.model)
    else:
        _, det_vars = get_or_init_detector(args.yolo, nc=1, ch=4,
                                           task="detect", imgsz=args.imgsz)
        model, variables = build_segpp_from_detector(det_vars, nc=1, ch=4,
                                                     imgsz=args.imgsz)
    ev = Evaluator(model, variables, args.data, image_size=args.imgsz,
                   batch_size=args.batch)
    metrics = ev.evaluate(args.split, with_hd95=not args.no_hd95)
    print(json.dumps(metrics, indent=2))
    return metrics


if __name__ == "__main__":
    main()
