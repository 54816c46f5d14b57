"""Objectmap generation CLI — reference `python generate_objectmaps.py`
(argparse surface per /root/reference/generate_objectmaps.py:143-163)."""

from __future__ import annotations

import argparse

from ..engine.generate import generate_objectmaps
from ..engine.predictor import Predictor
from .common import get_or_init_detector


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Generate stride-8 class-logit object maps from the "
                    "detector head for every dataset split.")
    p.add_argument("--data_dir", default="data/stacked_segmentation")
    p.add_argument("--yolo_dir", default="yolo_checkpoint/weights/best.ckpt")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--device", default=None, help="unused (jax picks the TPU)")
    p.add_argument("--image_size", type=int, default=160)
    p.add_argument("--confidence", type=float, default=0.25)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--workers", type=int, default=10, help="unused on TPU")
    args = p.parse_args(argv)

    model, variables = get_or_init_detector(
        args.yolo_dir, nc=1, ch=4, task="detect", imgsz=args.image_size)
    pred = Predictor(model, variables, imgsz=args.image_size, channels=4,
                     conf=args.confidence, batch_size=min(args.batch_size, 128))
    counts = generate_objectmaps(pred, args.data_dir,
                                 out_root=args.out_dir or args.data_dir,
                                 batch_size=args.batch_size)
    print(counts)
    return counts


if __name__ == "__main__":
    main()
