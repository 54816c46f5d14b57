"""Predict CLI — the ultralytics `model.predict(source=...)` surface as a
command (the reference drives prediction through BasePredictor inside
generate_heatmaps.py:118 and the custom predictors; here it is also a
first-class CLI over the same engine.Predictor).

Examples:
  python -m yolou_tpu.cli.predict --source img.png --model best.ckpt
  python -m yolou_tpu.cli.predict --source imgs_dir --save-dir out/ \
      --task segment --retina-masks --stem-s2d
"""

from __future__ import annotations

import argparse
import json
import os

from ..engine.predictor import Predictor
from .common import get_or_init_detector


def main(argv=None):
    p = argparse.ArgumentParser(description="Run detection/segmentation "
                                "inference on images/dirs/videos/streams.")
    p.add_argument("--source", required=True,
                   help="file, dir, glob, txt list, video, stream URL")
    p.add_argument("--model", default="yolo_checkpoint/weights/best.ckpt")
    p.add_argument("--task", default="segment", choices=["detect", "segment"])
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--retina-masks", action="store_true")
    p.add_argument("--stem-s2d", action="store_true",
                   help="lane-dense s2d(4) stem + host letterbox (fast path; "
                        "requires imgsz %% 4 == 0)")
    p.add_argument("--save-dir", default=None,
                   help="write annotated images + a detections.json here")
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    dtype = jnp.bfloat16 if args.bf16 else None
    model, variables = get_or_init_detector(
        args.model, nc=1, ch=args.channels, task=args.task,
        imgsz=args.imgsz, dtype=dtype)
    if args.stem_s2d:
        from ..models.yolo import YOLOModel

        model = YOLOModel(spec=model.spec, dtype=model.dtype,
                          use_pallas=model.use_pallas, stem_s2d=True)
    pred = Predictor(model, variables, imgsz=args.imgsz,
                     channels=args.channels, conf=args.conf, iou=args.iou,
                     max_det=args.max_det, batch_size=args.batch,
                     retina_masks=args.retina_masks)
    results = pred(args.source)

    summary = []
    for r in results:
        n = len(r.boxes) if r.boxes is not None else 0
        summary.append({"path": r.path, "detections": n,
                        "conf": [float(c) for c in
                                 (r.boxes.conf.tolist() if n else [])]})
        print(f"{r.path}: {n} detection(s)")
        if args.save_dir:
            os.makedirs(args.save_dir, exist_ok=True)
            base = os.path.splitext(os.path.basename(str(r.path)))[0]
            base = base.replace("#", "_").replace("/", "_")
            r.save(os.path.join(args.save_dir, f"{base}_pred.png"))
    if args.save_dir:
        with open(os.path.join(args.save_dir, "detections.json"), "w") as f:
            json.dump(summary, f, indent=1)
        print(f"saved {len(results)} annotated image(s) to {args.save_dir}")
    return results


if __name__ == "__main__":
    main()
