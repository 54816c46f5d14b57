"""Export CLI — serialize the fused inference pipeline (preprocess ->
forward -> decode -> NMS) to a portable StableHLO artifact directory
(program.stablehlo + weights.msgpack + meta.json), the JAX-native
equivalent of the ultralytics export surface.

Example:
  python -m yolou_tpu export --model best.ckpt --imgsz 640 --batch 16 \
      --out exported/ --platforms cpu,tpu
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description="Export the fused inference "
                                "program to StableHLO.")
    p.add_argument("--model", default="yolo_checkpoint/weights/best.ckpt")
    p.add_argument("--out", required=True, help="output artifact directory")
    p.add_argument("--task", default="segment", choices=["detect", "segment"])
    p.add_argument("--kind", default="yolo", choices=["yolo", "segpp"],
                   help="segpp: export the fused e2e detector+decoder mask "
                        "program from a SegPP checkpoint")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--conf", type=float, default=0.25)
    p.add_argument("--iou", type=float, default=0.45)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--stem-s2d", action="store_true",
                   help="export the s2d(4)-input fast-path program")
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from ..engine.exporter import export_model, export_segpp
    from .common import get_or_init_detector

    dtype = jnp.bfloat16 if args.bf16 else None
    if args.kind == "segpp":
        import os

        from ..utils.model_io import load_model

        if os.path.exists(args.model):
            model, variables = load_model(args.model, dtype=dtype)
        else:  # fresh init (smoke/testing path, like get_or_init_detector)
            from .common import build_segpp_from_detector

            det, det_vars = get_or_init_detector(
                None, nc=1, ch=args.channels, task="detect",
                imgsz=args.imgsz, dtype=dtype)
            model, variables = build_segpp_from_detector(
                det_vars, nc=1, ch=args.channels, imgsz=args.imgsz,
                dtype=dtype)
        meta = export_segpp(
            model, variables, args.out, imgsz=args.imgsz, batch=args.batch,
            channels=args.channels, platforms=args.platforms.split(","),
            conf=args.conf, iou=args.iou, max_det=args.max_det)
        print(json.dumps(meta, indent=1))
        print(f"exported to {args.out}")
        return meta
    model, variables = get_or_init_detector(
        args.model, nc=1, ch=args.channels, task=args.task,
        imgsz=args.imgsz, dtype=dtype)
    if args.stem_s2d:
        from ..models.yolo import YOLOModel

        model = YOLOModel(spec=model.spec, dtype=model.dtype,
                          use_pallas=model.use_pallas, stem_s2d=True)
    meta = export_model(
        model, variables, args.out, imgsz=args.imgsz, batch=args.batch,
        channels=args.channels, platforms=args.platforms.split(","),
        conf=args.conf, iou=args.iou, max_det=args.max_det)
    print(json.dumps(meta, indent=1))
    print(f"exported to {args.out}")
    return meta


if __name__ == "__main__":
    main()
