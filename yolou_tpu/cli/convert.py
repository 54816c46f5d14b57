"""Checkpoint conversion CLI — import a torch/ultralytics state_dict .pt
into this framework's checkpoint format (the "switch from the reference"
path; reference checkpoints are gitignored .pt files, SURVEY.md §0).

Wraps tools/torch2jax.py: ultralytics-name bijection, NHWC relayout, AAttn
qkv head-major -> role-major permutation. Golden-forward fidelity of the
mapping is tested in tests/test_torch_golden.py.

Examples:
  python -m yolou_tpu convert --pt best.pt --task segment --out best.ckpt
  python -m yolou_tpu convert --pt decoder.pt --kind segpp --out segpp.ckpt
  # export TPU-finetuned weights BACK to the torch/ultralytics ecosystem:
  python -m yolou_tpu convert --reverse --out best.ckpt --pt finetuned_sd.pt

Note: the input must be a plain state_dict .pt (loaded weights_only — no
pickle execution). An ultralytics runs/.../best.pt is a pickled Model object;
extract it once in any env that has ultralytics installed:
  torch.save(torch.load("best.pt")["model"].float().state_dict(), "sd.pt")
The key sets this converter expects are pinned byte-for-byte in
tests/fixtures/*_state_dict.txt (yolov12n/yolov8n/yolo11n -seg).
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser(description="Convert a torch state_dict "
                                "checkpoint to a yolou_tpu .ckpt (or, with "
                                "--reverse, a .ckpt back to a torch .pt).")
    p.add_argument("--pt", required=True,
                   help="torch .pt/.pth state_dict (input; with --reverse: "
                        "the output path)")
    p.add_argument("--out", required=True,
                   help="output .ckpt path (with --reverse: the input .ckpt)")
    p.add_argument("--reverse", action="store_true",
                   help="export a yolou_tpu .ckpt AS a reference-style torch "
                        "state_dict .pt (inverse bijection incl. layout and "
                        "qkv permutation; synthesizes num_batches_tracked "
                        "and dfl.conv.weight so the dict loads strict into "
                        "the released ultralytics module tree)")
    p.add_argument("--arch", default="yolov12",
                   choices=["yolov12", "yolov8", "yolo11"])
    p.add_argument("--variant", default="n", choices=list("nsmlx"))
    p.add_argument("--task", default="segment", choices=["detect", "segment"])
    p.add_argument("--kind", default="yolo", choices=["yolo", "segpp"],
                   help="yolo: detector; segpp: YOLO-Seg++ decoder ckpt "
                        "(encoder.* torch prefix)")
    p.add_argument("--nc", type=int, default=1)
    p.add_argument("--channels", type=int, default=4)
    p.add_argument("--imgsz", type=int, default=160)
    p.add_argument("--prefix-map", default=None,
                   help='JSON dict of name-prefix rewrites, e.g. '
                        '\'{"model": "model.model"}\'')
    p.add_argument("--lenient", action="store_true",
                   help="leave unmatched leaves at their template init "
                        "instead of failing")
    args = p.parse_args(argv)

    from ..tools.torch2jax import convert_state_dict, load_torch_state_dict
    from ..utils.model_io import save_model

    if args.reverse:
        from ..tools.torch2jax import (jax_to_torch_state_dict,
                                       save_torch_state_dict)
        from ..utils.checkpoint import load_checkpoint

        blob = load_checkpoint(args.out)
        meta = json.loads(blob["meta_json"])
        kind = meta.get("kind", args.kind)
        prefix_map = {"yolo.model": "encoder"} if kind == "segpp" else {}
        if args.prefix_map:
            prefix_map.update(json.loads(args.prefix_map))
        sd = jax_to_torch_state_dict(blob["variables"], prefix_map=prefix_map)
        save_torch_state_dict(args.pt, sd)
        print(f"exported {len(sd)} tensors ({kind}) -> {args.pt}")
        return {"exported": len(sd)}

    torch_sd = load_torch_state_dict(args.pt)

    if args.kind == "segpp":
        from ..models.segpp import YOLOSegPP
        from ..models.yolo import parse_model_spec

        spec = parse_model_spec("yolov12", args.variant, args.nc,
                                args.channels, "detect")
        model = YOLOSegPP(spec=spec)
        template = jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.key(0),
            jnp.zeros((1, args.imgsz, args.imgsz, args.channels)))
        prefix_map = {"yolo.model": "encoder"}
    else:
        from ..models.yolo import build_yolo

        model = build_yolo(args.arch, args.variant, nc=args.nc,
                           ch=args.channels, task=args.task)
        template = jax.jit(lambda k, x: model.init(k, x, train=False))(
            jax.random.key(0),
            jnp.zeros((1, args.imgsz, args.imgsz, args.channels)))
        prefix_map = {}
    if args.prefix_map:
        prefix_map.update(json.loads(args.prefix_map))

    variables, report = convert_state_dict(
        torch_sd, jax.device_get(template), prefix_map=prefix_map,
        strict=not args.lenient)
    print(f"matched {report['matched']} tensors; "
          f"missing {len(report['missing'])}, unused {len(report['unused'])}")
    if report["missing"]:
        for m in report["missing"][:8]:
            print("  missing:", m)
    if report["unused"]:
        for u in report["unused"][:8]:
            print("  unused torch key:", u)
    save_model(args.out, variables, arch=args.arch, variant=args.variant,
               nc=args.nc, ch=args.channels, task=args.task, kind=args.kind)
    print(f"saved {args.out}")
    return report


if __name__ == "__main__":
    main()
