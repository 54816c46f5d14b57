"""Model export: serialize the fused inference program to StableHLO.

The deployment story the torch world gets from torchscript/ONNX, done the
JAX way: `jax.export` captures the WHOLE jitted pipeline — preprocess ->
forward -> decode -> NMS — as a portable StableHLO artifact with versioned
custom-call compatibility guarantees. Weights stay a runtime argument (saved
alongside as msgpack), so one program serves any checkpoint of the same
architecture.

Artifacts written to a directory:
  program.stablehlo   serialized jax.export blob (multi-platform)
  weights.msgpack     flax variables (utils/checkpoint.py format)
  meta.json           arch/variant/imgsz/batch/platform manifest
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def build_inference_fn(model, conf: float = 0.25, iou: float = 0.45,
                       max_det: int = 300, imgsz: int = 640):
    """The predictor's fused program as a pure fn(variables, imgs_u8)."""
    import jax
    import jax.numpy as jnp

    from ..ops.letterbox import letterbox_batch
    from ..ops.nms import non_max_suppression

    stem_s2d = bool(getattr(model, "stem_s2d", False))

    def fn(variables, imgs_u8):
        if stem_s2d:
            x = (imgs_u8.astype(jnp.float32) / 255.0).astype(model.dtype)
        else:
            x = letterbox_batch(imgs_u8, (imgsz, imgsz),
                                out_dtype=model.dtype)
        out = model.apply(variables, x, train=False)
        dets = non_max_suppression(out.preds.astype(jnp.float32),
                                   conf_thres=conf, iou_thres=iou,
                                   max_det=max_det, nc=model.spec.nc)
        res = (dets.boxes, dets.conf, dets.cls, dets.valid)
        if model.spec.task == "segment":
            res = res + (dets.extra, out.protos)
        return res

    return fn


def export_model(model, variables, out_dir: str, *, imgsz: int = 640,
                 batch: int = 1, channels: int = 4,
                 platforms: Sequence[str] = ("cpu", "tpu"),
                 conf: float = 0.25, iou: float = 0.45, max_det: int = 300,
                 arch: str = "yolov12", variant: str = "n") -> Dict:
    """Serialize the fused inference program + weights. Returns the manifest."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..utils.checkpoint import save_checkpoint

    fn = build_inference_fn(model, conf=conf, iou=iou, max_det=max_det,
                            imgsz=imgsz)
    stem_s2d = bool(getattr(model, "stem_s2d", False))
    in_shape = ((batch, imgsz // 4, imgsz // 4, 16 * channels) if stem_s2d
                else (batch, imgsz, imgsz, channels))
    var_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        jax.device_get(variables))
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(
        var_shapes, jax.ShapeDtypeStruct(in_shape, jnp.uint8))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "program.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    save_checkpoint(os.path.join(out_dir, "weights.msgpack"),
                    {"variables": jax.device_get(variables)})
    meta = {"arch": arch, "variant": variant, "task": model.spec.task,
            "nc": model.spec.nc, "imgsz": imgsz, "batch": batch,
            "channels": channels, "stem_s2d": stem_s2d,
            "platforms": list(platforms), "conf": conf, "iou": iou,
            "max_det": max_det, "input_shape": list(in_shape),
            "outputs": ["boxes", "conf", "cls", "valid"] + (
                ["mask_coefs", "protos"] if model.spec.task == "segment"
                else [])}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


def export_segpp(model, variables, out_dir: str, *, imgsz: int = 160,
                 batch: int = 1, channels: int = 4,
                 platforms: Sequence[str] = ("cpu", "tpu"),
                 conf: float = 0.25, iou: float = 0.45,
                 max_det: int = 300) -> Dict:
    """Export the fused YOLO-Seg++ e2e program: one backbone pass ->
    detector NMS + binary whole-tumor mask (the evaluate_model.py product)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from ..ops.nms import non_max_suppression
    from ..utils.checkpoint import save_checkpoint

    def fn(variables, imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        mask_logits, out = model.apply(variables, x, train=False)
        dets = non_max_suppression(out.preds.astype(jnp.float32),
                                   conf_thres=conf, iou_thres=iou,
                                   max_det=max_det, nc=model.spec.nc)
        mask = (jax.nn.sigmoid(mask_logits) > 0.5).astype(jnp.uint8)
        return mask, dets.boxes, dets.conf, dets.valid

    in_shape = (batch, imgsz, imgsz, channels)
    var_shapes = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        jax.device_get(variables))
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(
        var_shapes, jax.ShapeDtypeStruct(in_shape, jnp.uint8))
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "program.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    save_checkpoint(os.path.join(out_dir, "weights.msgpack"),
                    {"variables": jax.device_get(variables)})
    meta = {"kind": "segpp", "task": "segment-e2e", "imgsz": imgsz,
            "batch": batch, "channels": channels, "platforms": list(platforms),
            "conf": conf, "iou": iou, "max_det": max_det,
            "input_shape": list(in_shape),
            "outputs": ["mask", "boxes", "conf", "valid"]}
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedModel:
    """Load and run an exported artifact directory."""

    def __init__(self, path: str):
        from jax import export as jexport

        from ..utils.checkpoint import load_checkpoint

        with open(os.path.join(path, "program.stablehlo"), "rb") as f:
            self.exported = jexport.deserialize(f.read())
        self.variables = load_checkpoint(
            os.path.join(path, "weights.msgpack"))["variables"]
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)

    def __call__(self, imgs_u8):
        import jax.numpy as jnp

        return self.exported.call(self.variables,
                                  jnp.asarray(imgs_u8, jnp.uint8))
