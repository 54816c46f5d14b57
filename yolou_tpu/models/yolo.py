"""YOLO detection/segmentation model: spec parser + graph executor (Flax).

Replaces the capability the reference gets from ultralytics DetectionModel /
CustomSegmentationModel (/root/reference/custom_yolo_trainer/
custom_segmentation_model.py). The executor supports "taps" — returning
intermediate layer outputs by index — which is how the YOLOSegPlusPlus decoder
gets its skip connections without a second backbone pass (fixes the
double-forward noted in SURVEY.md §3.2).

Output API parity: `apply(...)` returns a `YoloOutputs` whose `raw` tuple is the
reference's `cls_branch` (per-level raw maps, last channel = class logit) and
whose `preds` is the `detect_branch` fed to NMS (boxes in pixels + sigmoid cls
[+ mask coefs for segment]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..nn.attention import A2C2f
from ..nn.blocks import (C2f, C3Ghost, C3k2, ConvBNAct, SPPF, upsample2x)
from ..nn.heads import Detect, Segment, decode_detections
from . import specs

Dtype = Any


@struct.dataclass
class YoloOutputs:
    """Structured model outputs (a pytree; fields may be None)."""

    raw: Tuple[jax.Array, ...]        # per-level NHWC raw maps [4*reg_max | nc]
    preds: Optional[jax.Array]        # (B, N, 4+nc[+nm]) decoded, NMS-ready
    mask_coefs: Optional[jax.Array]   # (B, N, nm) — segment task only
    protos: Optional[jax.Array]       # (B, Hm, Wm, nm) — segment task only
    taps: Dict[int, jax.Array]        # requested intermediate features


@dataclasses.dataclass(frozen=True)
class LayerDef:
    frm: Tuple[int, ...]
    repeats: int
    block: str
    args: Tuple


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Fully-resolved (scaled) model graph. Hashable => usable as a Module field."""

    layers: Tuple[LayerDef, ...]
    channels: Tuple[int, ...]      # output channels per layer
    head_from: Tuple[int, ...]
    strides: Tuple[int, ...]
    nc: int
    task: str                      # "detect" | "segment"
    nm: int = 32
    npr: int = 64
    reg_max: int = 16
    # ultralytics Detect.legacy: True for the v8 family's plain-Conv class
    # branch, False for v11/v12's DWConv pairs (see nn/heads.py).
    legacy_head: bool = False


def parse_model_spec(arch: str = "yolov12", variant: str = "n", nc: int = 1,
                     ch: int = 4, task: str = "detect") -> ModelSpec:
    backbone, head, scales = specs.SPECS[arch]
    depth, width, max_ch = scales[variant]
    rows = backbone + head

    layers = []
    channels = [ch]  # channels[i+1] = out channels of layer i
    stride = 1
    level_strides: Dict[int, int] = {}
    head_from: Tuple[int, ...] = ()

    for i, (f, n, block, args) in enumerate(rows):
        frm = tuple(f) if isinstance(f, list) else (f,)
        cin = channels[frm[0] + 1] if frm[0] != -1 else channels[-1]
        n_scaled = specs.scale_depth(n, depth)
        if block == "Conv":
            c2 = specs.scale_channels(args[0], width, max_ch)
            k, s = args[1], args[2]
            layers.append(LayerDef(frm, 1, "Conv", (c2, k, s)))
            channels.append(c2)
            if s == 2:
                stride *= 2
        elif block in ("C3k2", "C2f", "A2C2f", "C3Ghost", "SPPF", "C2PSA"):
            c2 = specs.scale_channels(args[0], width, max_ch)
            extra = tuple(args[1:])
            layers.append(LayerDef(frm, n_scaled, block, (c2,) + extra))
            channels.append(c2)
        elif block == "Upsample":
            layers.append(LayerDef(frm, 1, "Upsample", tuple(args)))
            channels.append(cin)
            stride //= args[0]
        elif block == "Concat":
            csum = sum(channels[j + 1] if j != -1 else channels[-1] for j in frm)
            layers.append(LayerDef(frm, 1, "Concat", ()))
            channels.append(csum)
        elif block == "HEAD":
            head_from = frm
            layers.append(LayerDef(frm, 1, "HEAD", ()))
            channels.append(0)
        else:
            raise ValueError(f"unknown block {block!r} in spec {arch}")

    # Head strides: infer from total downsampling of each head input.
    # For the P3/P4/P5 family these are 8/16/32.
    strides = (8, 16, 32)
    npr = specs.scale_channels(256, width, max_ch)
    return ModelSpec(
        layers=tuple(layers), channels=tuple(channels), head_from=head_from,
        strides=strides, nc=nc, task=task, npr=npr,
        legacy_head=(arch == "yolov8"),
    )


class YOLOModel(nn.Module):
    """Graph executor for a parsed ModelSpec (NHWC, jit-friendly).

    use_pallas routes area-attention through the fused Pallas kernel.
    """

    spec: ModelSpec
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    stem_s2d: bool = False   # inference: input is space_to_depth(x, 4)
    fuse_cls_entry: bool = False  # see nn/heads.py Segment.fuse_cls_entry
    pad_head_p5: bool = False     # probe-only, loses in-situ — see
    #                               nn/heads.py Segment.pad_p5
    mega_kernel: bool = False  # A2C2f whole-block kernel — probe-only, loses
    #                            in-situ (tools/mega_probe.py; attention.py)

    @nn.compact
    def __call__(self, x, train: bool = False, taps: Sequence[int] = (),
                 stop_at: Optional[int] = None) -> YoloOutputs:
        """Run the graph. `taps` returns intermediates by layer index;
        `stop_at` truncates execution after layer stop_at-1 (encoder-slice
        mode for decoder-only training — reference encoder = layers [0:5],
        YOLOSegPlusPlus.py:150)."""
        spec = self.spec
        x = x.astype(self.dtype)
        ys: list = []
        tap_out: Dict[int, jax.Array] = {}

        def get(j: int):
            return ys[j] if j != -1 else (ys[-1] if ys else x)

        # Concat layers are LAZY (a tuple of inputs): blocks whose entry is a
        # 1x1 conv consume the tuple via a split-kernel GEMM sum (identical
        # math + params; the concatenated tensor never hits HBM). Consumers
        # that need a real tensor materialize here.
        from ..nn.blocks import cat_channels

        def get_mat(j: int) -> jax.Array:
            return cat_channels(get(j))

        head_out = None
        start = 0
        if self.stem_s2d:
            # Lane-dense stem on s2d(4) input (loader emits the layout; the
            # on-device transpose costs 3.5+ ms and is never taken). Layers
            # 0 and 1 must be the standard 3x3/s2 convs; ys[0]==ys[1]==stem
            # output, so taps/frm below 2 are not supported in this mode.
            from ..nn.blocks import FoldedConvBN, s2d_stem_apply
            l0, l1 = spec.layers[0], spec.layers[1]
            assert l0.block == "Conv" and l0.args[1:] == (3, 2), l0
            assert l1.block == "Conv" and l1.args[1:] == (3, 2), l1
            assert not train and (stop_at is None or stop_at > 2)
            assert not any(t < 2 for t in taps)
            ch = x.shape[-1] // 16
            w0, b0 = FoldedConvBN(ch, l0.args[0], 3, name="model_0")()
            w1, b1 = FoldedConvBN(l0.args[0], l1.args[0], 3, name="model_1")()
            y = s2d_stem_apply(x, w0, b0, w1, b1, ch, l0.args[0], l1.args[0],
                               self.dtype)
            ys.extend([y, y])
            start = 2
        for i, layer in enumerate(spec.layers):
            if i < start:
                continue
            if stop_at is not None and i >= stop_at:
                break
            if layer.block == "Conv":
                c2, k, s = layer.args
                y = ConvBNAct(c2, k, s, dtype=self.dtype, name=f"model_{i}")(
                    get(layer.frm[0]), train)
            elif layer.block == "C3k2":
                c2 = layer.args[0]
                c3k = layer.args[1] if len(layer.args) > 1 else False
                e = layer.args[2] if len(layer.args) > 2 else 0.5
                y = C3k2(c2, layer.repeats, c3k, e, dtype=self.dtype,
                         name=f"model_{i}")(get(layer.frm[0]), train)
            elif layer.block == "C2f":
                c2 = layer.args[0]
                shortcut = layer.args[1] if len(layer.args) > 1 else False
                y = C2f(c2, layer.repeats, shortcut, dtype=self.dtype,
                        name=f"model_{i}")(get(layer.frm[0]), train)
            elif layer.block == "A2C2f":
                c2, a2 = layer.args[0], layer.args[1]
                area = layer.args[2] if len(layer.args) > 2 else 1
                area = area if isinstance(area, int) and area > 0 else 1
                y = A2C2f(c2, layer.repeats, a2, area, dtype=self.dtype,
                          use_pallas=self.use_pallas,
                          mega_kernel=self.mega_kernel,
                          name=f"model_{i}")(get(layer.frm[0]), train)
            elif layer.block == "C3Ghost":
                y = C3Ghost(layer.args[0], layer.repeats, dtype=self.dtype,
                            name=f"model_{i}")(get(layer.frm[0]), train)
            elif layer.block == "SPPF":
                y = SPPF(layer.args[0], layer.args[1], dtype=self.dtype,
                         name=f"model_{i}")(get_mat(layer.frm[0]), train)
            elif layer.block == "C2PSA":
                from ..nn.attention import C2PSA
                y = C2PSA(layer.args[0], layer.repeats, dtype=self.dtype,
                          name=f"model_{i}")(get(layer.frm[0]), train)
            elif layer.block == "Upsample":
                v = get_mat(layer.frm[0])
                if layer.args[1] == "nearest" and layer.args[0] == 2:
                    from ..nn.blocks import LazyUpsample2x
                    y = LazyUpsample2x(v)   # deferred; consumers materialize
                else:
                    y = upsample2x(v, layer.args[1])
            elif layer.block == "Concat":
                parts = []
                for j in layer.frm:
                    v = get(j)
                    if isinstance(v, tuple):
                        parts.extend(v)
                    else:
                        parts.append(v)   # arrays and LazyUpsample2x pieces
                y = tuple(parts)
            elif layer.block == "HEAD":
                feats = [get_mat(j) for j in layer.frm]
                if spec.task == "segment":
                    raw, mc, protos = Segment(
                        spec.nc, spec.nm, spec.npr, spec.reg_max,
                        dtype=self.dtype, legacy=spec.legacy_head,
                        fuse_cls_entry=self.fuse_cls_entry,
                        pad_p5=self.pad_head_p5,
                        name=f"model_{i}")(feats, train)
                    head_out = (tuple(raw), mc, protos)
                else:
                    raw = Detect(spec.nc, spec.reg_max, dtype=self.dtype,
                                 legacy=spec.legacy_head,
                                 name=f"model_{i}")(feats, train)
                    head_out = (tuple(raw), None, None)
                y = feats[0]  # placeholder; head is terminal
            else:  # pragma: no cover
                raise ValueError(layer.block)
            ys.append(y)
            if i in taps:
                tap_out[i] = cat_channels(y)

        if head_out is None:
            return YoloOutputs(raw=(), preds=None, mask_coefs=None, protos=None,
                               taps=tap_out)
        raw, mc, protos = head_out
        preds = decode_detections(raw, spec.strides, spec.nc, spec.reg_max)
        if mc is not None:
            preds = jnp.concatenate([preds, mc.astype(preds.dtype)], axis=-1)
        return YoloOutputs(raw=raw, preds=preds, mask_coefs=mc, protos=protos,
                           taps=tap_out)


def build_yolo(arch: str = "yolov12", variant: str = "n", nc: int = 1, ch: int = 4,
               task: str = "detect", dtype: Dtype = jnp.float32,
               use_pallas: bool = False,
               stem_s2d: bool = False,
               fuse_cls_entry: bool = False,
               mega_kernel: bool = False,
               pad_head_p5: bool = False) -> YOLOModel:
    return YOLOModel(spec=parse_model_spec(arch, variant, nc, ch, task),
                     dtype=dtype, use_pallas=use_pallas, stem_s2d=stem_s2d,
                     fuse_cls_entry=fuse_cls_entry, mega_kernel=mega_kernel,
                     pad_head_p5=pad_head_p5)


def init_model(model: YOLOModel, rng: jax.Array, imgsz: int = 160, ch: int = 4,
               batch: int = 1):
    x = jnp.zeros((batch, imgsz, imgsz, ch), jnp.float32)
    return model.init(rng, x, train=False)


def inflate_stem_to_4ch(params: dict, mean_extra: bool = True) -> dict:
    """3->4 channel first-conv inflation; 4th channel = mean of RGB kernels.

    Behavioral port of modify_YOLO (/root/reference/train.py:493-551) in flax
    param-tree terms (kernel layout HWIO).
    """
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    key = None
    for k in flat:
        if k[-3:] == ("model_0", "conv", "kernel"):
            key = k
            break
    if key is None:
        raise KeyError("stem conv kernel not found (model_0/conv/kernel)")
    w = flat[key]
    if w.shape[2] == 4:
        return params
    assert w.shape[2] == 3, w.shape
    extra = jnp.mean(w, axis=2, keepdims=True)
    flat[key] = jnp.concatenate([w, extra], axis=2)
    return flax.traverse_util.unflatten_dict(flat)


def count_params(tree) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(tree))
