"""Detect / Segment heads (YOLOv8-v12 style), NHWC.

Raw-output semantics match the reference's use of the torch model:
`model(x)` returns `(decoded_preds, raw_per_level_maps)` where each raw map has
channels `[4*reg_max box-distribution | nc class-logits]`, so the last channel
is the single-class logit that the objectmap generator extracts
(/root/reference/generate_objectmaps.py:91-96, evaluate_model.py:142-144).
Decoding (DFL expectation + dist2bbox + stride scaling + sigmoid cls) lives in
`decode_detections` so the loss can reuse anchors without re-decoding.

Eval-path entry fusion: per level, the first 3x3 convs of the box branch
(cv2_i_0), the mask-coefficient branch (cv4_i_0) and — at P3 — Proto's cv1
all read the SAME feature map. At inference Segment folds their BN into the
kernels and runs ONE wider 3x3 conv per level (exact same math; the feature
map is read once instead of 2-3x — ~1 ms of HBM traffic at b128/640).
The variable tree is unchanged: FoldedConvBN declares ConvBNAct's exact
names, so checkpoints and the torch converter see identical params.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import dfl_decode, dist2bbox, make_anchors
from .blocks import (ConvBNAct, ConvParams, DWConv, FoldedConvBN,
                     FoldedDWConvBN, Proto)


def _dw_to_dense(w, b):
    """Expand a folded depthwise kernel (k,k,1,c) to the equivalent dense
    (k,k,c,c) diagonal block so it can ride a fused entry conv. Exact math:
    dense[ky,kx,i,o] = δ(i,o) * dw[ky,kx,0,o]."""
    k1, k2, _, c = w.shape
    idx = jnp.arange(c)
    dense = jnp.zeros((k1, k2, c, c), w.dtype).at[:, :, idx, idx].set(
        w[:, :, 0, :])
    return dense, b

Dtype = Any


def _fused_conv3x3(x, parts, dtype, act=True):
    """One 3x3 conv for several folded (w, b) siblings sharing input `x`;
    returns the (SiLU'd) CONCATENATED output — callers slice lazily so XLA
    can fuse the slices into consumers instead of materializing copies."""
    w = jnp.concatenate([p[0] for p in parts], axis=-1).astype(dtype)
    b = jnp.concatenate([p[1] for p in parts], axis=-1)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b[None, None, None]
    if act:
        y = nn.silu(y)
    return y.astype(dtype)


def _blockdiag_conv(x, parts, k, dtype, act=True):
    """Sibling convs whose inputs are CONSECUTIVE channel blocks of `x`
    (each part = (w, b) with w (k,k,ci,oi)), run as ONE conv with a
    block-diagonal kernel — exact math, one read of `x` instead of one per
    sibling, and a single well-shaped MXU contraction (the small per-branch
    K dims of 32/64 under-fill the 128-lane MXU tiles anyway)."""
    cin = sum(p[0].shape[-2] for p in parts)
    cout = sum(p[0].shape[-1] for p in parts)
    w = jnp.zeros((k, k, cin, cout), jnp.float32)
    ri = co = 0
    for pw, _ in parts:
        w = jax.lax.dynamic_update_slice(w, pw.astype(jnp.float32),
                                         (0, 0, ri, co))
        ri += pw.shape[-2]
        co += pw.shape[-1]
    b = jnp.concatenate([p[1] for p in parts], axis=-1)
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b[None, None, None]
    if act:
        y = nn.silu(y)
    return y.astype(dtype)


class Detect(nn.Module):
    """Anchor-free detection head over (P3, P4, P5) features.

    Per level: box branch (2x Conv3x3 -> 1x1 conv to 4*reg_max) and class
    branch (2x [DWConv3x3 + Conv1x1] -> 1x1 conv to nc). Returns raw NHWC maps.

    `phase`: "full" — staged path (training / standalone detect task);
    "box_folds" — declare + return the folded (w, b) of the ENTIRE box branch
    per level (cv2_i_0 entry, cv2_i_1 mid, cv2_i_2 final) so the caller can
    batch each stage with its own same-input siblings (Segment's cv4 chain);
    "cls_with_box" — consume precomputed final box maps (`first`) and run
    only the class branch. Both fused phases declare the exact variable tree
    of the staged path.
    """

    nc: int = 80
    reg_max: int = 16
    dtype: Dtype = jnp.float32
    # ultralytics Detect.legacy: v3/v5/v8/v9 use a plain Conv3x3 stack for the
    # class branch; v10/v11/v12 use the DWConv+1x1 pairs. Released yolov8*-seg
    # checkpoints only convert with legacy=True.
    legacy: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False,
                 phase: str = "full", first: Optional[Sequence[jax.Array]] = None,
                 cls_first: Optional[Sequence[jax.Array]] = None,
                 fold_cls_entry: bool = False):
        ch = tuple(f.shape[-1] for f in feats)
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(self.nc, 100))
        if phase == "box_folds":
            folds = [{
                "entry": FoldedConvBN(ch[i], c2, 3, name=f"cv2_{i}_0")(),
                "mid": FoldedConvBN(c2, c2, 3, name=f"cv2_{i}_1")(),
                "fin": ConvParams((1, 1, c2, 4 * self.reg_max),
                                  name=f"cv2_{i}_2")(),
            } for i in range(len(feats))]
            if fold_cls_entry:
                # class-branch entry: legacy = plain dense fold; modern =
                # depthwise fold expanded to a diagonal dense block — either
                # way it joins the shared entry conv (caller), removing the
                # branch's own read of the level feature.
                for i in range(len(feats)):
                    if self.legacy:
                        folds[i]["cls_entry"] = FoldedConvBN(
                            ch[i], c3, 3, name=f"cv3_{i}_0")()
                    else:
                        folds[i]["cls_entry"] = _dw_to_dense(
                            *FoldedDWConvBN(ch[i], 3, name=f"cv3_{i}_0_0")())
            return folds
        outs = []
        for i, x in enumerate(feats):
            if phase == "cls_with_box":
                b = first[i]
            else:
                b = ConvBNAct(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
                b = ConvBNAct(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
                b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True,
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"cv2_{i}_2")(b)
            skip_entry = cls_first is not None
            if self.legacy:
                c = cls_first[i] if skip_entry else ConvBNAct(
                    c3, 3, dtype=self.dtype, name=f"cv3_{i}_0")(x, train)
                c = ConvBNAct(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1")(c, train)
            else:
                c = cls_first[i] if skip_entry else DWConv(
                    x.shape[-1], 3, dtype=self.dtype, name=f"cv3_{i}_0_0")(x, train)
                c = ConvBNAct(c3, 1, dtype=self.dtype, name=f"cv3_{i}_0_1")(c, train)
                c = DWConv(c3, 3, dtype=self.dtype, name=f"cv3_{i}_1_0")(c, train)
                c = ConvBNAct(c3, 1, dtype=self.dtype, name=f"cv3_{i}_1_1")(c, train)
            c = nn.Conv(self.nc, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"cv3_{i}_2")(c)
            outs.append(jnp.concatenate([b, c], axis=-1))
        return outs


class Segment(nn.Module):
    """Segmentation head: Detect + mask-coefficient branch + Proto masks.

    Returns (raw_maps, mask_coefs (B, N, nm), protos (B, Hm, Wm, nm)).
    At eval the per-level entry convs of Detect.cv2, cv4, and Proto.cv1 are
    batched into one conv per level (see module docstring).
    """

    nc: int = 80
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    dtype: Dtype = jnp.float32
    fuse_entry: bool = True   # batch shared-input entry convs at eval
    # Also ride the class branch's entry conv (DW expanded to a diagonal
    # dense block / legacy plain conv) on the fused entry conv. Exact math;
    # default OFF until measured on the chip (widens the entry GEMM N by the
    # level channel count in exchange for one less read of the feature).
    fuse_cls_entry: bool = False
    # Pad the P5 box+coef stack (c2+c4, typically 96) to the 128 lane width
    # with zero weight columns at eval — exact math (zero weights emit zero
    # channels and SiLU(0)=0; real outputs are sliced back out). Measured
    # (tools/head_pad_probe.py, HEAD_PAD.json): ISOLATED the 96-channel
    # stack at 20² sits on a degenerate Mosaic tiling floor — 0.639 ms base
    # vs 0.193 ms padded (3.3x) at b128/640 (80²/40² lose). IN-SITU the win
    # does not survive: interleaved A/B on the full b128 predict surface
    # (tools/headpad_insitu.py, HEADPAD_INSITU.json) has pad ON slower by
    # 0.32 ms in every rep pair — the wider entry/mid outputs forfeit more
    # epilogue fusion than the tiling fix saves. Default OFF.
    pad_p5: bool = False
    legacy: bool = False      # see Detect.legacy

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        c4 = max(feats[0].shape[-1] // 4, self.nm)
        proto = Proto(self.npr, self.nm, dtype=self.dtype, name="proto")
        detect = Detect(self.nc, self.reg_max, dtype=self.dtype,
                        legacy=self.legacy, name="detect")

        if train or not self.fuse_entry:
            protos = proto(feats[0], train)
            raw = detect(feats, train)
            coefs = []
            for i, x in enumerate(feats):
                m = ConvBNAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
                m = ConvBNAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
                m = nn.Conv(self.nm, (1, 1), use_bias=True, dtype=self.dtype,
                            param_dtype=jnp.float32, name=f"cv4_{i}_2")(m)
                coefs.append(m.reshape(m.shape[0], -1, self.nm))
            mc = jnp.concatenate(coefs, axis=1)
            return raw, mc, protos

        # --- eval: whole box+coef branches batched per level ---
        # Per level the cv2 (box) and cv4 (mask-coef) chains are three
        # same-shape stages reading the same tensors: entry 3x3s share the
        # level feature (with Proto.cv1 at P3), the mid 3x3s share the entry
        # output, the final 1x1s share the mid output. Each stage runs as ONE
        # conv (concat siblings at the entry; block-diagonal kernels after),
        # so every intermediate is read once instead of once per branch and
        # the 32/64-channel K dims fill one MXU tile instead of under-filling
        # two. Exact math; variable tree identical to the staged path.
        det_folds = detect(feats, train, phase="box_folds",
                           fold_cls_entry=self.fuse_cls_entry)
        # box-branch width comes from the folds themselves so the slicing
        # offsets below can never drift from Detect's internal formula
        c2 = det_folds[0]["entry"][0].shape[-1]
        proto_entry = proto(feats[0], train, phase="entry")
        box_outs, coefs = [], []
        cls_first = [] if self.fuse_cls_entry else None
        proto_first = None
        for i, x in enumerate(feats):
            cv4_0 = FoldedConvBN(x.shape[-1], c4, 3, name=f"cv4_{i}_0")()
            cv4_1 = FoldedConvBN(c4, c4, 3, name=f"cv4_{i}_1")()
            cv4_2 = ConvParams((1, 1, c4, self.nm), name=f"cv4_{i}_2")()
            # lane-width pad at the last level only (see pad_p5 docstring)
            pad = 0
            if (self.pad_p5 and i == len(feats) - 1
                    and not self.fuse_cls_entry and c2 + c4 < 128):
                pad = 128 - (c2 + c4)
            parts = [det_folds[i]["entry"], cv4_0]
            if self.fuse_cls_entry:
                parts.append(det_folds[i]["cls_entry"])
            if i == 0:
                parts.append(proto_entry)
            if pad:
                parts.append((jnp.zeros((3, 3, x.shape[-1], pad),
                                        jnp.float32),
                              jnp.zeros((pad,), jnp.float32)))
            y0 = _fused_conv3x3(x, parts, self.dtype)  # [c2|c4|(cls)|(npr)]
            off = c2 + c4
            if self.fuse_cls_entry:
                ccls = det_folds[i]["cls_entry"][0].shape[-1]
                cls_first.append(y0[..., off:off + ccls])
                off += ccls
            if i == 0:
                proto_first = y0[..., off:]
            if pad:
                zmid = (jnp.zeros((3, 3, pad, pad), jnp.float32),
                        jnp.zeros((pad,), jnp.float32))
                zfin = (jnp.zeros((1, 1, pad, pad), jnp.float32),
                        jnp.zeros((pad,), jnp.float32))
                y1 = _blockdiag_conv(y0, [det_folds[i]["mid"], cv4_1, zmid],
                                     3, self.dtype)
                y2 = _blockdiag_conv(y1, [det_folds[i]["fin"], cv4_2, zfin],
                                     1, self.dtype, act=False)
            else:
                y1 = _blockdiag_conv(y0[..., :c2 + c4],
                                     [det_folds[i]["mid"], cv4_1], 3,
                                     self.dtype)
                y2 = _blockdiag_conv(y1, [det_folds[i]["fin"], cv4_2], 1,
                                     self.dtype, act=False)
            box_outs.append(y2[..., :4 * self.reg_max])
            m = y2[..., 4 * self.reg_max:4 * self.reg_max + self.nm]
            coefs.append(m.reshape(m.shape[0], -1, self.nm))
        protos = proto(feats[0], train, first=proto_first)
        raw = detect(feats, train, phase="cls_with_box", first=box_outs,
                     cls_first=cls_first)
        mc = jnp.concatenate(coefs, axis=1)
        return raw, mc, protos


def decode_detections(raw: Sequence[jax.Array], strides: Sequence[int], nc: int,
                      reg_max: int = 16) -> jax.Array:
    """Raw per-level NHWC maps -> (B, N, 4+nc) decoded preds.

    Boxes are xywh in input-image pixels; class scores are sigmoided — the
    tensor the reference feeds to NMS ("detect_branch", evaluate_model.py:147).
    """
    feat_shapes = [(r.shape[1], r.shape[2]) for r in raw]
    anchors, stride_t = make_anchors(feat_shapes, strides, 0.5)
    flat = jnp.concatenate(
        [r.reshape(r.shape[0], -1, r.shape[-1]) for r in raw], axis=1
    )
    box_distri = flat[..., : 4 * reg_max]
    cls = flat[..., 4 * reg_max:]
    dist = dfl_decode(box_distri, reg_max)
    dbox = dist2bbox(dist, anchors[None], xywh=True) * stride_t[None]
    return jnp.concatenate([dbox, jax.nn.sigmoid(cls.astype(jnp.float32))], axis=-1)


def detect_bias_init_values(nc: int, strides: Sequence[int], imgsz: int = 640):
    """Reference-style head bias init: box bias 1.0; cls bias log(5/nc/(imgsz/s)^2)."""
    cls_bias = {s: math.log(5 / nc / (imgsz / s) ** 2) for s in strides}
    return 1.0, cls_bias


def warm_start_detect_bias(params, reg_max: int = 16, box_bin: int = 4,
                           cls_logit: float = 2.0):
    """Bias the Detect head's final convs so a fresh random init already
    yields confident class scores and moderate box extents — guaranteeing the
    TAL assigner finds foreground anchors. Used by multi-chip dryruns and
    sharding-equivalence tests so box/dfl/seg gradient paths are exercised
    (round-1 dryrun ran degenerately with all-background assignment)."""
    import re

    def fn(path, x):
        keys = [getattr(p, "key", "") for p in path]
        if len(keys) < 2 or keys[-1] != "bias":
            return x
        name = keys[-2]
        if re.fullmatch(r"cv3_\d+_2", name):
            return jnp.full_like(x, cls_logit)
        if re.fullmatch(r"cv2_\d+_2", name) and x.shape[-1] == 4 * reg_max:
            import numpy as np
            b = np.zeros(x.shape, np.float32)
            b.reshape(4, reg_max)[:, box_bin] = 4.0
            return jnp.asarray(b)
        return x

    return jax.tree_util.tree_map_with_path(fn, params)
