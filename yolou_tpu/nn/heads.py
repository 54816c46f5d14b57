"""Detect / Segment heads (YOLOv8-v12 style), NHWC.

Raw-output semantics match the reference's use of the torch model:
`model(x)` returns `(decoded_preds, raw_per_level_maps)` where each raw map has
channels `[4*reg_max box-distribution | nc class-logits]`, so the last channel
is the single-class logit that the objectmap generator extracts
(/root/reference/generate_objectmaps.py:91-96, evaluate_model.py:142-144).
Decoding (DFL expectation + dist2bbox + stride scaling + sigmoid cls) lives in
`decode_detections` so the loss can reuse anchors without re-decoding.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.boxes import dfl_decode, dist2bbox, make_anchors
from .blocks import ConvBNAct, DWConv, Proto

Dtype = Any


class Detect(nn.Module):
    """Anchor-free detection head over (P3, P4, P5) features.

    Per level: box branch (2x Conv3x3 -> 1x1 conv to 4*reg_max) and class
    branch (2x [DWConv3x3 + Conv1x1] -> 1x1 conv to nc). Returns raw NHWC maps.
    """

    nc: int = 80
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False) -> List[jax.Array]:
        ch = tuple(f.shape[-1] for f in feats)
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(self.nc, 100))
        outs = []
        for i, x in enumerate(feats):
            b = ConvBNAct(c2, 3, dtype=self.dtype, name=f"cv2_{i}_0")(x, train)
            b = ConvBNAct(c2, 3, dtype=self.dtype, name=f"cv2_{i}_1")(b, train)
            b = nn.Conv(4 * self.reg_max, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"cv2_{i}_2")(b)
            c = DWConv(x.shape[-1], 3, dtype=self.dtype, name=f"cv3_{i}_0_0")(x, train)
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
    """

    nc: int = 80
    nm: int = 32
    npr: int = 256
    reg_max: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        protos = Proto(self.npr, self.nm, dtype=self.dtype,
                       name="proto")(feats[0], train)
        raw = Detect(self.nc, self.reg_max, dtype=self.dtype, name="detect")(feats, train)
        c4 = max(feats[0].shape[-1] // 4, self.nm)
        coefs = []
        for i, x in enumerate(feats):
            m = ConvBNAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_0")(x, train)
            m = ConvBNAct(c4, 3, dtype=self.dtype, name=f"cv4_{i}_1")(m, train)
            m = nn.Conv(self.nm, (1, 1), use_bias=True, dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"cv4_{i}_2")(m)
            coefs.append(m.reshape(m.shape[0], -1, self.nm))
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
