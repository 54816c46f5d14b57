"""Box geometry ops (JAX, fixed-shape, fully vectorized).

Functional equivalents of the ultralytics box utilities the reference relies on
(/root/reference/nms.py imports, custom_yolo_predictor/custom_detseg_predictor.py:3-5,
custom_yolo_trainer/custom_v8_segmentation_loss.py:6-9). Boxes are `(..., 4)`
arrays; all ops broadcast and are jit/vmap-safe.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def xywh2xyxy(x: jax.Array) -> jax.Array:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy2xywh(x: jax.Array) -> jax.Array:
    """(x1, y1, x2, y2) -> (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def box_area(box: jax.Array) -> jax.Array:
    """Area of xyxy boxes, shape (...,)."""
    return jnp.clip(box[..., 2] - box[..., 0], 0) * jnp.clip(box[..., 3] - box[..., 1], 0)


def box_iou(a: jax.Array, b: jax.Array, eps: float = 1e-7) -> jax.Array:
    """Pairwise IoU of xyxy boxes: a (N,4), b (M,4) -> (N,M)."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[:, None] + box_area(b)[None, :] - inter
    return inter / (union + eps)


def bbox_iou_aligned(box1: jax.Array, box2: jax.Array, xywh: bool = False,
                     ciou: bool = False, eps: float = 1e-7) -> jax.Array:
    """Elementwise IoU/CIoU of aligned box arrays (broadcastable `(..., 4)`).

    Matches ultralytics `bbox_iou` semantics (CIoU per Zheng et al. 2020) as
    used by the v8 box loss and the TAL assigner.
    """
    if xywh:
        box1, box2 = xywh2xyxy(box1), xywh2xyxy(box2)
    b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    inter = (jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0)
             * jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0))
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if not ciou:
        return iou
    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)
    c2 = cw ** 2 + ch ** 2 + eps
    rho2 = (((b2x1 + b2x2) - (b1x1 + b1x2)) ** 2
            + ((b2y1 + b2y2) - (b1y1 + b1y2)) ** 2) / 4.0
    v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
    alpha = v / (v - iou + (1 + eps))
    alpha = jax.lax.stop_gradient(alpha)
    return iou - (rho2 / c2 + v * alpha)


def make_anchors(feat_shapes: Sequence[Tuple[int, int]], strides: Sequence[int],
                 offset: float = 0.5) -> Tuple[jax.Array, jax.Array]:
    """Anchor points (in feature-map units, +offset) and per-anchor strides.

    Mirrors ultralytics `make_anchors` (used at custom_v8_segmentation_loss.py:57):
    returns (N, 2) xy points and (N, 1) strides, levels concatenated P3..P5.
    """
    pts, strs = [], []
    for (h, w), s in zip(feat_shapes, strides):
        sx = jnp.arange(w, dtype=jnp.float32) + offset
        sy = jnp.arange(h, dtype=jnp.float32) + offset
        gy, gx = jnp.meshgrid(sy, sx, indexing="ij")
        pts.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strs.append(jnp.full((h * w, 1), float(s), dtype=jnp.float32))
    return jnp.concatenate(pts, axis=0), jnp.concatenate(strs, axis=0)


def dist2bbox(distance: jax.Array, anchor_points: jax.Array, xywh: bool = True,
              axis: int = -1) -> jax.Array:
    """Decode (l, t, r, b) distances about anchor points into boxes."""
    lt, rb = jnp.split(distance, 2, axis=axis)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return jnp.concatenate([c_xy, wh], axis=axis)
    return jnp.concatenate([x1y1, x2y2], axis=axis)


def bbox2dist(anchor_points: jax.Array, bbox: jax.Array, reg_max: int) -> jax.Array:
    """Inverse of dist2bbox for DFL targets: xyxy boxes -> clamped (l,t,r,b)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    d = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], axis=-1)
    return jnp.clip(d, 0, reg_max - 1 - 0.01)


def dfl_decode(pred_distri: jax.Array, reg_max: int = 16) -> jax.Array:
    """DFL distribution -> expected distance. (..., 4*reg_max) -> (..., 4).

    Softmax over reg_max bins then expectation — the Detect head's fixed-weight
    DFL conv, implemented as math instead of a conv.

    Layout note: reshaping the channel axis to (..., 4, reg_max) forces a
    minor-dim-16 relayout on TPU (measured 1.6 ms at b128/8400 anchors vs
    1.0 ms for this form). Instead the per-side softmax is computed with the
    full 4*reg_max lane axis intact: exp is stabilized by the GLOBAL max
    (>= every per-side max, so each per-side softmax ratio is unchanged) and
    masked lane reductions take the per-side sums.
    """
    x = pred_distri.astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    ch = jnp.arange(4 * reg_max)
    sides = []
    for j in range(4):
        mask = (ch // reg_max == j).astype(jnp.float32)
        bins = mask * (ch % reg_max).astype(jnp.float32)
        sides.append(jnp.sum(e * bins, -1) / jnp.sum(e * mask, -1))
    return jnp.stack(sides, -1)


def clip_boxes(boxes: jax.Array, hw: Tuple[int, int]) -> jax.Array:
    """Clip xyxy boxes to an image of shape (h, w)."""
    h, w = hw
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def scale_boxes(from_hw: Tuple[int, int], boxes: jax.Array, to_hw: Tuple[int, int],
                padded: bool = True) -> jax.Array:
    """Rescale xyxy boxes from letterboxed `from_hw` back to original `to_hw`.

    Equivalent of ultralytics ops.scale_boxes as called by the predictors
    (custom_detseg_predictor.py:177).
    """
    gain = min(from_hw[0] / to_hw[0], from_hw[1] / to_hw[1])
    pad_x = round((from_hw[1] - to_hw[1] * gain) / 2 - 0.1)
    pad_y = round((from_hw[0] - to_hw[0] * gain) / 2 - 0.1)
    if padded:
        boxes = boxes - jnp.array([pad_x, pad_y, pad_x, pad_y], dtype=boxes.dtype)
    boxes = boxes / gain
    return clip_boxes(boxes, to_hw)
