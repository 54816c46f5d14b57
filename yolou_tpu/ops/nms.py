"""Batched fixed-shape non-max suppression for TPU.

Replaces the reference's vendored Ultralytics NMS (/root/reference/nms.py) with
an XLA-friendly design: no data-dependent shapes or Python loops. Candidates
are top-k sorted once; suppression runs either as

  * ``greedy``  — exact greedy NMS (same keep-set as torchvision/TorchNMS.nms,
    nms.py:239-296) via a fori_loop cascade over a precomputed IoU matrix, or
  * ``matrix``  — Fast-NMS (upper-triangular max-IoU test, nms.py:186-236),
    fully parallel, no sequential cascade; slightly more aggressive.

Outputs are padded to ``max_det`` with a validity mask; downstream code is
mask-aware throughout (the TPU substitute for ragged results).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import box_iou, xywh2xyxy


class NMSResult(NamedTuple):
    """Padded detections: boxes xyxy, conf, cls, extra (mask coefs), validity."""

    boxes: jax.Array   # (B, max_det, 4) xyxy
    conf: jax.Array    # (B, max_det)
    cls: jax.Array     # (B, max_det) float class index
    extra: jax.Array   # (B, max_det, E) mask coefficients etc.
    valid: jax.Array   # (B, max_det) bool

    def as_pred(self) -> jax.Array:
        """(B, max_det, 6+E) rows [x1,y1,x2,y2,conf,cls,extra...], zero-padded."""
        out = jnp.concatenate(
            [self.boxes, self.conf[..., None], self.cls[..., None], self.extra], -1)
        return out * self.valid[..., None]


def _suppress_greedy(iou: jax.Array, valid: jax.Array, iou_thres: float) -> jax.Array:
    """Exact greedy keep-set via Jacobi fixpoint (TPU-friendly).

    Greedy NMS satisfies keep[i] = valid[i] & no kept j<i with IoU>thres —
    a lexicographic maximal-independent-set condition. Instead of a K-step
    sequential cascade (terrible on TPU), iterate the dense update
        keep <- valid & ~any_{j<i}(keep[j] & iou[j,i] > thres)
    which fixes at least one more level of the suppression chain per sweep;
    real detections converge in a handful of sweeps. The while_loop exits on
    the first stable sweep, so cost is O(chain_depth) dense (K,K) ops.
    """
    k = iou.shape[0]
    hit = (iou > iou_thres) & jnp.tril(jnp.ones((k, k), bool), k=-1).T  # j<i mask
    hit = hit & valid[:, None]

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        suppressed = jnp.any(hit & keep[:, None], axis=0)
        return valid & ~suppressed, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0)))
    return keep


def _suppress_matrix(iou: jax.Array, valid: jax.Array, iou_thres: float) -> jax.Array:
    k = iou.shape[0]
    upper = jnp.triu(iou, k=1) * valid[:, None]
    max_prior = jnp.max(upper, axis=0)
    return valid & (max_prior <= iou_thres)


@partial(jax.jit, static_argnames=("conf_thres", "iou_thres", "max_det", "nc",
                                   "top_k", "max_wh", "agnostic", "method"))
def non_max_suppression(
    prediction: jax.Array,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    nc: int = 0,
    top_k: int = 512,
    max_wh: float = 7680.0,
    agnostic: bool = False,
    method: str = "greedy",
) -> NMSResult:
    """Batched NMS over decoded predictions (B, N, 4+nc+E), boxes xywh.

    Mirrors /root/reference/nms.py:13-166 semantics (confidence gate, xywh->xyxy,
    best-class selection, per-class offset trick) with fixed shapes. ``top_k``
    bounds the candidate set by confidence, like the reference ``max_nms``
    truncation (nms.py:76-99 gates on conf before NMS; ultralytics caps at
    max_nms=30000 the same way). The keep-set is EXACT whenever the >conf
    population fits in top_k — for single-class tumor detection that
    population is far below the 512 default (NMS_BISECT: k=512 saves ~1 ms
    over k=1024 at b128; tests/test_nms.py pins k-invariance under the gate).
    """
    b, n, no = prediction.shape
    nc = nc or (no - 4)
    extra = no - 4 - nc
    k = min(top_k, n)

    def single(p):
        # Work on the k surviving rows only: gathering/transforming all N
        # rows and the (k, extra)-wide gathers were 7.1 of the 15.1 ms
        # standalone NMS at b128/k1024 (tools/nms_bisect.py) — boxes are
        # gathered at k, class/coef columns only at the final max_det rows.
        cls_scores = p[:, 4:4 + nc]
        conf = cls_scores[:, 0] if nc == 1 else jnp.max(cls_scores, axis=-1)
        gate = conf > conf_thres
        score = jnp.where(gate, conf, -1.0)
        score_k, idx = jax.lax.top_k(score, k)
        valid = score_k > 0.0
        boxes_k = xywh2xyxy(p[:, :4][idx])
        if agnostic or nc == 1:   # class offset is identically zero
            iou_boxes = boxes_k
        else:
            cls_k = jnp.argmax(cls_scores, axis=-1)[idx].astype(jnp.float32)
            iou_boxes = boxes_k + (cls_k * max_wh)[:, None]
        if method == "matrix":
            iou = box_iou(iou_boxes, iou_boxes)
            keep = _suppress_matrix(iou, valid, iou_thres)
        else:
            from .pallas_nms import pallas_nms_eligible, suppress_greedy_fused

            if pallas_nms_eligible(k) and jax.default_backend() == "tpu":
                # fused VMEM kernel, same keep-set (ops/pallas_nms.py)
                keep = suppress_greedy_fused(iou_boxes, valid, iou_thres)
            else:
                iou = box_iou(iou_boxes, iou_boxes)
                keep = _suppress_greedy(iou, valid, iou_thres)
        kept_score = jnp.where(keep, score_k, -1.0)
        md = min(max_det, k)
        final_score, sel = jax.lax.top_k(kept_score, md)
        fvalid = final_score > 0.0
        z = fvalid.astype(p.dtype)
        orig = idx[sel]                      # (md,) rows in the original N
        if nc == 1:
            cls_f = jnp.zeros((md,), jnp.float32)
        else:
            cls_f = jnp.argmax(cls_scores, axis=-1)[orig].astype(jnp.float32)
        res = NMSResult(
            boxes=boxes_k[sel] * z[:, None],
            conf=jnp.where(fvalid, score_k[sel], 0.0),
            cls=cls_f * z,
            extra=p[:, 4 + nc:][orig] * z[:, None],
            valid=fvalid,
        )
        if md < max_det:
            pad = max_det - md
            res = NMSResult(
                boxes=jnp.pad(res.boxes, ((0, pad), (0, 0))),
                conf=jnp.pad(res.conf, (0, pad)),
                cls=jnp.pad(res.cls, (0, pad)),
                extra=jnp.pad(res.extra, ((0, pad), (0, 0))),
                valid=jnp.pad(res.valid, (0, pad)),
            )
        return res

    return jax.vmap(single)(prediction)
