"""Task-Aligned Assigner — fully vectorized, fixed-shape (no per-image loops).

JAX reimplementation of the assignment semantics the reference inherits from
ultralytics `TaskAlignedAssigner` (used at custom_yolo_trainer/
custom_v8_segmentation_loss.py:78-85): align metric s^alpha * CIoU^beta,
center-in-box candidate gate, top-k per GT, multi-assignment resolved by max
overlap, target scores normalized by per-GT max align/overlap.

Ground truth is padded to a static max-G per image with a validity mask —
the TPU substitute for dynamic instance counts (SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou_aligned


class AssignResult(NamedTuple):
    target_labels: jax.Array   # (B, A) int32
    target_bboxes: jax.Array   # (B, A, 4) xyxy, same units as inputs
    target_scores: jax.Array   # (B, A, nc) normalized soft targets
    fg_mask: jax.Array         # (B, A) bool
    target_gt_idx: jax.Array   # (B, A) int32 index into the padded GT dim


@partial(jax.jit, static_argnames=("topk", "alpha", "beta"))
def task_aligned_assign(
    pred_scores: jax.Array,    # (B, A, nc) sigmoided class scores
    pred_bboxes: jax.Array,    # (B, A, 4) xyxy (image units)
    anchor_points: jax.Array,  # (A, 2) xy (image units)
    gt_labels: jax.Array,      # (B, G) int
    gt_bboxes: jax.Array,      # (B, G, 4) xyxy (image units)
    mask_gt: jax.Array,        # (B, G) bool validity of padded GT rows
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
    eps: float = 1e-9,
) -> AssignResult:
    b, a, nc = pred_scores.shape
    g = gt_labels.shape[1]
    mask_gt_f = mask_gt.astype(jnp.float32)

    # 1. candidate anchors: center strictly inside the GT box
    lt = anchor_points[None, None, :, :] - gt_bboxes[:, :, None, :2]
    rb = gt_bboxes[:, :, None, 2:] - anchor_points[None, None, :, :]
    mask_in_gts = jnp.min(jnp.concatenate([lt, rb], -1), -1) > eps  # (B,G,A)

    # 2. alignment metric — scores and overlaps are computed (nonzero) ONLY
    # inside the candidate gate, exactly like ultralytics get_box_metrics
    # (bbox_scores[mask_gt] = ...; overlaps[mask_gt] = ...): the gated
    # overlaps feed BOTH the align metric and the step-4 collision argmax.
    gate = mask_in_gts & mask_gt[:, :, None]
    overlaps = jnp.clip(
        bbox_iou_aligned(gt_bboxes[:, :, None, :], pred_bboxes[:, None, :, :],
                         ciou=True), 0, None)                       # (B,G,A)
    overlaps = jnp.where(gate, overlaps, 0.0)
    labels = jnp.clip(gt_labels, 0, nc - 1)
    scores_for_gt = jnp.take_along_axis(
        pred_scores.transpose(0, 2, 1), labels[:, :, None], axis=1)  # (B,G,A)
    align = jnp.where(gate, scores_for_gt ** alpha * overlaps ** beta, 0.0)

    # 3. top-k per GT -> candidate mask. Ultralytics select_topk_candidates
    # keeps EVERY top-k pick of a valid GT row (topk_mask = mask_gt expanded
    # — zero-metric picks included; they are filtered by mask_in_gts below,
    # but an in-box anchor whose CIoU clamps to 0 still assigns), and zeroes
    # anchors counted more than once within a row.
    k = min(topk, a)
    _, topk_idx = jax.lax.top_k(align, k)                            # (B,G,k)
    topk_valid = jnp.broadcast_to(mask_gt_f[:, :, None], topk_idx.shape)

    def scatter_row(idx, val):
        return jnp.zeros((a,), jnp.float32).at[idx].add(val)

    mask_topk = jax.vmap(jax.vmap(scatter_row))(topk_idx, topk_valid)
    mask_topk = jnp.where(mask_topk > 1, 0.0, mask_topk)

    mask_pos = mask_topk * mask_in_gts.astype(jnp.float32) * mask_gt_f[:, :, None]

    # 4. resolve anchors claimed by multiple GTs: keep the max-overlap GT
    fg_counts = mask_pos.sum(axis=1)                                 # (B,A)
    max_overlap_gt = jnp.argmax(overlaps, axis=1)                    # (B,A)
    is_max = jax.nn.one_hot(max_overlap_gt, g, axis=1)               # (B,G,A)
    mask_pos = jnp.where((fg_counts > 1)[:, None, :], is_max, mask_pos)
    fg_mask = mask_pos.sum(axis=1) > 0                               # (B,A)
    target_gt_idx = jnp.argmax(mask_pos, axis=1).astype(jnp.int32)   # (B,A)

    # 5. gather targets
    target_labels = jnp.take_along_axis(labels, target_gt_idx, axis=1)
    target_bboxes = jnp.take_along_axis(
        gt_bboxes, target_gt_idx[:, :, None], axis=1)
    target_scores = jax.nn.one_hot(target_labels, nc) * fg_mask[:, :, None]

    # 6. normalize by per-GT best align metric and overlap
    align = align * mask_pos
    pos_align = jnp.max(align, axis=-1, keepdims=True)               # (B,G,1)
    pos_overlap = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
    norm = jnp.max(align * pos_overlap / (pos_align + eps), axis=1)  # (B,A)
    target_scores = target_scores * norm[:, :, None]

    return AssignResult(target_labels.astype(jnp.int32), target_bboxes,
                        target_scores, fg_mask, target_gt_idx)
