"""Segmentation losses: soft Dice (MONAI-semantics) and Tversky.

Replaces the reference's MONAI DiceLoss configuration (train.py:98-104:
include_background=False, sigmoid=True, soft_label=True, batch=True,
reduction="mean") and the custom TverskyLoss
(custom_yolo_trainer/custom_v8_segmentation_loss.py:11-31).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def soft_dice_loss(logits: jax.Array, targets: jax.Array, *,
                   sigmoid: bool = True, batch: bool = True,
                   soft_label: bool = True, squared_pred: bool = False,
                   smooth_nr: float = 1e-5, smooth_dr: float = 1e-5) -> jax.Array:
    """Soft Dice loss over NHWC or NCHW-agnostic inputs (any shape, channel dim
    reduced with spatial dims).

    `batch=True` folds the batch dim into the reduction (MONAI batch=True:
    one global Dice instead of per-sample mean — the reference's stability
    choice). `soft_label=True` uses |min(p,g)| as the intersection (MONAI
    soft-label variant); with binary targets it equals p*g only at p<=g, and
    both variants are provided.
    """
    p = jax.nn.sigmoid(logits.astype(jnp.float32)) if sigmoid else logits.astype(jnp.float32)
    g = targets.astype(jnp.float32)
    axes = tuple(range(0 if batch else 1, p.ndim))
    if soft_label:
        inter = jnp.sum(jnp.minimum(p, g), axis=axes)
    else:
        inter = jnp.sum(p * g, axis=axes)
    if squared_pred:
        po, go = jnp.sum(p * p, axis=axes), jnp.sum(g * g, axis=axes)
    else:
        po, go = jnp.sum(p, axis=axes), jnp.sum(g, axis=axes)
    dice = (2.0 * inter + smooth_nr) / (po + go + smooth_dr)
    return jnp.mean(1.0 - dice)


def tversky_loss(logits: jax.Array, targets: jax.Array, *, alpha: float = 0.4,
                 beta: float = 0.6, smooth: float = 1.0,
                 apply_sigmoid: bool = True) -> jax.Array:
    """Global (flattened) Tversky loss, alpha weights FP, beta weights FN —
    exactly the reference's TverskyLoss forward."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32)) if apply_sigmoid else logits
    g = targets.astype(jnp.float32)
    tp = jnp.sum(p * g)
    fp = jnp.sum((1.0 - g) * p)
    fn = jnp.sum(g * (1.0 - p))
    t = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return 1.0 - t


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross-entropy with logits (no reduction)."""
    z = logits.astype(jnp.float32)
    g = targets.astype(jnp.float32)
    return jnp.maximum(z, 0) - z * g + jnp.log1p(jnp.exp(-jnp.abs(z)))
