"""Composite decoder losses: Focal, Hausdorff-DT, and the historical YOLOULoss.

The reference's deleted `loss.py` (surviving as bytecode, SURVEY.md §2.1
"Deleted YOLOU loss") combined MONAI DiceLoss(0.6) / TverskyLoss(0.4) /
HausdorffDTLoss / FocalLoss; the shipped training uses plain Dice
(train.py:98-104). This module provides the full family so the composite
configuration remains available.

HausdorffDTLoss follows Karimi & Salcudean (2019): (p - g)^2 weighted by
(edt(g)^alpha + edt(p)^alpha), with the distance transforms computed by the
exact separable EDT from metrics.seg and treated as constants (stop_gradient),
as in MONAI.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..metrics.seg import _edt_sq_2d
from .dice import soft_dice_loss, tversky_loss


def focal_loss(logits: jax.Array, targets: jax.Array, *, gamma: float = 2.0,
               alpha: float = 0.25) -> jax.Array:
    """Binary focal loss (mean-reduced), MONAI/torchvision convention."""
    z = logits.astype(jnp.float32)
    g = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(z)
    ce = jnp.maximum(z, 0) - z * g + jnp.log1p(jnp.exp(-jnp.abs(z)))
    p_t = p * g + (1 - p) * (1 - g)
    a_t = alpha * g + (1 - alpha) * (1 - g) if alpha >= 0 else 1.0
    return jnp.mean(a_t * ((1 - p_t) ** gamma) * ce)


def hausdorff_dt_loss(logits: jax.Array, targets: jax.Array, *,
                      alpha: float = 2.0, apply_sigmoid: bool = True) -> jax.Array:
    """Hausdorff distance-transform loss over (B, H, W, 1)/(B, H, W) masks."""
    p = (jax.nn.sigmoid(logits.astype(jnp.float32)) if apply_sigmoid
         else logits.astype(jnp.float32))
    g = targets.astype(jnp.float32)
    if p.ndim == 4:
        p = p[..., 0]
        g = g[..., 0]

    def one(pi, gi):
        pb = pi > 0.5
        gb = gi > 0.5
        dp = jnp.sqrt(jnp.clip(_edt_sq_2d(pb), 0, None))
        dg = jnp.sqrt(jnp.clip(_edt_sq_2d(gb), 0, None))
        # empty masks give INF distance fields; zero them out
        dp = jnp.where(jnp.any(pb), dp, 0.0)
        dg = jnp.where(jnp.any(gb), dg, 0.0)
        dist = dp ** alpha + dg ** alpha
        return jnp.mean((pi - gi) ** 2 * jax.lax.stop_gradient(dist))

    return jnp.mean(jax.vmap(one)(p, g))


def yolou_composite_loss(logits: jax.Array, targets: jax.Array, *,
                         dice_weight: float = 0.6, tversky_weight: float = 0.4,
                         hausdorff_weight: float = 0.0,
                         focal_weight: float = 0.0) -> jax.Array:
    """The historical YOLOULoss combination (defaults from the recovered
    constructor constants 0.6/0.4)."""
    total = 0.0
    if dice_weight:
        total = total + dice_weight * soft_dice_loss(logits, targets)
    if tversky_weight:
        total = total + tversky_weight * tversky_loss(logits, targets)
    if hausdorff_weight:
        total = total + hausdorff_weight * hausdorff_dt_loss(logits, targets)
    if focal_weight:
        total = total + focal_weight * focal_loss(logits, targets)
    return total
