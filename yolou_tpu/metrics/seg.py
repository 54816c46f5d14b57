"""Segmentation metrics on-device: Dice, pixel precision/recall, HD95.

MONAI-semantic equivalents of the reference's metric stack (train.py:106-119,
evaluate_model.py:49-63): DiceMetric(ignore_empty=False, reduction=mean_batch)
and HausdorffDistanceMetric(percentile=95, directed=False) with NaN-aware
aggregation (train.py:406-409).

HD95 uses an exact squared Euclidean distance transform built from two 1D
min-plus reductions (separable EDT) — fully vectorized, fixed-shape, no
data-dependent control flow; surface sets are boolean masks, percentiles are
computed by masked sort + linear interpolation (numpy-percentile semantics).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

_INF = 1e12


def dice_binary(pred: jax.Array, target: jax.Array,
                ignore_empty: bool = False) -> jax.Array:
    """Per-sample binary Dice. pred/target (B, ...) in {0,1}.

    ignore_empty=False: empty gt & empty pred -> 1.0; empty gt, nonempty pred
    -> 0.0 (MONAI compute_dice semantics as configured by the reference).
    ignore_empty=True: empty gt -> NaN.
    """
    axes = tuple(range(1, pred.ndim))
    p = pred.astype(jnp.float32)
    g = target.astype(jnp.float32)
    inter = jnp.sum(p * g, axis=axes)
    denom = jnp.sum(p, axis=axes) + jnp.sum(g, axis=axes)
    dice = jnp.where(denom > 0, 2.0 * inter / jnp.maximum(denom, 1e-12), 1.0)
    if ignore_empty:
        dice = jnp.where(jnp.sum(g, axis=axes) > 0, dice, jnp.nan)
    return dice


def precision_recall_counts(pred: jax.Array, target: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pixel TP/FP/FN sums (scalars) — evaluate_model.py:166-171 accumulation."""
    p = pred.astype(jnp.float32)
    g = target.astype(jnp.float32)
    tp = jnp.sum(p * g)
    fp = jnp.sum(p * (1 - g))
    fn = jnp.sum((1 - p) * g)
    return tp, fp, fn


def _edt_sq_2d(mask: jax.Array) -> jax.Array:
    """Exact squared EDT: distance from every pixel to the nearest True pixel.

    Separable min-plus: column pass then row pass. (H, W) bool -> (H, W) f32.
    Pixels get _INF when the mask is empty.
    """
    h, w = mask.shape
    g = jnp.where(mask, 0.0, _INF).astype(jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    dy2 = (y[:, None] - y[None, :]) ** 2            # (H, H')
    d1 = jnp.min(g[None, :, :] + dy2[:, :, None], axis=1)   # (H, W)
    x = jnp.arange(w, dtype=jnp.float32)
    dx2 = (x[:, None] - x[None, :]) ** 2            # (W, W')
    d2 = jnp.min(d1[:, None, :] + dx2.T[None, :, :], axis=2)
    return d2


def _surface(mask: jax.Array) -> jax.Array:
    """Boundary pixels: mask minus 4-connectivity erosion (scipy/MONAI edges)."""
    m = mask.astype(bool)
    pad = jnp.pad(m, 1, constant_values=False)
    er = (pad[1:-1, 1:-1] & pad[:-2, 1:-1] & pad[2:, 1:-1]
          & pad[1:-1, :-2] & pad[1:-1, 2:])
    return m & ~er


def _masked_percentile(values: jax.Array, mask: jax.Array, q: float) -> jax.Array:
    """Linear-interpolated percentile of values[mask] (numpy semantics).

    Fixed-shape: sorts with +inf padding and indexes by the dynamic count.
    Returns NaN when mask is empty.
    """
    v = jnp.where(mask, values, jnp.inf)
    v = jnp.sort(v.reshape(-1))
    n = jnp.sum(mask).astype(jnp.float32)
    pos = (q / 100.0) * (n - 1.0)
    lo = jnp.clip(jnp.floor(pos), 0, v.shape[0] - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, v.shape[0] - 1)
    frac = pos - lo.astype(jnp.float32)
    hi_val = jnp.where(n > lo + 1, v[hi], v[lo])
    out = v[lo] * (1 - frac) + hi_val * frac
    return jnp.where(n > 0, out, jnp.nan)


def hausdorff_distance_95(pred: jax.Array, target: jax.Array,
                          percentile: float = 95.0) -> jax.Array:
    """Symmetric HD-percentile for one (H, W) binary pair. NaN if either empty.

    max( perc_q(d(surf_pred -> surf_gt)), perc_q(d(surf_gt -> surf_pred)) )
    — MONAI HausdorffDistanceMetric(directed=False, percentile=95).
    """
    sp = _surface(pred > 0.5)
    sg = _surface(target > 0.5)
    d_to_gt = jnp.sqrt(jnp.clip(_edt_sq_2d(sg), 0, None))
    d_to_pr = jnp.sqrt(jnp.clip(_edt_sq_2d(sp), 0, None))
    fwd = _masked_percentile(d_to_gt, sp, percentile)
    bwd = jnp.where(jnp.any(sg), _masked_percentile(d_to_pr, sg, percentile), jnp.nan)
    out = jnp.maximum(fwd, bwd)
    empty = (~jnp.any(sp)) | (~jnp.any(sg))
    return jnp.where(empty, jnp.nan, out)


@partial(jax.jit, static_argnames=("percentile",))
def hd95_batch(pred: jax.Array, target: jax.Array, percentile: float = 95.0) -> jax.Array:
    """(B, H, W) binary masks -> (B,) HD95, NaN where undefined."""
    return jax.vmap(lambda p, t: hausdorff_distance_95(p, t, percentile))(pred, target)


def nanmean(values: jax.Array) -> jax.Array:
    """Mean over non-NaN entries (the reference's not-nans aggregation)."""
    ok = ~jnp.isnan(values)
    return jnp.sum(jnp.where(ok, values, 0.0)) / jnp.maximum(jnp.sum(ok), 1)
