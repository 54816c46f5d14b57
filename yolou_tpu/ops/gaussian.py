"""Vectorized Gaussian heatmap splatting (no per-box Python loop).

Equivalent of add_gaussian_heatmap_to_canvas + generate_heatmaps_from_bbox
(/root/reference/generate_heatmaps.py:23-81): per predicted box, a Gaussian
with sigma = 0.15 * max(w, h) scaled by box confidence is summed onto the
canvas. Here it's one vmap over the padded detection set.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("size",))
def splat_heatmaps(boxes_xywh: jax.Array, conf: jax.Array, valid: jax.Array,
                   size: int = 160) -> jax.Array:
    """boxes (B, K, 4) xywh px (centers already in canvas coords, as the
    reference int()-truncates), conf (B, K), valid (B, K) -> (B, size, size)."""
    ys, xs = jnp.meshgrid(jnp.arange(size, dtype=jnp.float32),
                          jnp.arange(size, dtype=jnp.float32), indexing="ij")

    def one_box(box, c, v):
        cx = jnp.floor(box[0])
        cy = jnp.floor(box[1])
        sigma = 0.15 * jnp.maximum(jnp.floor(box[2]), jnp.floor(box[3]))
        sigma = jnp.maximum(sigma, 1e-6)
        g = jnp.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma ** 2)) * c
        return g * v

    def one_image(boxes, confs, valids):
        return jnp.sum(jax.vmap(one_box)(boxes, confs,
                                         valids.astype(jnp.float32)), axis=0)

    return jax.vmap(one_image)(boxes_xywh, conf, valid)
