"""On-device letterbox + normalize preprocessing (fused into XLA).

The reference letterboxes on host via ultralytics LetterBox inside
BasePredictor.preprocess (SURVEY.md §3.3) and normalizes /255 on host threads.
Here the whole path — resize (aspect-preserving), pad (114 gray), /255,
dtype cast — is one jitted device function, per the north-star fusion goal
(BASELINE.json).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("new_hw", "scaleup", "out_dtype"))
def letterbox_batch(imgs: jax.Array, new_hw: Tuple[int, int] = (640, 640),
                    scaleup: bool = True, pad_value: float = 114.0,
                    out_dtype=jnp.float32) -> jax.Array:
    """Letterbox a uniform batch (B, H, W, C) uint8/float -> (B, nh, nw, C) in [0,1].

    All images in the batch share one source shape (BraTS slices are uniform),
    so the scale/pad geometry is static and the op jit-compiles once.
    out_dtype=bfloat16 halves the biggest HBM tensor on the inference path
    (8-bit/255 values carry ~8 significant bits — bf16-exact to 2^-9).
    """
    b, h, w, c = imgs.shape
    nh, nw = new_hw
    r = min(nh / h, nw / w)
    if not scaleup:
        r = min(r, 1.0)
    uh, uw = int(round(h * r)), int(round(w * r))
    x = imgs.astype(jnp.float32)
    if (uh, uw) != (h, w):
        x = jax.image.resize(x, (b, uh, uw, c), method="linear")
    top = int(round((nh - uh) / 2 - 0.1))
    left = int(round((nw - uw) / 2 - 0.1))
    # static jnp.pad (not full+dynamic_update_slice): the d_u_s pinned the
    # output layout and forced XLA to insert a full-tensor relayout copy
    # (420 MB at b128/640) between letterbox and the stem conv
    out = jnp.pad(x, ((0, 0), (top, nh - uh - top), (left, nw - uw - left),
                      (0, 0)), constant_values=pad_value)
    return (out / 255.0).astype(out_dtype)


@partial(jax.jit, static_argnames=("size",))
def resize_normalize(imgs: jax.Array, size: int) -> jax.Array:
    """Square stretch-resize + /255 (the decoder dataset path, dataset.py:63-70)."""
    b, h, w, c = imgs.shape
    x = imgs.astype(jnp.float32)
    if (h, w) != (size, size):
        x = jax.image.resize(x, (b, size, size, c), method="linear")
    return x / 255.0
