"""Mask ops: proto decode, crop, scale — JAX equivalents of the ultralytics
`ops.process_mask*` family used by the segmentation predictor
(/root/reference/custom_yolo_predictor/custom_detseg_predictor.py:288-313).

All ops are fixed-shape: instance dimension is padded (valid-masked by caller).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def crop_mask(masks: jax.Array, boxes: jax.Array) -> jax.Array:
    """Zero mask pixels outside each box. masks (N,H,W), boxes (N,4) xyxy in mask px."""
    n, h, w = masks.shape
    r = jnp.arange(w, dtype=boxes.dtype)[None, None, :]
    c = jnp.arange(h, dtype=boxes.dtype)[None, :, None]
    x1, y1, x2, y2 = (boxes[:, i][:, None, None] for i in range(4))
    keep = (r >= x1) & (r < x2) & (c >= y1) & (c < y2)
    return masks * keep.astype(masks.dtype)


def proto_decode(coefs: jax.Array, protos: jax.Array) -> jax.Array:
    """Mask logits from coefficients: (N, nm) @ (Hm, Wm, nm) -> (N, Hm, Wm).

    The proto einsum of single_mask_loss (custom_v8_segmentation_loss.py:145),
    MXU-friendly (one matmul over the flattened spatial axis).
    """
    hm, wm, nm = protos.shape
    flat = protos.reshape(-1, nm)
    out = jnp.einsum("nc,pc->np", coefs, flat, preferred_element_type=jnp.float32)
    return out.reshape(-1, hm, wm)


def process_mask(protos: jax.Array, coefs: jax.Array, boxes: jax.Array,
                 img_hw: Tuple[int, int], upsample: bool = True,
                 threshold: float = 0.5) -> jax.Array:
    """Instance masks from protos/coefs/boxes for one image.

    protos (Hm,Wm,nm), coefs (N,nm), boxes (N,4) xyxy in input-image pixels.
    Sigmoid -> crop at proto resolution -> (optional) bilinear upsample to
    img_hw -> binary threshold. Matches ultralytics `ops.process_mask(...,
    upsample=True)` as invoked by the predictor.
    """
    hm, wm, _ = protos.shape
    ih, iw = img_hw
    logits = proto_decode(coefs, protos)
    m = jax.nn.sigmoid(logits)
    scale = jnp.array([wm / iw, hm / ih, wm / iw, hm / ih], dtype=boxes.dtype)
    m = crop_mask(m, boxes * scale)
    if upsample:
        m = jax.image.resize(m, (m.shape[0], ih, iw), method="linear")
    return (m > threshold).astype(jnp.float32)


def process_mask_native(protos: jax.Array, coefs: jax.Array, boxes: jax.Array,
                        orig_hw: Tuple[int, int], input_hw: Tuple[int, int],
                        threshold: float = 0.5) -> jax.Array:
    """Retina-mask path: upsample protos to the letterboxed input, strip padding
    by cropping semantics, resize to original shape, then crop by boxes
    (boxes already scaled to orig coords). Fixed-shape approximation of
    ultralytics process_mask_native for same-aspect inputs."""
    hm, wm, _ = protos.shape
    oh, ow = orig_hw
    logits = proto_decode(coefs, protos)
    m = jax.nn.sigmoid(logits)
    gain = min(input_hw[0] / oh, input_hw[1] / ow)
    pad_h = (input_hw[0] - oh * gain) / 2
    pad_w = (input_hw[1] - ow * gain) / 2
    # proto-resolution pad offsets
    ph = pad_h * hm / input_hw[0]
    pw = pad_w * wm / input_hw[1]
    top, left = int(round(ph)), int(round(pw))
    bottom, right = hm - top, wm - left
    m = m[:, top:bottom, left:right]
    m = jax.image.resize(m, (m.shape[0], oh, ow), method="linear")
    m = crop_mask(m, boxes)
    return (m > threshold).astype(jnp.float32)


def scale_masks(masks: jax.Array, to_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear-resize (N,H,W) masks to to_hw (half-pixel centers)."""
    return jax.image.resize(masks, (masks.shape[0], to_hw[0], to_hw[1]),
                            method="linear")
