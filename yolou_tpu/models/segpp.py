"""YOLOSegPlusPlus: frozen-YOLO-encoder U-Net decoder with logits bottleneck.

TPU-native redesign of /root/reference/YOLOSegPlusPlus.py:90-272. Differences
from the torch original (by design, documented per SURVEY.md §2.4):

  * **Fused forward** — the backbone runs ONCE; skips (layers 2 and 4) come
    from executor taps and the 20x20 class-logit map comes from the same
    pass's P3 raw head output, fixing the reference's double backbone compute
    (evaluate_model.py:141 + 156; SURVEY.md §3.2 note).
  * **Ablation is a flag** (`use_logits=False`), not a file fork
    (_YOLOSegPlusPlus.py).
  * Encoder freezing = `lax.stop_gradient` on tapped features + yolo submodule
    always applied with `train=False` (running BN stats, like `.eval()` at
    YOLOSegPlusPlus.py:153).

Decoder topology (YOLOSegPlusPlus.py:156-178): at /8 scale concat
[128-ch skip, 1-ch logits] -> C3Ghost(->96)+ECA; bilinear x2 ->
DoubleLightConv(->64); concat 64-ch skip -> C3Ghost(->64)+ECA; x2 ->
DLC(->32); x2 -> DLC(->16); 1x1 conv -> 1 logit channel at full resolution.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import C3Ghost, DoubleLightConv, ECA, upsample_bilinear_torch
from .yolo import ModelSpec, YOLOModel, YoloOutputs

Dtype = Any

SKIP_TAPS: Tuple[int, int] = (2, 4)   # encoder skip indices (YOLOSegPlusPlus.py:185-188)
ENCODER_LAYERS = 5                    # encoder = backbone[0:5]


class SegPPDecoder(nn.Module):
    """The trainable U-decoder head (~64K params)."""

    use_logits: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, skip2: jax.Array, skip4: jax.Array,
                 logits: Optional[jax.Array], train: bool = False) -> jax.Array:
        if self.use_logits:
            assert logits is not None
            x = jnp.concatenate([skip4, logits.astype(skip4.dtype)], axis=-1)
        else:
            x = skip4
        x = C3Ghost(96, 1, dtype=self.dtype, name="mix0")(x, train)
        x = ECA(dtype=self.dtype, name="eca0")(x, train)
        x = upsample_bilinear_torch(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = DoubleLightConv(64, dtype=self.dtype, name="up1")(x, train)
        x = jnp.concatenate([x, skip2], axis=-1)
        x = C3Ghost(64, 1, dtype=self.dtype, name="mix2")(x, train)
        x = ECA(dtype=self.dtype, name="eca2")(x, train)
        x = upsample_bilinear_torch(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = DoubleLightConv(32, dtype=self.dtype, name="up3")(x, train)
        x = upsample_bilinear_torch(x, (x.shape[1] * 2, x.shape[2] * 2))
        x = DoubleLightConv(16, dtype=self.dtype, name="up4")(x, train)
        out = nn.Conv(1, (1, 1), use_bias=True, dtype=self.dtype,
                      param_dtype=jnp.float32, name="output")(x)
        return out.astype(jnp.float32)


class YOLOSegPP(nn.Module):
    """Full model: YOLO graph (frozen) + SegPP decoder (trainable).

    Call modes:
      * `logits` given  -> encoder-slice only (decoder training with
        precomputed objectmaps, the reference train.py path),
      * `logits=None`   -> fused full pass: detector preds AND decoder mask
        from one backbone execution (the evaluate_model.py path, minus the
        double compute).
    """

    spec: ModelSpec
    use_logits: bool = True
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, logits: Optional[jax.Array] = None,
                 train: bool = False) -> Tuple[jax.Array, YoloOutputs]:
        yolo = YOLOModel(self.spec, dtype=self.dtype,
                         use_pallas=self.use_pallas, name="yolo")
        full = logits is None
        out = yolo(x, train=False, taps=SKIP_TAPS,
                   stop_at=None if full else ENCODER_LAYERS)
        s2 = jax.lax.stop_gradient(out.taps[SKIP_TAPS[0]])
        s4 = jax.lax.stop_gradient(out.taps[SKIP_TAPS[1]])
        if full and self.use_logits:
            # sigmoid of the P3 raw map's last (class-logit) channel —
            # evaluate_model.py:142-144 conditioning (no z-score; quirk §2.4.2).
            logit_map = jax.lax.stop_gradient(out.raw[0][..., -1:])
            logits = jax.nn.sigmoid(logit_map.astype(jnp.float32))
        mask_logits = SegPPDecoder(self.use_logits, dtype=self.dtype,
                                   name="decoder")(s2, s4, logits, train)
        return mask_logits, out


def decoder_param_filter(path: Tuple[str, ...], _=None) -> bool:
    """True for trainable (decoder) params — the optax mask / param-split rule
    mirroring the reference's `not name.startswith("encoder.")` (train.py:256)."""
    return path[0] != "yolo"
