"""Fused area-attention Pallas kernel.

The A2C2f area-attention bands are small (N = H*W/area tokens, e.g. 400-1600;
head_dim 32), so an entire band's attention fits in VMEM. XLA's default
lowering materializes the (G, N, N) score/softmax tensors to HBM; this kernel
computes scores -> softmax -> output per (band, head) grid cell entirely
on-chip: one HBM read of q/k/v, one write of o.

Falls back to interpreter mode off-TPU so tests on the CPU mesh exercise the
same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guard
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                      # (N, hd)
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale        # (N, N)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(p.astype(v.dtype), v,
                preferred_element_type=jnp.float32)        # (N, hd)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def area_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """Softmax attention over fused (G, N, hd) bands; G = batch*area*heads.

    Equivalent to softmax(q k^T / sqrt(hd)) v per leading index, computed
    band-at-a-time in VMEM.
    """
    g, n, hd = q.shape
    scale = hd ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(_attn_kernel, scale=scale)
    block = pl.BlockSpec((1, n, hd), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(g,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((g, n, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)


def area_attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Pure-XLA reference (same math) for parity tests and fallback."""
    hd = q.shape[-1]
    s = jnp.einsum("gqd,gkd->gqk", q, k,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("gqk,gkd->gqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
