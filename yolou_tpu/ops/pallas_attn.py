"""Fused area-attention Pallas kernel.

The A2C2f area-attention bands are small (N = H*W/area tokens, e.g. 400-1600;
head_dim 32), so whole bands' attention fits in VMEM. XLA's default lowering
materializes the (G, N, N) score/softmax tensors to HBM; this kernel computes
scores -> softmax -> output for a block of GB bands per grid cell entirely
on-chip (batched MXU dots; single-band cells are DMA-latency-bound): one HBM
read of q/k/v, one write of o. Differentiable via custom VJP (XLA backward
with fp32 softmax recompute).

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
    q = q_ref[:]                      # (GB, N, hd)
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale        # (GB, N, N)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                # (GB, N, hd)
    o_ref[:] = o.astype(o_ref.dtype)


def _band_block(g: int, n: int, vmem_budget: int = 8 * 2 ** 20) -> int:
    """Bands per grid cell: amortize grid/DMA overhead, stay under a VMEM
    budget for the (GB, N, N) score tile."""
    gb = max(1, vmem_budget // max(n * n * 4, 1))
    gb = min(gb, 32, g)
    while g % gb:
        gb -= 1
    return max(gb, 1)


def _area_attention_fwd_impl(q, k, v, interpret):
    g, n, hd = q.shape
    scale = hd ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gb = _band_block(g, n)
    kern = functools.partial(_attn_kernel, scale=scale)
    block = pl.BlockSpec((gb, n, hd), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(g // gb,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((g, n, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _area_attention(q, k, v, interpret):
    return _area_attention_fwd_impl(q, k, v, interpret)


def _aa_fwd(q, k, v, interpret):
    return _area_attention_fwd_impl(q, k, v, interpret), (q, k, v)


def _aa_bwd(interpret, res, do):
    """Standard attention backward in XLA (fp32 softmax recompute) — the
    forward stays a Pallas kernel, training pays one extra recompute."""
    q, k, v = res
    hd = q.shape[-1]
    scale = hd ** -0.5
    s = jnp.einsum("gqd,gkd->gqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    do32 = do.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jnp.einsum("gqk,gqd->gkd", p, do32)
    dp = jnp.einsum("gqd,gkd->gqk", do32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("gqk,gkd->gqd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("gqk,gqd->gkd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_area_attention.defvjp(_aa_fwd, _aa_bwd)


@functools.partial(jax.jit, static_argnames=("interpret",))
def area_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   interpret: bool | None = None) -> jax.Array:
    """Softmax attention over fused (G, N, hd) bands; G = batch*area*heads.

    Equivalent to softmax(q k^T / sqrt(hd)) v per leading index. Bands are
    processed GB-at-a-time per grid cell (batched MXU dots) — single-band
    cells are DMA-latency-bound at these sizes. Differentiable via a custom
    VJP (XLA backward).
    """
    return _area_attention(q, k, v, interpret)


def area_attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Pure-XLA reference (same math) for parity tests and fallback."""
    hd = q.shape[-1]
    s = jnp.einsum("gqd,gkd->gqk", q, k,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("gqk,gkd->gqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
