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


def pallas_band_eligible(n_band: int, c: int, heads: int) -> bool:
    """Static shape gate for the fused band kernels.

    Mosaic lowers the in-kernel (gb, n, c) -> (gb*heads, n, c) collapse as a
    vector shape cast that requires sublane-aligned n: at n=25 (a 160-input
    backbone's 5x5 level) it fails with "infer-vector-layout: unsupported
    shape cast". 16 is the bf16 sublane pack; n % 16 == 0 covers every shape
    the kernels were measured on (n=400/1600). Callers fall back to the XLA
    reference composition when this is False.
    """
    return n_band % 16 == 0 and c % heads == 0


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


# ---------------------------------------------------------------------------
# Fused multi-head band kernel (full-MXU formulation)
# ---------------------------------------------------------------------------
#
# The banded kernel above contracts over hd=32, capping MXU K-utilization at
# 32/128 = 25% (measured ~14 TFLOP/s on v5e). This kernel keeps all heads of
# a band together as (N, C=heads*hd) and computes per-head scores as
#     S_h = (q * mask_h) @ k^T         (contraction over all C channels)
# where mask_h zeroes every channel outside head h — EXACT per-head scores
# (cross-head channels contribute 0) at full K=C=128 MXU utilization. The
# output dot uses the same trick on v and sums the disjoint per-head partials.
# heads x more FLOPs at ~heads x better utilization, and big-K matmuls
# schedule far better than 8-deep batched K=32 dots: measured ~3x faster.


def _fused_kernel(q_ref, k_ref, v_ref, o_ref, *, heads: int, scale: float):
    q = q_ref[:]                        # (GB, N, C) head-major channels
    k = k_ref[:]
    v = v_ref[:]
    gb, n, c = q.shape
    hd = c // heads
    ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, c), 2) // hd
    hh = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, c), 0)
    mask = (ch == hh).astype(q.dtype)   # (heads, 1, C)

    # Mosaic's tpu.matmul supports one batch dim: flatten (GB, heads)
    qm = (q[:, None] * mask[None]).reshape(gb * heads, n, c)
    km = jnp.broadcast_to(k[:, None],
                          (gb, heads, n, c)).reshape(gb * heads, n, c)
    s = jax.lax.dot_general(
        qm, km, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale         # (GB*H, N, N)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    denom = jnp.sum(e, axis=-1, keepdims=True)              # (GB*H, N, 1)
    p = e.astype(v.dtype)
    vm = (v[:, None] * mask[None]).reshape(gb * heads, n, c)
    o_part = jax.lax.dot_general(
        p, vm, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (GB*H, N, C)
    # normalize after the dot (C-wide divide beats an N-wide one), then the
    # disjoint per-head column blocks sum into the concatenated output
    o = jnp.sum((o_part / denom).reshape(gb, heads, n, c), axis=1)
    o_ref[:] = o.astype(o_ref.dtype)


def _fused_band_block(g: int, n: int, c: int, heads: int,
                      vmem_budget: int = 14 * 2 ** 20) -> int:
    """Empirically on v5e at the backbone shapes, gb=2 wins: (512,400,64)h2
    1.02ms vs 1.21 gb1 / 1.16 gb4; (128,400,128)h4 0.384 vs 0.490 gb1
    (gb>=4 OOMs the 16MB scoped VMEM). Larger gb eats the double-buffering
    headroom, so prefer 2 whenever the score/exp tiles fit the budget."""
    per_band = heads * n * n * 6 + 2 * heads * n * c * 4    # s+e fp32, partials
    if g % 2 == 0 and 2 * per_band <= vmem_budget:
        return 2
    return 1


def _fused_fwd_impl(q, k, v, heads, interpret):
    g, n, c = q.shape
    scale = (c // heads) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gb = _fused_band_block(g, n, c, heads)
    kern = functools.partial(_fused_kernel, heads=heads, scale=scale)
    block = pl.BlockSpec((gb, n, c), lambda i: (i, 0, 0))
    return pl.pallas_call(
        kern,
        grid=(g // gb,),
        in_specs=[block, block, block],
        out_specs=block,
        out_shape=jax.ShapeDtypeStruct((g, n, c), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _area_attention_fused(q, k, v, heads, interpret):
    return _fused_fwd_impl(q, k, v, heads, interpret)


def _aaf_fwd(q, k, v, heads, interpret):
    return _fused_fwd_impl(q, k, v, heads, interpret), (q, k, v)


def _aaf_bwd(heads, interpret, res, do):
    """XLA backward on the head-reshaped views (fp32 softmax recompute)."""
    q, k, v = res
    g, n, c = q.shape
    hd = c // heads
    rs = lambda t: t.reshape(g, n, heads, hd)
    qh, kh, vh, doh = rs(q), rs(k), rs(v), rs(do)
    scale = hd ** -0.5
    s = jnp.einsum("gqhd,gkhd->ghqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    do32 = doh.astype(jnp.float32)
    v32 = vh.astype(jnp.float32)
    dv = jnp.einsum("ghqk,gqhd->gkhd", p, do32)
    dp = jnp.einsum("gqhd,gkhd->ghqk", do32, v32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("ghqk,gkhd->gqhd", ds, kh.astype(jnp.float32)) * scale
    dk = jnp.einsum("ghqk,gqhd->gkhd", ds, qh.astype(jnp.float32)) * scale
    back = lambda t, ref: t.reshape(g, n, c).astype(ref.dtype)
    return back(dq, q), back(dk, k), back(dv, v)


_area_attention_fused.defvjp(_aaf_fwd, _aaf_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def area_attention_fused(q: jax.Array, k: jax.Array, v: jax.Array,
                         heads: int,
                         interpret: bool | None = None) -> jax.Array:
    """Multi-head softmax attention over (G, N, C) bands, C = heads*hd with
    head-major channel layout (channel = h*hd + d). Equivalent per head to
    softmax(q_h k_h^T / sqrt(hd)) v_h, outputs concatenated back to C.

    No per-head HBM reshape/transpose is needed around this op — the band
    tensors flow straight from the qkv projection (role-major thirds) into
    the kernel and out to the proj conv.
    """
    return _area_attention_fused(q, k, v, heads, interpret)


# ---------------------------------------------------------------------------
# Mega-kernel: folded qkv GEMM + multi-head band attention in one pass
# ---------------------------------------------------------------------------
#
# At inference the qkv 1x1 conv + BN fold into one affine (C, 3C) GEMM whose
# output feeds straight into the band attention. Keeping that GEMM inside the
# kernel means q/k/v never round-trip HBM (the (B,H,W,3C) qkv tensor is 3x
# the input): one read of x, one write of o and of v (v exits for the dw7x7
# positional conv, which needs cross-band spatial context). Saves ~60% of
# the attention stage's HBM traffic at b128/640 layer 6.


def _qkv_attn_kernel(x_ref, w_ref, b_ref, o_ref, v_ref, *, heads: int,
                     scale: float):
    x = x_ref[:]                        # (GB, N, C)
    w = w_ref[:]                        # (C, 3C) folded conv*BN
    b = b_ref[:]                        # (1, 3C)
    gb, n, c = x.shape
    qkv = jax.lax.dot_general(
        x, w, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b[None]
    qkv = qkv.astype(x.dtype)           # (GB, N, 3C) role-major thirds
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    v_ref[:] = v

    hd = c // heads
    ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, c), 2) // hd
    hh = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, c), 0)
    mask = (ch == hh).astype(q.dtype)   # (heads, 1, C)
    qm = (q[:, None] * mask[None]).reshape(gb * heads, n, c)
    km = jnp.broadcast_to(k[:, None],
                          (gb, heads, n, c)).reshape(gb * heads, n, c)
    s = jax.lax.dot_general(
        qm, km, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e.astype(v.dtype)
    vm = (v[:, None] * mask[None]).reshape(gb * heads, n, c)
    o_part = jax.lax.dot_general(
        p, vm, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o = jnp.sum((o_part / denom).reshape(gb, heads, n, c), axis=1)
    o_ref[:] = o.astype(o_ref.dtype)


def _qkv_attn_reference(x, w, b, heads):
    qkv = jax.lax.dot_general(
        x, w, (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b[0][None, None]
    qkv = qkv.astype(x.dtype)
    c = x.shape[-1]
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    return area_attention_fused_reference(q, k, v, heads), v


def _qkv_fused_fwd_impl(x, w, b, heads, interpret):
    g, n, c = x.shape
    scale = (c // heads) ** -0.5
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gb = _fused_band_block(g, n, c, heads)
    kern = functools.partial(_qkv_attn_kernel, heads=heads, scale=scale)
    block = pl.BlockSpec((gb, n, c), lambda i: (i, 0, 0))
    wspec = pl.BlockSpec((c, 3 * c), lambda i: (0, 0))
    bspec = pl.BlockSpec((1, 3 * c), lambda i: (0, 0))
    return pl.pallas_call(
        kern,
        grid=(g // gb,),
        in_specs=[block, wspec, bspec],
        out_specs=(block, block),
        out_shape=(jax.ShapeDtypeStruct((g, n, c), x.dtype),
                   jax.ShapeDtypeStruct((g, n, c), x.dtype)),
        interpret=interpret,
    )(x, w, b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _area_attention_qkv(x, w, b, heads, interpret):
    return _qkv_fused_fwd_impl(x, w, b, heads, interpret)


def _aaq_fwd(x, w, b, heads, interpret):
    return _qkv_fused_fwd_impl(x, w, b, heads, interpret), (x, w, b)


def _aaq_bwd(heads, interpret, res, cots):
    """XLA backward via the reference composition (eval-path kernel; training
    uses the unfolded ConvBNAct + area_attention_fused path instead)."""
    x, w, b = res
    _, vjp = jax.vjp(lambda x, w, b: _qkv_attn_reference(x, w, b, heads),
                     x, w, b)
    return vjp(cots)


_area_attention_qkv.defvjp(_aaq_fwd, _aaq_bwd)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def area_attention_qkv_fused(x: jax.Array, w: jax.Array, b: jax.Array,
                             heads: int,
                             interpret: bool | None = None):
    """Fused (folded qkv affine) + multi-head band attention.

    x: (G, N, C) band tokens; w: (C, 3C) folded conv*BN weight with
    role-major output thirds; b: (1, 3C) folded bias. Returns (o, v), both
    (G, N, C) — o is the attention output, v exits for the positional dw7x7.
    """
    return _area_attention_qkv(x, w, b, heads, interpret)


def area_attention_fused_reference(q, k, v, heads: int) -> jax.Array:
    """Pure-XLA reference for the fused kernel (same math, head reshape)."""
    g, n, c = q.shape
    hd = c // heads
    rs = lambda t: t.reshape(g, n, heads, hd)
    qh, kh, vh = rs(q), rs(k), rs(v)
    s = jnp.einsum("gqhd,gkhd->ghqk", qh, kh,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("ghqk,gkhd->gqhd", p, vh,
                   preferred_element_type=jnp.float32)
    return o.reshape(g, n, c).astype(q.dtype)


def area_attention_reference(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Pure-XLA reference (same math) for parity tests and fallback."""
    hd = q.shape[-1]
    s = jnp.einsum("gqd,gkd->gqk", q, k,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("gqk,gkd->gqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)
