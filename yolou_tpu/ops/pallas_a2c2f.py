"""Whole-A2C2f Pallas mega-kernel (inference path).

The attention stages of YOLOv12's A2C2f (reference backbone rows
/root/reference/YOLOSegPlusPlus.py:133-135) are a chain of token-GEMMs,
banded softmax attention, a depthwise-7x7 positional conv, and residual
MLPs — per image everything (activations + every folded weight) fits in
VMEM. Running the block staged costs ~8.3 ms at b128/640 layer 6 on v5e;
measured bisection (tools/attn_kernel_bisect.py) shows ~0.55 ms of HBM
layout-transition overhead PER attention-kernel invocation in the NHWC conv
chain plus ~0.4 ms/ABlock of XLA plumbing. This kernel reads the block's
input once, runs cv1 -> n stages of (2x ABlock) -> cv2 entirely on-chip,
and writes the output once: HBM traffic drops from ~18 reads/writes of the
feature map to one read + one write.

Math is EXACTLY the staged eval path (BN running-stats folded into affine
GEMMs, fp32 accumulation, stable softmax, SiLU in fp32):

    y0 = silu(x @ Wcv1 + b)
    for each ABlock:  t = t + proj(attn(qkv(t)) + dw7x7(v));  t = t + mlp(t)
    out = silu(concat(y0, z1, .., zn) @ Wcv2 + b)

Attention uses the head-mask trick (see ops/pallas_attn.py): per-head scores
computed as full-K masked dots — exact, at K=C MXU density instead of
K=head_dim. The dw7x7 positional conv runs in-kernel: 7 sublane-shifted
column views (one relayout each), then 49 free outer-dim row slices
multiply-accumulated in fp32 on the VPU.

Residual A2C2f (gamma skip) is not supported here — the v12 table never
enables it (the wiring always passes residual=False).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def a2c2f_mega_eligible(H: int, W: int, cin: int, c_: int, area: int,
                        heads: int) -> bool:
    """Static gate for routing A2C2f eval through the mega-kernel.

    Requirements (all measured on v5e, tools/a2c2f_probe.py):
      * sublane-aligned band length (nb % 16, same Mosaic constraint as
        ops/pallas_attn.py::pallas_band_eligible),
      * 640-class shapes only: the win comes from eliding ~1 ms/ABlock of
        HBM layout transitions + XLA plumbing, which only exist at L6/L8
        backbone sizes (N=1600/400); small-graph shapes keep the staged path,
      * the per-image working set must fit scoped VMEM — the measured-good
        envelope is N*c_ <= 1600*64 with cin <= 512 (L6 40x40x256/c64 and
        L8 20x20x512/c128 both fit; anything larger is unproven).
    """
    n = H * W
    if n % area:
        area = 1
    nb = n // area
    return (nb % 16 == 0 and c_ % heads == 0 and n >= 400
            and n * c_ <= 1600 * 64 and cin <= 512)


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _gemm(t, w, b):
    """Token GEMM with fp32 accumulation + folded-BN bias (fp32)."""
    o = jax.lax.dot_general(t, w, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o + b[None]


def _band_attention(q, k, v, heads: int, chunk: int):
    """Banded multi-head attention over (area, nb, c) with the head-mask
    trick, processed `chunk` bands at a time to bound the fp32 score tile."""
    area, nb, c = q.shape
    hd = c // heads
    scale = hd ** -0.5
    ch = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, c), 2) // hd
    hh = jax.lax.broadcasted_iota(jnp.int32, (heads, 1, c), 0)
    mask = (ch == hh).astype(q.dtype)   # (heads, 1, c)

    outs = []
    for b0 in range(0, area, chunk):
        qc = q[b0:b0 + chunk]           # (chunk, nb, c)
        kc = k[b0:b0 + chunk]
        vc = v[b0:b0 + chunk]
        qm = (qc[:, None] * mask[None]).reshape(chunk * heads, nb, c)
        km = jnp.broadcast_to(kc[:, None], (chunk, heads, nb, c)
                              ).reshape(chunk * heads, nb, c)
        s = jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        p = e.astype(vc.dtype)
        vm = (vc[:, None] * mask[None]).reshape(chunk * heads, nb, c)
        o_part = jax.lax.dot_general(
            p, vm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        outs.append(jnp.sum((o_part / denom).reshape(chunk, heads, nb, c),
                            axis=1))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _dw7x7(v, w, b, H: int, W: int):
    """Depthwise 7x7 'pe' conv on (N, c) tokens viewed as (H, W, c), padding
    SAME, BN folded into (w: (7,7,c) fp32, b: (c,) fp32). Returns (N, c) fp32.

    W-axis (sublane) shifts are materialized once per dj (7 relayouts);
    H-axis shifts are outer-dim slices (free). Per-dj accumulators beat one
    long chain by ~17% (tools/pe_kernel_probe.py: 1.95 vs 2.35 ms)."""
    n, c = v.shape
    img = v.reshape(H, W, c)
    zH = jnp.zeros((3, W, c), img.dtype)
    zW = jnp.zeros((H + 6, 3, c), img.dtype)
    vp = jnp.concatenate([zH, img, zH], axis=0)          # (H+6, W, c)
    vp = jnp.concatenate([zW, vp, zW], axis=1)           # (H+6, W+6, c)
    accs = []
    for dj in range(7):
        col = vp[:, dj:dj + W, :]                        # (H+6, W, c)
        a = None
        for di in range(7):
            term = col[di:di + H].astype(jnp.float32) * w[di, dj][None, None]
            a = term if a is None else a + term
        accs.append(a)
    acc = functools.reduce(lambda x, y: x + y, accs)
    return (acc + b[None, None]).reshape(n, c)


def _a2c2f_kernel(x_ref, *refs, H: int, W: int, cin: int, c_: int, c2: int,
                  n_stages: int, area: int, heads: int, chunk: int,
                  ablate: str = ""):
    out_ref = refs[-1]
    wr = [r[:] for r in refs[:-1]]
    N = H * W
    nb = N // area

    def pop2():
        nonlocal wr
        w, b = wr[0], wr[1]
        wr = wr[2:]
        return w, b

    x = x_ref[:].reshape(N, cin)
    wcv1, bcv1 = pop2()
    dt = x.dtype
    y = _silu(_gemm(x, wcv1, bcv1)).astype(dt)
    ys = [y]
    t = y
    for _ in range(n_stages):
        for _ in range(2):   # 2 ABlocks per attention stage
            wqkv, bqkv = pop2()
            wpe, bpe = pop2()
            wproj, bproj = pop2()
            wm1, bm1 = pop2()
            wm2, bm2 = pop2()
            qkv = _gemm(t, wqkv, bqkv).astype(dt)        # (N, 3c) role-major
            q = qkv[:, :c_].reshape(area, nb, c_)
            k = qkv[:, c_:2 * c_].reshape(area, nb, c_)
            v = qkv[:, 2 * c_:]
            if "early" in ablate:
                # issue the VPU-bound pe BEFORE the MXU attention dots —
                # probes whether Mosaic's scheduler overlaps the two units
                pe = _dw7x7(v, wpe, bpe, H, W)
                o = _band_attention(q, k, v.reshape(area, nb, c_), heads,
                                    chunk).reshape(N, c_)
            else:
                if "attn" in ablate:
                    o = qkv[:, :c_]
                else:
                    o = _band_attention(q, k, v.reshape(area, nb, c_), heads,
                                        chunk)
                    o = o.reshape(N, c_)
                if "pe" in ablate:
                    pe = v.astype(jnp.float32)
                else:
                    pe = _dw7x7(v, wpe, bpe, H, W)
            t = (t.astype(jnp.float32)
                 + _gemm((o + pe).astype(dt), wproj, bproj)).astype(dt)
            h = _silu(_gemm(t, wm1, bm1)).astype(dt)
            t = (t.astype(jnp.float32) + _gemm(h, wm2, bm2)).astype(dt)
        ys.append(t)
    wcv2, bcv2 = pop2()
    cat = jnp.concatenate(ys, axis=-1)
    out = _silu(_gemm(cat, wcv2, bcv2)).astype(out_ref.dtype)
    out_ref[:] = out.reshape(1, H, W, c2)


def a2c2f_fused(x: jax.Array, weights, n_stages: int, area: int, heads: int,
                interpret: bool | None = None, ablate: str = "") -> jax.Array:
    """Run a full A2C2f attention block as one Pallas kernel, one image per
    grid cell.

    x: (B, H, W, cin) NHWC. weights: flat list
    [cv1_w, cv1_b] + per-ABlock [qkv_w, qkv_b, pe_w(7,7,c), pe_b, proj_w,
    proj_b, mlp1_w, mlp1_b, mlp2_w, mlp2_b] * (2*n_stages) + [cv2_w, cv2_b];
    GEMM weights are (cin_i, cout_i) matrices in x.dtype, biases and the pe
    kernel fp32. Returns (B, H, W, c2).
    """
    B, H, W, cin = x.shape
    c_ = weights[0].shape[1]
    c2 = weights[-2].shape[1]
    N = H * W
    nb = N // area
    # score-tile budget: chunk*heads*nb*nb fp32 (s) x ~2 live copies <= ~6 MB
    chunk = max(1, min(area, (6 * 2 ** 20) // max(heads * nb * nb * 8, 1)))
    while area % chunk:
        chunk -= 1
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    kern = functools.partial(
        _a2c2f_kernel, H=H, W=W, cin=cin, c_=c_, c2=c2, n_stages=n_stages,
        area=area, heads=heads, chunk=chunk, ablate=ablate)
    xspec = pl.BlockSpec((1, H, W, cin), lambda i: (i, 0, 0, 0))
    wspecs = [pl.BlockSpec(w.shape, lambda i, nd=w.ndim: (0,) * nd)
              for w in weights]
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[xspec] + wspecs,
        out_specs=pl.BlockSpec((1, H, W, c2), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, c2), x.dtype),
        interpret=interpret,
    )(x, *weights)


def a2c2f_reference(x, weights, n_stages: int, area: int, heads: int):
    """Pure-XLA composition of the same folded math (parity tests)."""
    B, H, W, cin = x.shape
    c_ = weights[0].shape[1]
    N = H * W
    nb = N // area
    dt = x.dtype
    wr = list(weights)

    def pop2():
        nonlocal wr
        w, b = wr[0], wr[1]
        wr = wr[2:]
        return w, b

    gemm = lambda t, w, b: (jnp.einsum("bnc,cd->bnd", t, w,
                                       preferred_element_type=jnp.float32)
                            + b[None, None])
    x = x.reshape(B, N, cin)
    wcv1, bcv1 = pop2()
    y = _silu(gemm(x, wcv1, bcv1)).astype(dt)
    ys = [y]
    t = y
    hd = c_ // heads
    for _ in range(n_stages):
        for _ in range(2):
            wqkv, bqkv = pop2()
            wpe, bpe = pop2()
            wproj, bproj = pop2()
            wm1, bm1 = pop2()
            wm2, bm2 = pop2()
            qkv = gemm(t, wqkv, bqkv).astype(dt)
            q, k, v = (qkv[..., :c_], qkv[..., c_:2 * c_], qkv[..., 2 * c_:])
            rs = lambda a: a.reshape(B * area, nb, heads, hd)
            s = jnp.einsum("gqhd,gkhd->ghqk", rs(q), rs(k),
                           preferred_element_type=jnp.float32) * hd ** -0.5
            p = jax.nn.softmax(s, axis=-1).astype(dt)
            o = jnp.einsum("ghqk,gkhd->gqhd", p, rs(v),
                           preferred_element_type=jnp.float32)
            o = o.reshape(B, N, c_)
            vi = v.reshape(B, H, W, c_)
            pe = jax.lax.conv_general_dilated(
                vi.astype(jnp.float32), wpe.reshape(7, 7, 1, c_),
                (1, 1), ((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=c_) + bpe
            pe = pe.reshape(B, N, c_)
            t = (t.astype(jnp.float32)
                 + gemm((o + pe).astype(dt), wproj, bproj)).astype(dt)
            h = _silu(gemm(t, wm1, bm1)).astype(dt)
            t = (t.astype(jnp.float32) + gemm(h, wm2, bm2)).astype(dt)
        ys.append(t)
    wcv2, bcv2 = pop2()
    out = _silu(gemm(jnp.concatenate(ys, -1), wcv2, bcv2)).astype(dt)
    c2 = weights[-2].shape[1]
    return out.reshape(B, H, W, c2)
