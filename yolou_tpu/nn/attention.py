"""Area attention (YOLOv12's attention-centric blocks), TPU-native.

Reimplements the behavior of ultralytics AAttn/ABlock/A2C2f (exercised via the
reference backbone table, /root/reference/YOLOSegPlusPlus.py:133-135) as
NHWC/XLA-friendly Flax modules. Attention softmax runs in float32; matmuls use
`preferred_element_type` so the MXU accumulates in fp32 even under bfloat16.

"Area" attention partitions the H*W tokens into `area` contiguous horizontal
bands and attends within each band — a static reshape, no dynamic shapes.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import C3k, ConvBNAct, FoldedConvBN, cat_channels

Dtype = Any


class AAttn(nn.Module):
    """Area attention: qkv 1x1 conv, banded softmax attention, dw7x7 positional bias.

    use_pallas=True routes the banded softmax-attention through the fused
    Pallas kernel (ops/pallas_attn.py) — scores/softmax stay in VMEM.
    """

    dim: int
    num_heads: int
    area: int = 1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        hd = self.dim // self.num_heads
        # Runtime qkv channel layout is ROLE-major (q | k | v thirds), each
        # third head-major (channel = role*dim + h*hd + d). Contiguous
        # lane-aligned thirds flow straight into the fused kernel with zero
        # HBM reshuffles. ultralytics stores qkv HEAD-major interleaved
        # (view(B,N,heads,3*hd).split); the torch->flax converter permutes
        # the qkv conv/BN output channels once at load time
        # (tools/torch2jax.py::aattn_qkv_permutation) — same function.
        n = H * W
        area = self.area if n % self.area == 0 else 1
        # Pallas only on Mosaic-supported band shapes (640-class inputs);
        # small-input graphs (e.g. 160² -> 5x5 bands) take the XLA path.
        from ..ops.pallas_attn import pallas_band_eligible
        pallas_ok = self.use_pallas and pallas_band_eligible(
            n // area, self.dim, self.num_heads)

        if pallas_ok and not train:
            # Mega-kernel eval path: qkv conv+BN fold into an affine GEMM
            # computed inside the attention kernel — q/k/v never round-trip
            # HBM. Shares ConvBNAct's exact variable tree via _FoldedConvBN.
            from ..ops.pallas_attn import area_attention_qkv_fused

            wq, bq = FoldedConvBN(C, self.dim * 3, name="qkv")()
            xt = x.reshape(B * area, n // area, C)
            out, v = area_attention_qkv_fused(
                xt, wq[0, 0].astype(self.dtype), bq[None].astype(jnp.float32),
                self.num_heads)
            out = out.reshape(B, H, W, self.dim).astype(self.dtype)
            v_spatial = v.reshape(B, H, W, self.dim)
            pe = ConvBNAct(self.dim, 7, g=self.dim, act=False, dtype=self.dtype,
                           name="pe")(v_spatial, train)
            return ConvBNAct(self.dim, 1, act=False, dtype=self.dtype,
                             name="proj")(out + pe, train)

        qkv = ConvBNAct(self.dim * 3, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        tokens = qkv.reshape(B * area, n // area, 3 * self.dim)
        q, k, v = jnp.split(tokens, 3, axis=-1)   # each (b', n', C) head-major

        if pallas_ok:
            from ..ops.pallas_attn import area_attention_fused

            out = area_attention_fused(q, k, v, self.num_heads)
            out = out.reshape(B, H, W, self.dim).astype(self.dtype)
        else:
            rs = lambda t: t.reshape(t.shape[0], t.shape[1], self.num_heads, hd)
            qh, kh, vh = rs(q), rs(k), rs(v)
            attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                              preferred_element_type=jnp.float32) * (hd ** -0.5)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh,
                             preferred_element_type=jnp.float32).astype(self.dtype)
            out = out.reshape(B, H, W, self.dim)

        # pe consumes v in the same head-major spatial layout the attention
        # output uses (ultralytics reassembles v to (B,C,H,W) before pe).
        v_spatial = v.reshape(B, H, W, self.dim)
        pe = ConvBNAct(self.dim, 7, g=self.dim, act=False, dtype=self.dtype,
                       name="pe")(v_spatial, train)
        return ConvBNAct(self.dim, 1, act=False, dtype=self.dtype, name="proj")(
            out + pe, train
        )


class ABlock(nn.Module):
    """Area-attention transformer block: x + attn(x); x + mlp(x). mlp_ratio=2."""

    dim: int
    num_heads: int
    mlp_ratio: float = 2.0
    area: int = 1
    dtype: Dtype = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + AAttn(self.dim, self.num_heads, self.area, dtype=self.dtype,
                      use_pallas=self.use_pallas, name="attn")(x, train)
        h = int(self.dim * self.mlp_ratio)
        y = ConvBNAct(h, 1, act=True, dtype=self.dtype, name="mlp1")(x, train)
        y = ConvBNAct(self.dim, 1, act=False, dtype=self.dtype, name="mlp2")(y, train)
        return x + y


class PSAAttention(nn.Module):
    """YOLO11 PSA attention: qkv with reduced key dim, dw3x3 positional bias."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B, H, W, C = x.shape
        hd = self.dim // self.num_heads
        kd = int(hd * self.attn_ratio)
        h = self.dim + 2 * kd * self.num_heads
        qkv = ConvBNAct(h, 1, act=False, dtype=self.dtype, name="qkv")(x, train)
        n = H * W
        t = qkv.reshape(B, n, self.num_heads, 2 * kd + hd)
        q, k, v = jnp.split(t, [kd, 2 * kd], axis=-1)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * (kd ** -0.5)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v,
                         preferred_element_type=jnp.float32).astype(self.dtype)
        out = out.reshape(B, H, W, self.dim)
        v_spatial = v.reshape(B, H, W, self.dim)
        pe = ConvBNAct(self.dim, 3, g=self.dim, act=False, dtype=self.dtype,
                       name="pe")(v_spatial, train)
        return ConvBNAct(self.dim, 1, act=False, dtype=self.dtype,
                         name="proj")(out + pe, train)


class PSABlock(nn.Module):
    """PSA transformer block: x + attn(x); x + ffn(x)."""

    dim: int
    num_heads: int
    attn_ratio: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x + PSAAttention(self.dim, self.num_heads, self.attn_ratio,
                             dtype=self.dtype, name="attn")(x, train)
        y = ConvBNAct(self.dim * 2, 1, dtype=self.dtype, name="ffn1")(x, train)
        y = ConvBNAct(self.dim, 1, act=False, dtype=self.dtype,
                      name="ffn2")(y, train)
        return x + y


class C2PSA(nn.Module):
    """YOLO11's C2-style PSA stage: cv1 -> split -> PSABlocks -> concat -> cv2."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = int(self.c2 * self.e)
        y = ConvBNAct(2 * c, 1, dtype=self.dtype, name="cv1")(x, train)
        a, b = y[..., :c], y[..., c:]
        for i in range(self.n):
            b = PSABlock(c, max(1, c // 64), dtype=self.dtype,
                         name=f"m{i}")(b, train)
        return ConvBNAct(self.c2, 1, dtype=self.dtype, name="cv2")(
            (a, b), train)


class _FoldedAAttnParams(nn.Module):
    """AAttn's variable tree (attn/{qkv,pe,proj}), returned as BN-folded
    affines for the whole-A2C2f mega-kernel (ops/pallas_a2c2f.py)."""

    cin: int
    dim: int

    @nn.compact
    def __call__(self):
        wq, bq = FoldedConvBN(self.cin, 3 * self.dim, 1, name="qkv")()
        wpe, bpe = FoldedConvBN(1, self.dim, 7, name="pe")()
        wp, bp = FoldedConvBN(self.dim, self.dim, 1, name="proj")()
        return wq, bq, wpe, bpe, wp, bp


class _FoldedABlockParams(nn.Module):
    """ABlock's variable tree ({attn, mlp1, mlp2}) as folded affines, in the
    mega-kernel's per-ABlock weight order."""

    dim: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self):
        wq, bq, wpe, bpe, wp, bp = _FoldedAAttnParams(
            self.dim, self.dim, name="attn")()
        h = int(self.dim * self.mlp_ratio)
        wm1, bm1 = FoldedConvBN(self.dim, h, 1, name="mlp1")()
        wm2, bm2 = FoldedConvBN(h, self.dim, 1, name="mlp2")()
        return wq, bq, wpe, bpe, wp, bp, wm1, bm1, wm2, bm2


class A2C2f(nn.Module):
    """Area-attention C2f: cv1 -> n stages of (2x ABlock | C3k) -> concat -> cv2.

    a2=True uses attention stages (backbone); a2=False uses C3k stages (neck).
    residual=True adds a learnable per-channel gamma-scaled skip.
    """

    c2: int
    n: int = 1
    a2: bool = True
    area: int = 1
    residual: bool = False
    mlp_ratio: float = 2.0
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32
    use_pallas: bool = False
    # Opt-in only: the whole-block mega-kernel wins in ISOLATION (L6 b128
    # 7.95 vs 8.3 ms staged, tools/a2c2f_probe.py --ablate=early) but LOSES
    # in-situ (full forward b128/640: 42.1 vs 32.1 ms, tools/mega_probe.py) —
    # materializing its output forfeits the staged path's lazy-concat /
    # epilogue fusions with neighboring layers. Kept wired for probes/tests.
    mega_kernel: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        num_heads = max(1, c_ // 32)
        if self.a2 and self.residual:
            x = cat_channels(x)   # residual add needs the materialized input

        if (self.a2 and not self.residual and self.use_pallas
                and self.mega_kernel and not train
                and isinstance(x, jax.Array)):
            from ..ops.pallas_a2c2f import a2c2f_fused, a2c2f_mega_eligible

            B, H, W, cin = x.shape
            n_tok = H * W
            area = self.area if n_tok % self.area == 0 else 1
            if a2c2f_mega_eligible(H, W, cin, c_, area, num_heads):
                # Whole-block mega-kernel: cv1 -> 2n ABlocks -> cv2 in ONE
                # Pallas program per image — one HBM read + one write instead
                # of ~18, and the pe dw7x7 issued BEFORE the attention dots so
                # Mosaic overlaps the VPU taps with the MXU (measured L6 b128:
                # 7.95 ms vs 8.3 staged / 9.33 pe-late, tools/a2c2f_probe.py).
                # Exact same folded math as the staged eval path; variables
                # are the staged tree via the _Folded*Params mirrors.
                dt = self.dtype
                wcv1, bcv1 = FoldedConvBN(cin, c_, 1, name="cv1")()
                ws = [wcv1[0, 0].astype(dt), bcv1]
                for i in range(self.n):
                    for j in range(2):
                        wq, bq, wpe, bpe, wp, bp, wm1, bm1, wm2, bm2 = \
                            _FoldedABlockParams(c_, self.mlp_ratio,
                                                name=f"m{i}_{j}")()
                        ws += [wq[0, 0].astype(dt), bq,
                               wpe[:, :, 0, :], bpe,
                               wp[0, 0].astype(dt), bp,
                               wm1[0, 0].astype(dt), bm1,
                               wm2[0, 0].astype(dt), bm2]
                wcv2, bcv2 = FoldedConvBN((self.n + 1) * c_, self.c2, 1,
                                          name="cv2")()
                ws += [wcv2[0, 0].astype(dt), bcv2]
                return a2c2f_fused(x, ws, self.n, area, num_heads,
                                   ablate="early")

        y = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y]
        for i in range(self.n):
            if self.a2:
                z = ys[-1]
                z = ABlock(c_, num_heads, self.mlp_ratio, self.area, dtype=self.dtype,
                           use_pallas=self.use_pallas, name=f"m{i}_0")(z, train)
                z = ABlock(c_, num_heads, self.mlp_ratio, self.area, dtype=self.dtype,
                           use_pallas=self.use_pallas, name=f"m{i}_1")(z, train)
            else:
                z = C3k(c_, 2, self.shortcut, self.g, dtype=self.dtype,
                        name=f"m{i}")(ys[-1], train)
            ys.append(z)
        out = ConvBNAct(self.c2, 1, dtype=self.dtype, name="cv2")(ys, train)
        if self.a2 and self.residual:
            gamma = self.param("gamma", lambda k: 0.01 * jnp.ones((self.c2,), jnp.float32))
            out = x + gamma.astype(out.dtype) * out
        return out
