"""TPU-native (NHWC, XLA-friendly) implementations of the YOLO building blocks.

These re-implement, in JAX/Flax, the block *behaviors* the reference exercises
through the `ultralytics` pip package (see /root/reference/YOLOSegPlusPlus.py:2
imports and the backbone table at YOLOSegPlusPlus.py:124-136) plus the small
custom decoder blocks (YOLOSegPlusPlus.py:12-88).

Conventions (TPU-first, not a torch translation):
  * activations are NHWC (XLA's preferred TPU conv layout),
  * params are float32, compute dtype is configurable (bfloat16 for the MXU),
  * BatchNorm runs in float32 (stats precision), activations cast back,
  * no data-dependent Python control flow — everything traces once under jit.

Parameter-count parity with the reference per-layer table is enforced by
tests/test_param_parity.py.
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# BatchNorm constants matching the YOLO family (torch momentum 0.03 == flax 0.97).
BN_MOMENTUM = 0.97
BN_EPS = 1e-3


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'same'-style padding for odd kernels (matches YOLO Conv default)."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


class LazyUpsample2x:
    """Deferred nearest 2x upsample. A 1x1 conv commutes with nearest
    upsampling — up(x) @ W == up(x @ W) — so a lazy consumer runs the GEMM at
    1/4 the pixels and the upsampled tensor never hits HBM (the repeat fuses
    into the add epilogue)."""

    __slots__ = ("x",)

    def __init__(self, x):
        self.x = x

    @property
    def shape(self):
        b, h, w, c = self.x.shape
        return (b, 2 * h, 2 * w, c)

    def materialize(self):
        return upsample2x(self.x, "nearest")


def _piece_channels(t) -> int:
    return t.shape[-1]


def cat_channels(x):
    """Materialize a lazy channel-concat (tuple of NHWC tensors, possibly
    containing LazyUpsample2x pieces)."""
    if isinstance(x, LazyUpsample2x):
        return x.materialize()
    if isinstance(x, (tuple, list)):
        return jnp.concatenate(
            [t.materialize() if isinstance(t, LazyUpsample2x) else t
             for t in x], axis=-1)
    return x


class ConvBNAct(nn.Module):
    """Conv2d (no bias) + BatchNorm + SiLU — the YOLO `Conv` block.

    NHWC; grouped convs use `feature_group_count`.

    A tuple/list input is a LAZY channel concat: for a plain 1x1 conv the
    kernel is sliced along the input-channel axis and the per-piece GEMMs
    summed (exact same math and parameter tree as conv(concat(xs)), but the
    concatenated tensor never exists in HBM — the concats feeding cv1/cv2 of
    the CSP blocks are pure bandwidth at b128/640, see tools_concat_bench.py).
    """

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    d: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if isinstance(x, LazyUpsample2x):
            x = (x,)
        if isinstance(x, (tuple, list)):
            # split-GEMM only pays when every piece keeps the MXU K-dim
            # lane-dense: measured on v5e (tools_concat_bench.py) 128+128 and
            # 256+128 pieces win 0.7-1.0ms each, but 16/32/64-channel pieces
            # LOSE up to 2x (lane-starved partial GEMMs cost more than the
            # materialized concat). Gate on min piece width >= 128.
            # Training materializes the concat: the split pieces' f32
            # preferred_element_type output makes the conv TRANSPOSE see
            # mixed bf16/f32 operands (autodiff error), and the split form
            # was only ever measured on the eval path.
            if (train
                    or not (self.k == 1 and self.s == 1 and self.g == 1
                            and self.d == 1)
                    or min(t.shape[-1] for t in x) < 128):
                x = cat_channels(x)
        if isinstance(x, (tuple, list)):
            cin = sum(t.shape[-1] for t in x)
            w = _ConvKernel((1, 1, cin, self.c2), name="conv")().astype(self.dtype)
            acc, off = None, 0
            for t in x:
                c = t.shape[-1]
                up = isinstance(t, LazyUpsample2x)
                src = t.x if up else t
                part = jax.lax.conv_general_dilated(
                    src.astype(self.dtype), w[:, :, off:off + c], (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                if up:   # up(x) @ W == up(x @ W): GEMM ran at 1/4 the pixels
                    part = jnp.repeat(jnp.repeat(part, 2, axis=1), 2, axis=2)
                acc = part if acc is None else acc + part
                off += c
            x = acc
        else:
            p = autopad(self.k, None, self.d)
            x = nn.Conv(
                features=self.c2,
                kernel_size=(self.k, self.k),
                strides=(self.s, self.s),
                padding=((p, p), (p, p)),
                feature_group_count=self.g,
                kernel_dilation=(self.d, self.d),
                use_bias=False,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="bn",
        )(x)
        if self.act:
            x = nn.silu(x)
        return x.astype(self.dtype)


class _ConvKernel(nn.Module):
    """Bare conv kernel param with nn.Conv's name/init (for BN folding)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)


class _BNParams(nn.Module):
    """Bare BatchNorm params/stats with nn.BatchNorm's names/inits."""

    c: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.c,), jnp.float32)
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((self.c,), jnp.float32))
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((self.c,), jnp.float32))
        return scale, bias, mean.value, var.value


class FoldedConvBN(nn.Module):
    """Declares the exact variable tree of ConvBNAct (conv/kernel +
    bn/{scale,bias} + batch_stats bn/{mean,var}) but returns the running-
    stats-folded affine (W', b') instead of applying it — so inference paths
    can push the conv into a fused Pallas kernel while the train path keeps
    calling the real ConvBNAct over the SAME variables."""

    c1: int
    c2: int
    k: int = 1

    @nn.compact
    def __call__(self):
        kern = _ConvKernel((self.k, self.k, self.c1, self.c2), name="conv")()
        scale, bias, mean, var = _BNParams(self.c2, name="bn")()
        inv = scale * jax.lax.rsqrt(var + BN_EPS)
        return kern * inv, bias - mean * inv


class FoldedDWConvBN(nn.Module):
    """FoldedConvBN mirror of DWConv's variable tree (dw/conv + dw/bn with
    the grouped (k,k,1,c2) kernel): returns the BN-folded depthwise (W', b')
    so eval paths can expand it to a diagonal dense block inside a fused
    entry conv."""

    c2: int
    k: int = 3

    @nn.compact
    def __call__(self):
        return FoldedConvBN(1, self.c2, self.k, name="dw")()


class ConvParams(nn.Module):
    """Bare biased-conv params with nn.Conv's names/inits (kernel + bias)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        kern = self.param("kernel", nn.initializers.lecun_normal(),
                          self.shape, jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.shape[-1],), jnp.float32)
        return kern, bias


class DWConv(nn.Module):
    """Depthwise conv (groups = gcd(c1, c2)), as in ultralytics DWConv."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = math.gcd(x.shape[-1], self.c2)
        return ConvBNAct(self.c2, self.k, self.s, g=g, d=self.d, act=self.act,
                         dtype=self.dtype, name="dw")(x, train)


class LightConv(nn.Module):
    """1x1 conv (no act) followed by depthwise kxk conv (act)."""

    c2: int
    k: int = 3
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(self.c2, 1, act=False, dtype=self.dtype, name="conv1")(x, train)
        x = DWConv(self.c2, self.k, act=self.act, dtype=self.dtype, name="conv2")(x, train)
        return x


class GhostConv(nn.Module):
    """Ghost convolution: primary 1x1-ish conv + cheap depthwise 5x5 expansion."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = ConvBNAct(c_, self.k, self.s, g=self.g, act=self.act, dtype=self.dtype,
                      name="cv1")(x, train)
        y2 = ConvBNAct(c_, 5, 1, g=c_, act=self.act, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (stride 1 or 2) used inside C3Ghost."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = GhostConv(c_, 1, 1, act=True, dtype=self.dtype, name="ghost1")(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, dtype=self.dtype, name="dwmid")(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, dtype=self.dtype, name="ghost2")(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, dtype=self.dtype,
                        name="sc_dw")(x, train)
            sc = ConvBNAct(self.c2, 1, 1, act=False, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else 0.0
        return y + sc


class Bottleneck(nn.Module):
    """Standard YOLO bottleneck: cv1 kxk -> cv2 kxk with optional residual."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: Tuple[int, int] = (3, 3)
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(c_, self.k[0], 1, dtype=self.dtype, name="cv1")(x, train)
        y = ConvBNAct(self.c2, self.k[1], 1, g=self.g, dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.c2:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial bottleneck with two convolutions (v8 C2f)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(2 * c_, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c_], y[..., c_:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c_, self.shortcut, self.g, k=(3, 3), e=1.0, dtype=self.dtype,
                           name=f"m{i}")(ys[-1], train)
            )
        return ConvBNAct(self.c2, 1, dtype=self.dtype, name="cv2")(ys, train)


def _dual_entry_1x1(x, c_, dtype, train):
    """The C3-family cv1/cv2 1x1+BN+SiLU pair reads the same input. At eval
    the BNs fold and the pair runs as ONE 2x-wide conv (exact math, the
    input is read from HBM once and the output GEMM is twice as lane-dense).
    Variable tree is unchanged (FoldedConvBN mirrors ConvBNAct's names)."""
    if train or isinstance(x, (tuple, list, LazyUpsample2x)):
        a = ConvBNAct(c_, 1, dtype=dtype, name="cv1")(x, train)
        b = ConvBNAct(c_, 1, dtype=dtype, name="cv2")(x, train)
        return a, b
    w1, b1 = FoldedConvBN(x.shape[-1], c_, 1, name="cv1")()
    w2, b2 = FoldedConvBN(x.shape[-1], c_, 1, name="cv2")()
    w = jnp.concatenate([w1, w2], axis=-1).astype(dtype)
    bb = jnp.concatenate([b1, b2], axis=-1)
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), w, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + bb[None, None, None]
    y = nn.silu(y).astype(dtype)
    return y[..., :c_], y[..., c_:]


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: Tuple[int, int] = ((1, 1), (3, 3))  # bottleneck kernels; C3 default
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a, b = _dual_entry_1x1(x, c_, self.dtype, train)
        for i in range(self.n):
            k = self.k
            k0 = k[0] if isinstance(k[0], int) else k[0][0]
            k1 = k[1] if isinstance(k[1], int) else k[1][0]
            a = Bottleneck(c_, self.shortcut, self.g, k=(k0, k1), e=1.0, dtype=self.dtype,
                           name=f"m{i}")(a, train)
        return ConvBNAct(self.c2, 1, dtype=self.dtype, name="cv3")((a, b), train)


class C3k(nn.Module):
    """C3 variant with kxk bottleneck kernels (used when C3k2.c3k=True and in A2C2f)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return C3(self.c2, self.n, self.shortcut, self.g, self.e, k=(self.k, self.k),
                  dtype=self.dtype, name="c3")(x, train)


class C3Ghost(nn.Module):
    """C3 with GhostBottleneck blocks (decoder mixing block, YOLOSegPlusPlus.py:158)."""

    c2: int
    n: int = 1
    e: float = 0.5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        a, b = _dual_entry_1x1(x, c_, self.dtype, train)
        for i in range(self.n):
            a = GhostBottleneck(c_, dtype=self.dtype, name=f"m{i}")(a, train)
        return ConvBNAct(self.c2, 1, dtype=self.dtype, name="cv3")((a, b), train)


class C3k2(nn.Module):
    """v11/v12 C2f variant whose inner blocks are C3k (c3k=True) or Bottleneck."""

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y = ConvBNAct(2 * c_, 1, dtype=self.dtype, name="cv1")(x, train)
        ys = [y[..., :c_], y[..., c_:]]
        for i in range(self.n):
            if self.c3k:
                m = C3k(c_, 2, self.shortcut, self.g, dtype=self.dtype, name=f"m{i}")
            else:
                m = Bottleneck(c_, self.shortcut, self.g, k=(3, 3), e=0.5,
                               dtype=self.dtype, name=f"m{i}")
            ys.append(m(ys[-1], train))
        return ConvBNAct(self.c2, 1, dtype=self.dtype, name="cv2")(ys, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast) — for v8/v11 family support."""

    c2: int
    k: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        y = ConvBNAct(c_, 1, dtype=self.dtype, name="cv1")(x, train)
        p = self.k // 2
        pool = lambda t: nn.max_pool(t, (self.k, self.k), strides=(1, 1),
                                     padding=((p, p), (p, p)))
        y1 = pool(y)
        y2 = pool(y1)
        y3 = pool(y2)
        return ConvBNAct(self.c2, 1, dtype=self.dtype, name="cv2")(
            (y, y1, y2, y3), train)


class ECA(nn.Module):
    """Efficient Channel Attention (YOLOSegPlusPlus.py:60-88).

    Global average pool -> 1D conv (k=3) across the channel axis -> sigmoid gate.
    """

    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, H, W, C) -> channel descriptor (B, C)
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        # 1D conv over the channel axis, single in/out feature, no bias.
        p = (self.k - 1) // 2
        y = nn.Conv(features=1, kernel_size=(self.k,), padding=((p, p),),
                    use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32,
                    name="conv1d")(y[..., None])[..., 0]
        gate = jax.nn.sigmoid(y)  # (B, C)
        return (x * gate[:, None, None, :].astype(x.dtype)).astype(self.dtype)


class SingleLightConv(nn.Module):
    """LightConv + 1x1 residual projection (YOLOSegPlusPlus.py:12-31)."""

    c2: int
    k: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = x if x.shape[-1] == self.c2 else nn.Conv(
            self.c2, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            name="residual")(x)
        y = LightConv(self.c2, self.k, dtype=self.dtype, name="conv")(x, train)
        return y + r


class DoubleLightConv(nn.Module):
    """Two stacked LightConvs + 1x1 residual projection (YOLOSegPlusPlus.py:33-58)."""

    c2: int
    k1: int = 3
    k2: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r = x if x.shape[-1] == self.c2 else nn.Conv(
            self.c2, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            name="residual")(x)
        y = LightConv(self.c2, self.k1, dtype=self.dtype, name="conv_a")(x, train)
        y = LightConv(self.c2, self.k2, dtype=self.dtype, name="conv_b")(y, train)
        return y + r


def upsample2x(x: jax.Array, method: str = "nearest") -> jax.Array:
    """2x spatial upsample. nearest matches torch nn.Upsample(scale_factor=2)."""
    b, h, w, c = x.shape
    if method == "nearest":
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return x
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method=method)


def upsample_bilinear_torch(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear resize matching torch's align_corners=False convention.

    torch/cv2 half-pixel-center bilinear == jax.image.resize 'linear'.
    Used by the decoder upsample (YOLOSegPlusPlus.py:155) and mask ops.
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, out_hw[0], out_hw[1], c), method="linear")


class Proto(nn.Module):
    """YOLO segmentation mask Proto head: conv -> 2x deconv -> conv -> 1x1 conv.

    (A composite-tail rewrite — convT∘cv2 folded into one 3x3 conv at input
    res emitting s2d(2) output — was derived, verified exact, and measured
    2x SLOWER than this staged form at b128/640 on v5e: the 64->256 3x3 at
    80² is a bad Mosaic shape. Dead end recorded in CLAUDE.md; do not retry.)
    """

    c_: int = 256
    c2: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, phase: str = "full",
                 first=None):
        """phase="entry" declares cv1's FoldedConvBN mirror and returns its
        folded (w, b) so Segment can batch it with the other P3 entry convs;
        passing `first` consumes that precomputed cv1 output instead. Both
        declare the exact staged variable tree."""
        if phase == "entry":
            return FoldedConvBN(x.shape[-1], self.c_, 3, name="cv1")()
        if first is not None:
            x = first
        else:
            x = ConvBNAct(self.c_, 3, dtype=self.dtype, name="cv1")(x, train)
        x = nn.ConvTranspose(self.c_, (2, 2), strides=(2, 2), padding="VALID",
                             use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                             name="upsample")(x)
        x = ConvBNAct(self.c_, 3, dtype=self.dtype, name="cv2")(x, train)
        return ConvBNAct(self.c2, 1, dtype=self.dtype, name="cv3")(x, train)


# --------------------------------------------------------------- s2d stem

def space_to_depth(x, b: int = 4):
    """NHWC -> (B, H/b, W/b, b*b*C), channel order (iy, ix, ci).

    On-device this is an expensive relayout (measured 3.5-4.1 ms at b128/640
    even as a one-hot stride-4 conv); it exists for tests and host fallbacks.
    The inference path gets s2d input FROM the loader (host emits it while
    writing the decoded/letterboxed buffer anyway)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // b, W // b, b * b * C)


def s2d_stem_apply(x, w0, b0, w1, b1, ch: int, c0: int, c1: int, dtype):
    """The first two YOLO convs (3x3/s2 ch->c0, 3x3/s2 c0->c1) evaluated on a
    space-to-depth(4) input — inference-only lane-density rewrite.

    The native stem is MXU-starved (4 input channels -> K=36 taps padded to a
    128 lane tile; measured 3.2 ms vs a 0.6 ms compute bound at b128/640).
    On s2d(4) input, conv0 becomes a k=2 conv with K=4*4*ch dense input
    lanes producing the s2d(2) layout of its native output (output channel
    order (py, px, co)), and conv1 becomes a k=2 conv whose output is the
    native 1/4-res feature map — no relayout anywhere (the loader's s2d is
    free, conv1 exits in native NHWC). Measured 3.20+0.95 -> 1.44+1.08 ms.

    Exactness: out == native within bf16 rounding (tools_s2d_probe.py and
    tests/test_s2d_stem.py). w/b are the BN-FOLDED affines of model_0/model_1
    (FoldedConvBN), so checkpoints and the converter are untouched; SiLU
    applied per conv as usual.

    Weight map: original input row for output row 2*oy'+py (phase py of
    output block oy') is 4*oy' + 2*py + ky - 1; with a one-block top/left
    zero pad the within-window index is u = 2*py + ky + 3 in [3, 8) (conv0)
    and u = ky + 1 in [1, 4) (conv1).
    """
    wp0 = jnp.zeros((2, 2, 4, 4, ch, 2, 2, c0), w0.dtype)
    for py in range(2):
        for px in range(2):
            for ky in range(3):
                for kx in range(3):
                    u, v = 2 * py + ky + 3, 2 * px + kx + 3
                    wp0 = wp0.at[u // 4, v // 4, u % 4, v % 4, :,
                                 py, px, :].set(w0[ky, kx])
    wp0 = wp0.reshape(2, 2, 16 * ch, 4 * c0)
    bp0 = jnp.tile(b0, 4)

    wp1 = jnp.zeros((2, 2, 2, 2, c0, c1), w1.dtype)
    for ky in range(3):
        for kx in range(3):
            u, v = ky + 1, kx + 1
            wp1 = wp1.at[u // 2, v // 2, u % 2, v % 2].set(w1[ky, kx])
    wp1 = wp1.reshape(2, 2, 4 * c0, c1)

    pad = ((1, 0), (1, 0))
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), wp0.astype(dtype), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + bp0
    y = nn.silu(y).astype(dtype)
    y = jax.lax.conv_general_dilated(
        y, wp1.astype(dtype), (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + b1
    return nn.silu(y).astype(dtype)
