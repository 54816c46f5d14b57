"""On-device training augmentation (jitted, batched, jax.random-keyed).

TPU-native redesign of the reference's host-side pipeline
(/root/reference/custom_yolo_trainer/custom_v8_transforms.py): Mosaic ->
RandomPerspective(affine) -> MixUp/CutMix -> GaussianNoisePerChannel ->
MildGaussianBlur -> RandomBiasField -> RandomHSV -> flips. All ops run per
*batch* on device with fixed shapes.

Instance labels ride along as an **overlap-encoded id map** (B, S, S) int32
(0 = background, j+1 = instance j) — the fixed-shape substitute for ragged
polygon lists. Images warp bilinearly, id maps warp nearest. After the
pipeline, `finalize_targets` derives xywh boxes from id-map extents and
downsamples per-instance masks to proto resolution.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

GRAY = 114.0 / 255.0


@dataclasses.dataclass(frozen=True)
class AugHyp:
    mosaic: float = 1.0
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    flipud: float = 0.0
    fliplr: float = 0.5
    mixup: float = 0.0
    cutmix: float = 0.0
    copy_paste: float = 0.0
    resolution_p: float = 0.0       # RandomResolution (reference default: off)
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    noise_p: float = 0.25
    noise_lo: float = 0.01
    noise_hi: float = 0.05
    blur_p: float = 0.15
    blur_sigma_lo: float = 0.5
    blur_sigma_hi: float = 1.5
    bias_p: float = 0.15
    bias_alpha_lo: float = 0.1
    bias_alpha_hi: float = 0.3
    bias_smoothness: float = 0.3


# ---------------------------------------------------------------- warp utils

def _bilinear_sample(img: jax.Array, xs: jax.Array, ys: jax.Array,
                     fill: float) -> jax.Array:
    """Sample (H, W, C) at float coords (h', w'); outside -> fill."""
    h, w, _ = img.shape
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    fx = xs - x0
    fy = ys - y0

    def gather(yy, xx):
        valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yy = jnp.clip(yy, 0, h - 1)
        xx = jnp.clip(xx, 0, w - 1)
        v = img[yy, xx]
        return jnp.where(valid[..., None], v, fill)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return ((v00 * (1 - fx) + v01 * fx) * (1 - fy)
            + (v10 * (1 - fx) + v11 * fx) * fy)


def _nearest_sample_int(idmap: jax.Array, xs: jax.Array, ys: jax.Array) -> jax.Array:
    h, w = idmap.shape
    xi = jnp.round(xs).astype(jnp.int32)
    yi = jnp.round(ys).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    v = idmap[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(valid, v, 0)


def affine_warp(img: jax.Array, idmap: jax.Array, minv: jax.Array,
                out_size: int, fill: float = GRAY) -> Tuple[jax.Array, jax.Array]:
    """Warp one image (H,W,C) + id map (H,W) by the inverse affine `minv` (2,3)."""
    ys, xs = jnp.meshgrid(jnp.arange(out_size, dtype=jnp.float32),
                          jnp.arange(out_size, dtype=jnp.float32), indexing="ij")
    sx = minv[0, 0] * xs + minv[0, 1] * ys + minv[0, 2]
    sy = minv[1, 0] * xs + minv[1, 1] * ys + minv[1, 2]
    return (_bilinear_sample(img, sx, sy, fill),
            _nearest_sample_int(idmap, sx, sy))


def _axis_lerp(img: jax.Array, pos: jax.Array, axis: int, fill) -> jax.Array:
    """1-D bilinear resample of `img` along `axis` at float source positions
    `pos` (S_out,); out-of-range taps read `fill`. Whole-row/column takes —
    coarse contiguous gathers the TPU handles at near-bandwidth, unlike the
    per-pixel 2-D gather in `_bilinear_sample`."""
    n = img.shape[axis]
    i0 = jnp.floor(pos).astype(jnp.int32)
    f = pos - i0
    shape = [1] * img.ndim
    shape[axis] = -1
    v0 = ((i0 >= 0) & (i0 < n)).reshape(shape)
    v1 = ((i0 + 1 >= 0) & (i0 + 1 < n)).reshape(shape)
    g0 = jnp.take(img, jnp.clip(i0, 0, n - 1), axis=axis)
    g1 = jnp.take(img, jnp.clip(i0 + 1, 0, n - 1), axis=axis)
    f = f.reshape(shape)
    g0 = jnp.where(v0, g0, fill)
    g1 = jnp.where(v1, g1, fill)
    return g0 * (1 - f) + g1 * f


def _axis_nearest_int(m: jax.Array, pos: jax.Array, axis: int) -> jax.Array:
    n = m.shape[axis]
    i = jnp.round(pos).astype(jnp.int32)
    shape = [1] * m.ndim
    shape[axis] = -1
    v = ((i >= 0) & (i < n)).reshape(shape)
    return jnp.where(v, jnp.take(m, jnp.clip(i, 0, n - 1), axis=axis), 0)


def affine_warp_separable(img: jax.Array, idmap: jax.Array, minv: jax.Array,
                          out_size: int, fill: float = GRAY
                          ) -> Tuple[jax.Array, jax.Array]:
    """Axis-separable warp for cross-term-free affines (degrees=shear=0, the
    reference's default hyp): sx depends only on x and sy only on y, so the
    2-D bilinear gather factors EXACTLY into a row lerp then a column lerp
    (the constant fill commutes through the outer lerp). Replaces the
    per-pixel gather — measured 46 ms of the 56 ms b32/160 train step — with
    four contiguous row/column takes."""
    r = jnp.arange(out_size, dtype=jnp.float32)
    sx = minv[0, 0] * r + minv[0, 2]
    sy = minv[1, 1] * r + minv[1, 2]
    out = _axis_lerp(_axis_lerp(img, sy, 0, fill), sx, 1, fill)
    ids = _axis_nearest_int(_axis_nearest_int(idmap, sy, 0), sx, 1)
    return out, ids


def _affine_inverse_params(key: jax.Array, hyp: AugHyp, in_size: float,
                           out_size: float) -> jax.Array:
    """Random inverse affine (out px -> in px), jitter around a center crop."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    deg = jax.random.uniform(k1, (), minval=-hyp.degrees, maxval=hyp.degrees)
    th = deg * jnp.pi / 180.0
    sc = jax.random.uniform(k2, (), minval=1 - hyp.scale, maxval=1 + hyp.scale)
    shx = jnp.tan(jax.random.uniform(k3, (), minval=-hyp.shear, maxval=hyp.shear)
                  * jnp.pi / 180.0)
    shy = jnp.tan(jax.random.uniform(k4, (), minval=-hyp.shear, maxval=hyp.shear)
                  * jnp.pi / 180.0)
    tx, ty = jax.random.uniform(k5, (2,), minval=-hyp.translate,
                                maxval=hyp.translate) * out_size
    # forward: p_out = T * Sh * R*S * (p_in - c_in) + c_out
    cos, sin = jnp.cos(th) * sc, jnp.sin(th) * sc
    fwd = jnp.array([[cos, -sin], [sin, cos]])
    sh = jnp.array([[1.0, shx], [shy, 1.0]])
    a = sh @ fwd
    det = a[0, 0] * a[1, 1] - a[0, 1] * a[1, 0]
    inv = jnp.array([[a[1, 1], -a[0, 1]], [-a[1, 0], a[0, 0]]]) / det
    c_in = in_size / 2.0
    c_out = out_size / 2.0
    t = jnp.array([c_out + tx, c_out + ty])
    # inverse mapping: p_in = inv @ (p_out - t) + c_in
    off = -inv @ t + c_in
    return jnp.concatenate([inv, off[:, None]], axis=1)  # (2,3)


# ---------------------------------------------------------------- mosaic

def _mosaic_gather(img4, idmap4, yc, xc):
    """One 2Sx2S random-center mosaic from 4 stacked (S,S,·) sources.

    Ultralytics Mosaic semantics (v8_transforms Mosaic._mosaic4): the four
    images meet at a random center (yc, xc); quadrant q shows the corner of
    image q adjacent to the center, gray-114 where an image doesn't reach the
    canvas edge. Fixed-shape JAX form: every quadrant's content is the FIXED
    2x2 grid canvas shifted by the same (yc-S, xc-S) — quadrant q's source
    corner sits adjacent to the grid junction — so ONE jnp.roll of the
    concatenated canvas (lowers to dynamic slices; a general gather here cost
    2.7x the whole train step) plus an in-bounds mask reproduces the random-
    center paste exactly; roll wraparound always lands outside the mask."""
    s = img4.shape[1]
    ys = jnp.arange(2 * s)
    xs = jnp.arange(2 * s)
    # true per-quadrant source coords (validity mask only)
    qy = jnp.where(ys[:, None] < yc, ys[:, None] - yc + s, ys[:, None] - yc)
    qx = jnp.where(xs[None, :] < xc, xs[None, :] - xc + s, xs[None, :] - xc)
    inb = (qy >= 0) & (qy < s) & (qx >= 0) & (qx < s)

    grid = jnp.concatenate(
        [jnp.concatenate([img4[0], img4[1]], axis=1),
         jnp.concatenate([img4[2], img4[3]], axis=1)], axis=0)   # (2S,2S,C)
    gids = jnp.concatenate(
        [jnp.concatenate([idmap4[0], idmap4[1]], axis=1),
         jnp.concatenate([idmap4[2], idmap4[3]], axis=1)], axis=0)
    canvas = jnp.where(inb[..., None], jnp.roll(grid, (yc - s, xc - s), (0, 1)),
                       jnp.asarray(GRAY, img4.dtype))
    ids = jnp.where(inb, jnp.roll(gids, (yc - s, xc - s), (0, 1)), 0)
    return canvas, ids


def mosaic4(img: jax.Array, idmap: jax.Array, cls: jax.Array, valid: jax.Array,
            key: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batch mosaic: each output is a 2Sx2S canvas of 4 permuted batch images
    meeting at a RANDOM center (ultralytics Mosaic: yc,xc ~ U(0.5S, 1.5S)),
    gray-114 filled where sources don't reach.

    Instance ids are offset per quadrant (quadrant q hosts ids q*G+1..q*G+G);
    cls/valid expand to 4G slots. Caller reduces back to G after the affine.
    """
    b, s, _, _ = img.shape
    g = cls.shape[1]
    kperm, kc = jax.random.split(key)
    perm = jax.random.permutation(kperm, b)
    rolls = [jnp.arange(b), perm, jnp.roll(perm, 1), jnp.roll(perm, 2)]
    img4 = jnp.stack([img[r] for r in rolls], axis=1)       # (B,4,S,S,C)
    m4 = jnp.stack([jnp.where(idmap[r] > 0, idmap[r] + q * g, 0)
                    for q, r in enumerate(rolls)], axis=1)  # (B,4,S,S)
    centers = jax.random.randint(kc, (b, 2), s // 2, 3 * s // 2 + 1)
    canvas, mcanvas = jax.vmap(_mosaic_gather)(
        img4, m4, centers[:, 0], centers[:, 1])
    cls4 = jnp.concatenate([cls[r] for r in rolls], axis=1)   # (B, 4G)
    val4 = jnp.concatenate([valid[r] for r in rolls], axis=1)
    return canvas, mcanvas, cls4, val4


def reduce_instances(idmap: jax.Array, cls: jax.Array, valid: jax.Array,
                     g_out: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Keep the g_out largest surviving instances; remap ids to 1..g_out.

    Everything is compare-arithmetic on the lane axis — no scatter (the
    remap-table build) and no wide gather (the per-pixel table lookup), both
    of which lower terribly on TPU: the old scatter+gather form was 7.1 of
    the 10.2 ms aug pipeline at b32/160 (tools/aug_bisect.py)."""
    b, s, _ = idmap.shape
    g_in = cls.shape[1]
    ids = jnp.arange(1, g_in + 1, dtype=idmap.dtype)
    # per-instance areas: one-hot compare with G_in on lanes, reduce pixels
    areas = jnp.sum(idmap[..., None] == ids, axis=(1, 2),
                    dtype=jnp.float32)                       # (B, G_in)
    areas = areas * valid.astype(jnp.float32)
    top_area, top_idx = jax.lax.top_k(areas, g_out)          # (B, g_out)
    new_valid = top_area > 0
    new_cls = jnp.take_along_axis(cls, top_idx, axis=1)
    # remap old id top_idx[b, j]+1 -> j+1: at most one of the g_out compares
    # matches per pixel (ids are unique), so a weighted sum IS the lookup
    sel = idmap[..., None] == (top_idx[:, None, None, :] + 1)  # (B,S,S,g_out)
    w = (jnp.arange(1, g_out + 1, dtype=jnp.int32)
         * new_valid.astype(jnp.int32))                       # (B, g_out)
    new_idmap = jnp.sum(sel * w[:, None, None, :], axis=-1)
    return new_idmap, new_cls, new_valid


# ---------------------------------------------------------------- photometric

def _gaussian_kernel3(sigma: jax.Array) -> jax.Array:
    x = jnp.array([-1.0, 0.0, 1.0])
    k = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / jnp.sum(k)


def mild_gaussian_blur(img: jax.Array, key: jax.Array, hyp: AugHyp) -> jax.Array:
    """Per-image p-gated separable 3x3 Gaussian blur (custom_v8_transforms.py:52-70)."""
    b = img.shape[0]
    kp, ks = jax.random.split(key)
    apply = jax.random.uniform(kp, (b,)) < hyp.blur_p
    sigma = jax.random.uniform(ks, (b,), minval=hyp.blur_sigma_lo,
                               maxval=hyp.blur_sigma_hi)

    def one(im, sg):
        k = _gaussian_kernel3(sg)
        pad = jnp.pad(im, ((1, 1), (1, 1), (0, 0)), mode="edge")
        h = (pad[:, :-2] * k[0] + pad[:, 1:-1] * k[1] + pad[:, 2:] * k[2])[1:-1]
        hp = jnp.pad(h, ((1, 1), (0, 0), (0, 0)), mode="edge")
        return hp[:-2] * k[0] + hp[1:-1] * k[1] + hp[2:] * k[2]

    blurred = jax.vmap(one)(img, sigma)
    return jnp.where(apply[:, None, None, None], blurred, img)


def gaussian_noise_per_channel(img: jax.Array, key: jax.Array, hyp: AugHyp) -> jax.Array:
    b, _, _, c = img.shape
    kp, kstd, kn = jax.random.split(key, 3)
    apply = jax.random.uniform(kp, (b,)) < hyp.noise_p
    std = jax.random.uniform(kstd, (b, 1, 1, c), minval=hyp.noise_lo,
                             maxval=hyp.noise_hi)
    noise = jax.random.normal(kn, img.shape) * std
    return jnp.where(apply[:, None, None, None],
                     jnp.clip(img + noise, 0.0, 1.0), img)


def random_bias_field(img: jax.Array, key: jax.Array, hyp: AugHyp) -> jax.Array:
    """Elliptical MRI coil-bias field, invertible (custom_v8_transforms.py:72-129)."""
    b, h, w, _ = img.shape
    kp, kc, ka, ks, ki = jax.random.split(key, 5)
    apply = jax.random.uniform(kp, (b,)) < hyp.bias_p
    center = jax.random.uniform(kc, (b, 2), minval=-1, maxval=1)
    alpha = jax.random.uniform(ka, (b,), minval=hyp.bias_alpha_lo,
                               maxval=hyp.bias_alpha_hi)
    scale = jax.random.uniform(ks, (b, 2), minval=0.5, maxval=2.0)
    invert = jax.random.uniform(ki, (b,)) > 0.5
    xs = jnp.linspace(-1, 1, w)
    ys = jnp.linspace(-1, 1, h)
    gx, gy = jnp.meshgrid(xs, ys)

    def one(c, a, sc, inv):
        d2 = ((gx - c[0]) * sc[0]) ** 2 + ((gy - c[1]) * sc[1]) ** 2
        bias = 1 + a * jnp.exp(-d2 / (2 * hyp.bias_smoothness ** 2))
        bias = jnp.where(inv, 2 - bias, bias)
        return jnp.clip(bias, 0.5, 1.5)

    bias = jax.vmap(one)(center, alpha, scale, invert)[..., None]
    out = jnp.clip(img * bias, 0.0, 1.0)
    return jnp.where(apply[:, None, None, None], out, img)


def random_hsv(img: jax.Array, key: jax.Array, hyp: AugHyp) -> jax.Array:
    """RandomHSV for 3-channel inputs; identity otherwise (4-ch MRI)."""
    if img.shape[-1] != 3:
        return img
    kh, ks, kv = jax.random.split(key, 3)
    b = img.shape[0]
    dh = jax.random.uniform(kh, (b, 1, 1), minval=-hyp.hsv_h, maxval=hyp.hsv_h)
    ds = 1 + jax.random.uniform(ks, (b, 1, 1), minval=-hyp.hsv_s, maxval=hyp.hsv_s)
    dv = 1 + jax.random.uniform(kv, (b, 1, 1), minval=-hyp.hsv_v, maxval=hyp.hsv_v)
    hsv = _rgb_to_hsv(img)
    h = jnp.mod(hsv[..., 0] + dh, 1.0)
    s = jnp.clip(hsv[..., 1] * ds, 0, 1)
    v = jnp.clip(hsv[..., 2] * dv, 0, 1)
    return _hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, -1)
    mn = jnp.min(rgb, -1)
    d = mx - mn + 1e-12
    h = jnp.where(mx == r, (g - b) / d % 6,
                  jnp.where(mx == g, (b - r) / d + 2, (r - g) / d + 4)) / 6.0
    s = jnp.where(mx > 0, d / (mx + 1e-12), 0.0)
    return jnp.stack([h, s, mx], -1)


def _hsv_to_rgb(hsv):
    h, s, v = hsv[..., 0] * 6.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], -1)


def random_flips(img: jax.Array, idmap: jax.Array, key: jax.Array,
                 hyp: AugHyp) -> Tuple[jax.Array, jax.Array]:
    b = img.shape[0]
    ku, kl = jax.random.split(key)
    ud = jax.random.uniform(ku, (b,)) < hyp.flipud
    lr = jax.random.uniform(kl, (b,)) < hyp.fliplr
    img = jnp.where(ud[:, None, None, None], img[:, ::-1], img)
    idmap = jnp.where(ud[:, None, None], idmap[:, ::-1], idmap)
    img = jnp.where(lr[:, None, None, None], img[:, :, ::-1], img)
    idmap = jnp.where(lr[:, None, None], idmap[:, :, ::-1], idmap)
    return img, idmap


def mixup(img: jax.Array, idmap: jax.Array, cls, valid, key, p: float):
    """Image-level mixup with a rolled batch; labels union via reduce later."""
    b = img.shape[0]
    g = cls.shape[1]
    kp, kr = jax.random.split(key)
    apply = jax.random.uniform(kp, (b,)) < p
    lam = jax.random.beta(kr, 32.0, 32.0, (b,))
    img2 = jnp.roll(img, 1, axis=0)
    mixed = img * lam[:, None, None, None] + img2 * (1 - lam[:, None, None, None])
    img = jnp.where(apply[:, None, None, None], mixed, img)
    # labels: keep current image's instances; partner's ids join as g..2g
    id2 = jnp.roll(idmap, 1, axis=0)
    joined = jnp.where((idmap == 0) & (id2 > 0) & apply[:, None, None],
                       id2 + g, idmap)
    cls2 = jnp.concatenate([cls, jnp.roll(cls, 1, axis=0)], axis=1)
    val2 = jnp.concatenate(
        [valid, jnp.roll(valid, 1, axis=0) & apply[:, None]], axis=1)
    return img, joined, cls2, val2


def random_resolution(img: jax.Array, key: jax.Array, hyp: AugHyp) -> jax.Array:
    """Down-up resample degradation (custom_v8_transforms.py:30-50). Static
    shapes: one of three discrete scale factors per image via lax.switch."""
    if hyp.resolution_p <= 0:
        return img
    b, s, _, c = img.shape
    kp, ks = jax.random.split(key)
    apply = jax.random.uniform(kp, (b,)) < hyp.resolution_p
    which = jax.random.randint(ks, (b,), 0, 3)

    def degrade(scale):
        t = max(8, int(s * scale))
        def f(im):
            low = jax.image.resize(im, (t, t, c), method="linear")
            return jax.image.resize(low, (s, s, c), method="linear")
        return f

    fns = [degrade(0.6), degrade(0.75), degrade(0.9)]

    def one(im, w):
        return jax.lax.switch(w, fns, im)

    degraded = jax.vmap(one)(img, which)
    return jnp.where(apply[:, None, None, None], degraded, img)


def cutmix(img: jax.Array, idmap: jax.Array, cls, valid, key, p: float):
    """Rectangular patch from a rolled partner image; labels union (padded)."""
    b, s, _, _ = img.shape
    g = cls.shape[1]
    kp, kb, kwh = jax.random.split(key, 3)
    apply = jax.random.uniform(kp, (b,)) < p
    cxy = jax.random.uniform(kb, (b, 2), minval=0.2, maxval=0.8) * s
    wh = jax.random.uniform(kwh, (b, 2), minval=0.2, maxval=0.5) * s
    ys = jnp.arange(s)[None, :, None]
    xs = jnp.arange(s)[None, None, :]
    in_box = ((xs >= (cxy[:, 0] - wh[:, 0] / 2)[:, None, None])
              & (xs < (cxy[:, 0] + wh[:, 0] / 2)[:, None, None])
              & (ys >= (cxy[:, 1] - wh[:, 1] / 2)[:, None, None])
              & (ys < (cxy[:, 1] + wh[:, 1] / 2)[:, None, None]))
    in_box = in_box & apply[:, None, None]
    img2 = jnp.roll(img, 1, axis=0)
    id2 = jnp.roll(idmap, 1, axis=0)
    img = jnp.where(in_box[..., None], img2, img)
    idmap = jnp.where(in_box, jnp.where(id2 > 0, id2 + g, 0), idmap)
    cls2 = jnp.concatenate([cls, jnp.roll(cls, 1, axis=0)], axis=1)
    val2 = jnp.concatenate([valid, jnp.roll(valid, 1, axis=0) & apply[:, None]],
                           axis=1)
    return img, idmap, cls2, val2


def copy_paste_flip(img: jax.Array, idmap: jax.Array, cls, valid, key, p: float):
    """Flip-mode CopyPaste: paste horizontally-mirrored instances of the same
    image onto free background (ultralytics copy_paste_mode='flip')."""
    b = img.shape[0]
    g = cls.shape[1]
    kp = key
    apply = jax.random.uniform(kp, (b,)) < p
    fimg = img[:, :, ::-1]
    fid = idmap[:, :, ::-1]
    paste = (fid > 0) & (idmap == 0) & apply[:, None, None]
    img = jnp.where(paste[..., None], fimg, img)
    idmap = jnp.where(paste, fid + g, idmap)
    cls2 = jnp.concatenate([cls, cls], axis=1)
    val2 = jnp.concatenate([valid, valid & apply[:, None]], axis=1)
    return img, idmap, cls2, val2


# ---------------------------------------------------------------- finalize

def boxes_from_idmap(idmap: jax.Array, g: int) -> jax.Array:
    """(B,S,S) id map -> (B,G,4) normalized xywh from instance extents."""
    b, s, _ = idmap.shape
    ids = jnp.arange(1, g + 1)
    onehot = idmap[:, None, :, :] == ids[None, :, None, None]  # (B,G,S,S)
    rows = jnp.any(onehot, axis=3)                             # (B,G,S)
    cols = jnp.any(onehot, axis=2)
    yy = jnp.arange(s, dtype=jnp.float32)
    big = jnp.float32(s)
    y1 = jnp.min(jnp.where(rows, yy, big), axis=-1)
    y2 = jnp.max(jnp.where(rows, yy + 1, 0.0), axis=-1)
    x1 = jnp.min(jnp.where(cols, yy, big), axis=-1)
    x2 = jnp.max(jnp.where(cols, yy + 1, 0.0), axis=-1)
    any_px = jnp.any(onehot, axis=(2, 3))
    w = jnp.clip(x2 - x1, 0) / s
    h = jnp.clip(y2 - y1, 0) / s
    cx = (x1 + x2) / 2 / s
    cy = (y1 + y2) / 2 / s
    out = jnp.stack([cx, cy, w, h], axis=-1)
    return out * any_px[..., None]


def masks_at_proto_res(idmap: jax.Array, g: int, ratio: int = 4) -> jax.Array:
    """(B,S,S) -> per-instance float masks (B,G,S/r,S/r) (nearest downsample)."""
    small = idmap[:, ::ratio, ::ratio]
    ids = jnp.arange(1, g + 1)
    return (small[:, None] == ids[None, :, None, None]).astype(jnp.float32)


@partial(jax.jit, static_argnames=("hyp", "g_out", "mask_ratio", "use_mosaic"))
def augment_batch(img: jax.Array, idmap: jax.Array, cls: jax.Array,
                  valid: jax.Array, key: jax.Array, hyp: AugHyp = AugHyp(),
                  g_out: int = 16, mask_ratio: int = 4,
                  use_mosaic: bool = True) -> Dict[str, jax.Array]:
    """Full train-time pipeline. img float32 [0,1] (B,S,S,C); returns the loss
    batch: img, cls (B,G), bboxes xywh-norm, valid, masks (proto res)."""
    b, s, _, _ = img.shape
    keys = jax.random.split(key, 10)

    if use_mosaic and hyp.mosaic > 0:
        canvas, mcanvas, cls, valid = mosaic4(img, idmap, cls, valid, keys[0])
        in_size = 2 * s
        # per-image gate: with prob (1-mosaic) fall back to a centered single
        # image canvas (pad to 2S)
        single = jnp.full_like(canvas, GRAY)
        single = jax.lax.dynamic_update_slice(
            single, img, (0, s // 2, s // 2, 0))
        m_single = jnp.zeros_like(mcanvas)
        m_single = jax.lax.dynamic_update_slice(
            m_single, idmap, (0, s // 2, s // 2))
        use = jax.random.uniform(keys[1], (b,)) < hyp.mosaic
        canvas = jnp.where(use[:, None, None, None], canvas, single)
        mcanvas = jnp.where(use[:, None, None], mcanvas, m_single)
        g4 = cls.shape[1]
        keep_first = jnp.arange(g4) < (g4 // 4)
        valid = jnp.where(use[:, None], valid, valid * keep_first[None, :])
    else:
        canvas, mcanvas = img, idmap
        in_size = s

    # affine back to S: separable (contiguous takes) when the hyp can't
    # produce cross terms; the general gather warp only for rotation/shear
    minvs = jax.vmap(lambda k: _affine_inverse_params(k, hyp, in_size, s))(
        jax.random.split(keys[2], b))
    warp = (affine_warp_separable
            if hyp.degrees == 0 and hyp.shear == 0 else affine_warp)
    img, idmap = jax.vmap(lambda im, mm, mv: warp(im, mm, mv, s))(
        canvas, mcanvas, minvs)

    if hyp.mixup > 0:   # static gate: p=0 must not double the label slots
        img, idmap, cls, valid = mixup(img, idmap, cls, valid, keys[3],
                                       hyp.mixup)
    if hyp.cutmix > 0:
        img, idmap, cls, valid = cutmix(img, idmap, cls, valid, keys[9],
                                        hyp.cutmix)
    if hyp.copy_paste > 0:
        kcp = jax.random.fold_in(keys[9], 1)
        img, idmap, cls, valid = copy_paste_flip(img, idmap, cls, valid, kcp,
                                                 hyp.copy_paste)

    img = random_resolution(img, jax.random.fold_in(keys[4], 1), hyp)
    img = gaussian_noise_per_channel(img, keys[4], hyp)
    img = mild_gaussian_blur(img, keys[5], hyp)
    img = random_bias_field(img, keys[6], hyp)
    img = random_hsv(img, keys[7], hyp)
    img, idmap = random_flips(img, idmap, keys[8], hyp)

    idmap, cls, valid = reduce_instances(idmap, cls, valid, g_out)
    bboxes = boxes_from_idmap(idmap, g_out)
    masks = masks_at_proto_res(idmap, g_out, mask_ratio)
    valid = valid & (bboxes[..., 2] > 0) & (bboxes[..., 3] > 0)
    return {"img": img, "cls": cls, "bboxes": bboxes,
            "valid": valid, "masks": masks}
