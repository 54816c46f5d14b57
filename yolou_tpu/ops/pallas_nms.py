"""Fused IoU + greedy-suppression Pallas kernel for TPU NMS.

The XLA composition in ops/nms.py materializes the (K,K) IoU matrix and the
hit matrix in HBM and re-reads the hit matrix every Jacobi sweep — measured
4.0 ms (iou) + 3.2 ms (sweeps) at b128/K1024 on v5e (tools/nms_bisect.py).
This kernel keeps everything in VMEM: boxes come in once (two layouts, so no
in-kernel transpose), the hit matrix is built block-by-block as bf16 0/1 with
a division-free compare (inter > t*(union+eps)  ⟺  inter/(union+eps) > t,
the exact box_iou threshold), and each Jacobi sweep is a (1,K)x(K,K) MXU
matvec. HBM traffic: K*4 floats in, K out — vs ~K² * sweeps for XLA.

Same fixpoint as ops/nms.py::_suppress_greedy (exact greedy keep-set):
    keep <- valid & ~any_{j<i}(keep[j] & hit[j,i])
bf16 is exact for the 0/1 hit values; the matvec accumulates in f32.

Reference semantics: /root/reference/nms.py:239-296 (torch greedy NMS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_ROW_BLK = 256


def pallas_nms_eligible(k: int) -> bool:
    """VMEM-safe candidate counts (bf16 K'² hit matrix + one (ROW_BLK,K')
    f32 working set under the 16 MB scoped limit after lane padding).
    Unaligned k is padded up inside suppress_greedy_fused — padded entries
    are invalid, have zero area, and can neither hit nor be kept."""
    return 0 < k <= 2048


def _nms_kernel(bs_ref, bl_ref, vc_ref, vl_ref, o_ref, hit_ref, *,
                iou_thres: float, eps: float):
    k = bs_ref.shape[0]
    rb = _ROW_BLK if k % _ROW_BLK == 0 else 128   # k is always 128-aligned
    xj1 = bl_ref[0:1, :]
    yj1 = bl_ref[1:2, :]
    xj2 = bl_ref[2:3, :]
    yj2 = bl_ref[3:4, :]
    area_j = (xj2 - xj1) * (yj2 - yj1)          # (1, K)
    col = jax.lax.broadcasted_iota(jnp.int32, (rb, k), 1)

    def build(blk, _):
        r0 = blk * rb
        xi1 = bs_ref[pl.dslice(r0, rb), 0:1]     # (R, 1) suppressor j
        yi1 = bs_ref[pl.dslice(r0, rb), 1:2]
        xi2 = bs_ref[pl.dslice(r0, rb), 2:3]
        yi2 = bs_ref[pl.dslice(r0, rb), 3:4]
        iw = jnp.maximum(
            jnp.minimum(xi2, xj2) - jnp.maximum(xi1, xj1), 0.0)
        ih = jnp.maximum(
            jnp.minimum(yi2, yj2) - jnp.maximum(yi1, yj1), 0.0)
        inter = iw * ih                               # (R, K)
        union = (xi2 - xi1) * (yi2 - yi1) + area_j - inter
        over = inter > iou_thres * (union + eps)
        row = r0 + jax.lax.broadcasted_iota(jnp.int32, (rb, k), 0)
        vj = vc_ref[pl.dslice(r0, rb), 0:1] > 0.5
        hit = over & (row < col) & vj                 # hit[j, i], j < i
        hit_ref[pl.dslice(r0, rb), :] = hit.astype(jnp.bfloat16)
        return _

    jax.lax.fori_loop(0, k // rb, build, 0)

    valid = vl_ref[0:1, :]                            # (1, K) 0/1 f32

    def cond(state):
        keep, prev, it = state
        return (it < k) & jnp.any(keep != prev)

    def body(state):
        keep, _, it = state
        sup = jnp.dot(keep.astype(jnp.bfloat16), hit_ref[...],
                      preferred_element_type=jnp.float32)   # (1, K)
        new = jnp.where(sup > 0.5, 0.0, valid)
        return new, keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.zeros_like(valid), jnp.int32(0)))
    o_ref[...] = keep


@functools.partial(jax.jit, static_argnames=("iou_thres", "interpret"))
def suppress_greedy_fused(boxes: jax.Array, valid: jax.Array,
                          iou_thres: float,
                          interpret: bool | None = None) -> jax.Array:
    """Greedy NMS keep mask. boxes (K,4) xyxy f32 sorted by descending score,
    valid (K,) bool. Returns keep (K,) bool — identical to
    `_suppress_greedy(box_iou(b, b), valid, t)`. vmap-safe (grid-batched)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    k = boxes.shape[0]
    kp = -(-k // 128) * 128                    # lane-pad; pads can't suppress
    bs = boxes.astype(jnp.float32)
    vf = valid.astype(jnp.float32)
    if kp != k:
        bs = jnp.pad(bs, ((0, kp - k), (0, 0)))
        vf = jnp.pad(vf, (0, kp - k))
    bl = bs.T                                  # (4, K') lane-major twin
    out = pl.pallas_call(
        functools.partial(_nms_kernel, iou_thres=float(iou_thres), eps=1e-7),
        out_shape=jax.ShapeDtypeStruct((1, kp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kp, kp), jnp.bfloat16)] if _HAS_PLTPU
        else [],
        interpret=interpret,
    )(bs, bl, vf[:, None], vf[None, :])
    return out[0, :k] > 0.5
