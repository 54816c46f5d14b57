"""Microbench: dw7x7 'pe' conv INSIDE a Pallas kernel at the L6 shape —
(128 imgs, 40x40, 64ch) bf16 in / fp32 accum — isolated from the A2C2f
mega-kernel. In-situ it costs ~1.2ms/block (4.8ms over 4 blocks) vs a
~0.35ms lane-slot estimate; which formulation closes the gap?

Variants:
  taps    — current: pad HxW, 7 W-shifted col slices, 49 fp32 FMAs
  wfold   — W-pairs folded into lanes (40,23,128): full-lane FMAs,
            even/odd alignment arrays, 8x7 taps
  bf16acc — taps but bf16 multiply and accumulate (parity loss measured)
  unroll  — taps but accumulate per-dj then sum (shorter dep chains)
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

B, H, W, C = 128, 40, 40, 64


def slope(fn, args, iters=24):
    sumfn = jax.jit(lambda o: jnp.sum(jax.tree_util.tree_leaves(o)[0].astype(jnp.float32)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return max((tn - t1) / iters, 1e-9)


def pe_taps(v, w, acc_dtype=jnp.float32):
    zH = jnp.zeros((3, W, C), v.dtype)
    zW = jnp.zeros((H + 6, 3, C), v.dtype)
    vp = jnp.concatenate([zH, v, zH], axis=0)
    vp = jnp.concatenate([zW, vp, zW], axis=1)
    acc = None
    for dj in range(7):
        col = vp[:, dj:dj + W, :]
        for di in range(7):
            term = col[di:di + H].astype(acc_dtype) * w[di, dj][None, None].astype(acc_dtype)
            acc = term if acc is None else acc + term
    return acc.astype(jnp.float32)


def pe_unroll(v, w):
    zH = jnp.zeros((3, W, C), v.dtype)
    zW = jnp.zeros((H + 6, 3, C), v.dtype)
    vp = jnp.concatenate([zH, v, zH], axis=0)
    vp = jnp.concatenate([zW, vp, zW], axis=1)
    accs = []
    for dj in range(7):
        col = vp[:, dj:dj + W, :]
        a = None
        for di in range(7):
            term = col[di:di + H].astype(jnp.float32) * w[di, dj][None, None]
            a = term if a is None else a + term
        accs.append(a)
    return functools.reduce(lambda a, b: a + b, accs)


def pe_wfold(v, w):
    """Fold W-pairs into lanes: (H, W, C) -> (H, W//2, 2C). Even-dj taps use
    the folded array; odd-dj taps use a half-lane-swapped variant. Per output
    half the weight differs, so each of the 7 dj maps to one folded source
    with a (2C,) weight vector; H taps stay outer-dim slices."""
    # pad W by 4 on each side so W+8 is even and slices stay in range
    zH = jnp.zeros((3, W, C), v.dtype)
    vp = jnp.concatenate([zH, v, zH], axis=0)            # (H+6, W, C)
    zW = jnp.zeros((H + 6, 4, C), v.dtype)
    vp = jnp.concatenate([zW, vp, zW], axis=1)           # (H+6, W+8, C)
    Wp = W + 8
    even = vp.reshape(H + 6, Wp // 2, 2 * C)             # lanes [col 2w | col 2w+1]
    # odd alignment: lanes [col 2w+1 | col 2w+2]
    odd = jnp.concatenate([even[:, :, C:],
                           jnp.concatenate([even[:, 1:, :C],
                                            jnp.zeros((H + 6, 1, C), v.dtype)],
                                           axis=1)], axis=-1)
    acc = None
    for dj in range(7):
        # output col 2w needs source col 2w + dj - 3; with the +4 pad the
        # folded source for (dj-3+4=dj+1): offset o = dj + 1
        o = dj + 1
        src = even if o % 2 == 0 else odd
        start = o // 2
        col = src[:, start:start + W // 2, :]            # (H+6, W/2, 2C)
        wv = jnp.concatenate([w[:, dj], w[:, dj]], axis=-1)  # (7, 2C)
        for di in range(7):
            term = col[di:di + H].astype(jnp.float32) * wv[di][None, None]
            acc = term if acc is None else acc + term
    return acc  # (H, W//2, 2C) folded output


def build(fn, out_c, out_w):
    xspec = pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0))
    wspec = pl.BlockSpec((7, 7, C), lambda i: (0, 0, 0))

    def kern(x_ref, w_ref, o_ref):
        o = fn(x_ref[0], w_ref[:])
        o_ref[0] = o.astype(o_ref.dtype)

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kern,
            grid=(B,),
            in_specs=[xspec, wspec],
            out_specs=pl.BlockSpec((1, H, out_w, out_c), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, out_w, out_c), jnp.float32),
        )(x, w)
    return f


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)).astype(np.float32)).astype(dt)
    w = jnp.asarray(rng.normal(0, 0.1, (7, 7, C)).astype(np.float32))

    @jax.jit
    def xla(v, w):
        return jax.lax.conv_general_dilated(
            v.astype(jnp.float32), w.reshape(7, 7, 1, C), (1, 1),
            ((3, 3), (3, 3)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C)

    ref = np.asarray(xla(v[:2], w))
    fns = {
        "taps": (pe_taps, C, W),
        "unroll": (pe_unroll, C, W),
        "bf16acc": (functools.partial(pe_taps, acc_dtype=jnp.bfloat16), C, W),
        "wfold": (pe_wfold, 2 * C, W // 2),
    }
    which = sys.argv[1] if len(sys.argv) > 1 else "taps"
    fn, oc, ow = fns[which]
    f = build(fn, oc, ow)
    got = np.asarray(f(v, w)[:2])
    if which == "wfold":
        got = got.reshape(2, H, W // 2, 2, C).reshape(2, H, W, C)
    err = np.abs(ref - got).max()
    print(f"{which}: max|d| vs XLA dw7x7 = {err:.2e}", flush=True)
    print(f"XLA dw7x7: {slope(xla, (v, w)) * 1e3:.3f} ms", flush=True)
    print(f"pallas[{which}]: {slope(f, (v, w)) * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
