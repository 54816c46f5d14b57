"""Can a 3x3 conv run near-XLA-speed INSIDE a Pallas kernel on v5e?

The round-1 dead end ("per-image Pallas 3x3-conv chains: 65ms vs 12.3 XLA")
used per-tap sublane-shifted slab loads. Hypothesis: the fix is (a) only 3
W-shifted copies (sublane relayouts), H shifts free on the outer dim, and
(b) per-tap GEMM accumulation at K=64 (or an im2col concat to K=576).

Shape: Detect/Proto workhorse — 3x3 64->64 @ 80^2, b128, bf16.
XLA baseline: 0.37 ms (~compute bound). If the in-kernel conv lands within
~2x of XLA, fused multi-conv tails (Proto convT+3x3+1x1, Detect branches)
win on eliminated HBM round-trips; if it's 5x, the dead end stands.
"""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


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


B, H, W, C, CO = 128, 80, 80, 64, 64


def conv_kernel_tapgemm(x_ref, w_ref, o_ref):
    """3 W-shifted copies; per (di,dj) GEMM (H*W, C) @ (C, CO), accumulate."""
    x = x_ref[0]                      # (H, W, C)
    w = w_ref[:]                      # (3, 3, C, CO)
    zW = jnp.zeros((H, 1, C), x.dtype)
    zH = jnp.zeros((1, W + 2, C), x.dtype)
    xp = jnp.concatenate([zW, x, zW], axis=1)       # (H, W+2, C)
    xp = jnp.concatenate([zH, xp, zH], axis=0)      # (H+2, W+2, C)
    acc = None
    for dj in range(3):
        col = xp[:, dj:dj + W, :]                   # (H+2, W, C) 1 relayout
        for di in range(3):
            lhs = col[di:di + H].reshape(H * W, C)
            part = jax.lax.dot_general(
                lhs, w[di, dj], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    o_ref[0] = acc.reshape(H, W, CO).astype(o_ref.dtype)


def conv_kernel_im2col(x_ref, w_ref, o_ref):
    """Lane-concat 9 shifted views to (H*W, 9C), one K=576 GEMM."""
    x = x_ref[0]
    w = w_ref[:].reshape(9 * C, CO)
    zW = jnp.zeros((H, 1, C), x.dtype)
    zH = jnp.zeros((1, W + 2, C), x.dtype)
    xp = jnp.concatenate([zW, x, zW], axis=1)
    xp = jnp.concatenate([zH, xp, zH], axis=0)
    views = []
    for di in range(3):
        for dj in range(3):
            views.append(xp[di:di + H, dj:dj + W, :].reshape(H * W, C))
    lhs = jnp.concatenate(views, axis=-1)           # (H*W, 9C)
    acc = jax.lax.dot_general(lhs, w, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(H, W, CO).astype(o_ref.dtype)


def build(kern, gb=1):
    xspec = pl.BlockSpec((gb, H, W, C), lambda i: (i, 0, 0, 0))
    wspec = pl.BlockSpec((3, 3, C, CO), lambda i: (0, 0, 0, 0))

    @jax.jit
    def f(x, w):
        return pl.pallas_call(
            kern,
            grid=(B // gb,),
            in_specs=[xspec, wspec],
            out_specs=pl.BlockSpec((gb, H, W, CO), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((B, H, W, CO), x.dtype),
        )(x, w)
    return f


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, (B, H, W, C)).astype(np.float32)).astype(dt)
    w = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, CO)).astype(np.float32)).astype(dt)

    @jax.jit
    def xla(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(dt)

    # correctness first
    ref = np.asarray(xla(x[:2], w), np.float32)
    which = sys.argv[1] if len(sys.argv) > 1 else "tapgemm"
    kern = {"tapgemm": conv_kernel_tapgemm, "im2col": conv_kernel_im2col}[which]
    got = np.asarray(build(kern)(x, w)[:2], np.float32)
    err = np.abs(ref - got).max()
    print(f"{which}: max|d| vs XLA = {err:.2e}", flush=True)

    print(f"XLA conv3x3: {slope(xla, (x, w)) * 1e3:.3f} ms", flush=True)
    print(f"pallas[{which}]: {slope(build(kern), (x, w)) * 1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
