"""Bisect INSIDE the qkv-fused attention kernel at the L6 shape
(g=512 bands, n=400 tokens, c=64, heads=2, bf16, gb=2): which stage of
qkv-GEMM -> masked S dot -> softmax -> masked O dot -> head-sum eats the
1.125 ms (vs ~0.3 ms compute+traffic bound)?

Each variant keeps the SAME block specs / grid / IO so differences are pure
kernel-interior cost. Also measures the ABlock plumbing with the attention
stubbed to identity (the staged-parts sum is 1.70 ms but the chained block
is 2.13 — where does the 0.43 go?).
"""
import functools
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


G, N, C, HEADS, GB = 512, 400, 64, 2, 2
SCALE = (C // HEADS) ** -0.5


def make_kernel(stage):
    def kern(x_ref, w_ref, b_ref, o_ref, v_ref):
        x = x_ref[:]
        w = w_ref[:]
        b = b_ref[:]
        gb, n, c = x.shape
        qkv = jax.lax.dot_general(
            x, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b[None]
        qkv = qkv.astype(x.dtype)
        q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
        v_ref[:] = v
        if stage == "qkv":
            o_ref[:] = q
            return
        hd = c // HEADS
        ch = jax.lax.broadcasted_iota(jnp.int32, (HEADS, 1, c), 2) // hd
        hh = jax.lax.broadcasted_iota(jnp.int32, (HEADS, 1, c), 0)
        mask = (ch == hh).astype(q.dtype)
        qm = (q[:, None] * mask[None]).reshape(gb * HEADS, n, c)
        km = jnp.broadcast_to(k[:, None], (gb, HEADS, n, c)).reshape(gb * HEADS, n, c)
        s = jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * SCALE
        if stage == "sdot":
            o_ref[:] = jnp.sum(s.reshape(gb, HEADS, n, n), axis=(1, 3))[..., None].astype(o_ref.dtype) + q
            return
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        if stage == "softmax":
            o_ref[:] = jnp.sum(e.reshape(gb, HEADS, n, n), axis=(1, 3))[..., None].astype(o_ref.dtype) + q
            return
        p = e.astype(v.dtype)
        vm = (v[:, None] * mask[None]).reshape(gb * HEADS, n, c)
        o_part = jax.lax.dot_general(
            p, vm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o = jnp.sum((o_part / denom).reshape(gb, HEADS, n, c), axis=1)
        o_ref[:] = o.astype(o_ref.dtype)
    return kern


def build(stage):
    block = pl.BlockSpec((GB, N, C), lambda i: (i, 0, 0))
    wspec = pl.BlockSpec((C, 3 * C), lambda i: (0, 0))
    bspec = pl.BlockSpec((1, 3 * C), lambda i: (0, 0))

    @jax.jit
    def f(x, w, b):
        return pl.pallas_call(
            make_kernel(stage),
            grid=(G // GB,),
            in_specs=[block, wspec, bspec],
            out_specs=(block, block),
            out_shape=(jax.ShapeDtypeStruct((G, N, C), x.dtype),
                       jax.ShapeDtypeStruct((G, N, C), x.dtype)),
        )(x, w, b)
    return f


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.1, s).astype(np.float32))
    x = mk(G, N, C).astype(dt)
    w = mk(C, 3 * C).astype(dt)
    b = mk(1, 3 * C)

    for stage in ("qkv", "sdot", "softmax", "full"):
        f = build(stage)
        print(f"kernel[{stage}]: {slope(f, (x, w, b)) * 1e3:.3f} ms", flush=True)

    # gb sweep on the full kernel
    global GB
    for gb in (1, 2, 4):
        GB = gb
        try:
            f = build("full")
            print(f"full gb={gb}: {slope(f, (x, w, b)) * 1e3:.3f} ms", flush=True)
        except Exception as exc:  # OOM etc.
            print(f"full gb={gb}: FAIL {type(exc).__name__}", flush=True)
    GB = 2

    # ABlock plumbing with attention stubbed out (identity): what the chain
    # costs with a zero-cost attention. 4x chain comparison vs l6_bisect.
    B, HW, c_ = 128, 40, C
    wpe = mk(7, 7, 1, c_)
    wproj = mk(1, 1, c_, c_)
    wm1, wm2 = mk(1, 1, c_, 2 * c_), mk(1, 1, 2 * c_, c_)

    def conv(x, w, g=1):
        p = (w.shape[0] // 2,) * 2
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), (p, p), dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=g, preferred_element_type=jnp.float32)

    import flax.linen as nn

    def ablock_stub(x):
        out, v = x, x   # attention stubbed to identity
        pe = conv(v, wpe.astype(dt), g=c_).astype(dt)
        x = x + conv(out + pe, wproj.astype(dt)).astype(dt)
        y = nn.silu(conv(x, wm1.astype(dt))).astype(dt)
        return x + conv(y, wm2.astype(dt)).astype(dt)

    xs = mk(B, HW, HW, c_).astype(dt)
    f4 = jax.jit(lambda t: ablock_stub(ablock_stub(ablock_stub(ablock_stub(t)))))
    print(f"4x ABlock chain, attention stubbed: {slope(f4, (xs,)) * 1e3:.3f} ms",
          flush=True)

    # real kernel inside the chain (same as production path)
    from yolou_tpu.ops.pallas_attn import area_attention_qkv_fused
    wq, bq = mk(c_, 3 * c_).astype(dt), mk(1, 3 * c_)
    area = 4

    def ablock_real(x):
        xt = x.reshape(B * area, HW * HW // area, c_)
        out, v = area_attention_qkv_fused(xt, wq, bq, HEADS)
        out = out.reshape(B, HW, HW, c_).astype(dt)
        v = v.reshape(B, HW, HW, c_).astype(dt)
        pe = conv(v, wpe.astype(dt), g=c_).astype(dt)
        x = x + conv(out + pe, wproj.astype(dt)).astype(dt)
        y = nn.silu(conv(x, wm1.astype(dt))).astype(dt)
        return x + conv(y, wm2.astype(dt)).astype(dt)

    f4r = jax.jit(lambda t: ablock_real(ablock_real(ablock_real(ablock_real(t)))))
    print(f"4x ABlock chain, real kernel: {slope(f4r, (xs,)) * 1e3:.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
