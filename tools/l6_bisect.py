"""Bisect L6 A2C2f (8.3ms at b128/640, the largest single block) into its
per-op device times: cv1, per-ABlock [qkv+attn kernel, pe dw7x7, proj 1x1,
residual, mlp1, mlp2, residual], cv2. Goal: find where the ~5ms over the
~3ms HBM-traffic SOL goes. Shapes: L6 input (128, 40, 40, 256)->(.., 128),
hidden c_=64, heads=2, area=4 for v12n (models/specs.py row 6).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


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


def conv(x, w, g=1):
    p = (w.shape[0] // 2,) * 2
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), (p, p), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=g, preferred_element_type=jnp.float32)


def main():
    dt = jnp.bfloat16
    B, HW, Cin, c_ = 128, 40, 256, 64
    heads, area = 2, 4
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.1, s).astype(np.float32))

    xin = mk(B, HW, HW, Cin).astype(dt)
    x = mk(B, HW, HW, c_).astype(dt)

    from yolou_tpu.ops.pallas_attn import area_attention_qkv_fused

    wqkv, bqkv = mk(c_, 3 * c_), mk(1, 3 * c_)
    wpe = mk(7, 7, 1, c_)
    wproj = mk(1, 1, c_, c_)
    wm1, wm2 = mk(1, 1, c_, 2 * c_), mk(1, 1, 2 * c_, c_)
    wcv1 = mk(1, 1, Cin, c_)
    wcv2 = mk(1, 1, 3 * c_, 128)

    n_tok = HW * HW

    def attn_part(x):
        xt = x.reshape(B * area, n_tok // area, c_)
        out, v = area_attention_qkv_fused(xt, wqkv.astype(dt), bqkv, heads)
        return (out.reshape(B, HW, HW, c_).astype(dt),
                v.reshape(B, HW, HW, c_).astype(dt))

    def pe_proj(out, v, x):
        pe = conv(v, wpe.astype(dt), g=c_).astype(dt)
        return x + conv(out + pe, wproj.astype(dt)).astype(dt)

    def mlp(x):
        y = nn.silu(conv(x, wm1.astype(dt))).astype(dt)
        return x + conv(y, wm2.astype(dt)).astype(dt)

    def ablock(x):
        out, v = attn_part(x)
        x = pe_proj(out, v, x)
        return mlp(x)

    cases = {
        "cv1 1x1 256->64": jax.jit(lambda: nn.silu(conv(xin, wcv1.astype(dt))).astype(dt)),
        "attn(qkv-fused kernel)": jax.jit(lambda: attn_part(x)),
        "pe dw7x7 + proj + res": jax.jit(lambda: pe_proj(x, x, x)),
        "mlp (x2) + res": jax.jit(lambda: mlp(x)),
        "full ABlock": jax.jit(lambda: ablock(x)),
        "4x ABlock chain": jax.jit(lambda: ablock(ablock(ablock(ablock(x))))),
        "cv2 1x1 192->128 (split3)": jax.jit(
            lambda: conv(jnp.concatenate([x, x, x], -1), wcv2.astype(dt)).astype(dt)),
    }
    for name, f in cases.items():
        print(f"{name}: {slope(f, ()) * 1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
