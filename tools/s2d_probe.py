"""Probe: space-to-depth stem (s2d(4) letterbox -> k=2 lane-dense convs for
L0/L1) vs the current native path. Checks exact math first, then times both
chains [u8 -> /255 (+s2d) -> conv0 -> conv1] on the chip.

Premise: the s2d transpose rides the letterbox normalization pass (same HBM
traffic), and the two stem convs become K=256 GEMM-dense convs; L1's output
is natively 160-sq so no exit relayout exists.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp


def slope(fn, args, iters=16, warmup=3):
    sumfn = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0

    for _ in range(warmup):
        run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return max((tn - t1) / iters, 1e-9)


def conv(x, w, s, pad):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)


def s2d(x, b):
    B, H, W, C = x.shape
    x = x.reshape(B, H // b, b, W // b, b, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // b, W // b, b * b * C)


def stem0_s2d_kernel(w0):
    """(3,3,4,c0) -> (2,2, 4*4*4, 2*2*c0): k=2 conv on s2d(4) input producing
    s2d(2) output. Channel orders: in (iy, ix, ci); out (py, px, co)."""
    c0 = w0.shape[-1]
    wp = np.zeros((2, 2, 4, 4, 4, 2, 2, c0), np.float32)
    for py in range(2):
        for px in range(2):
            for ky in range(3):
                for kx in range(3):
                    u, vdx = 2 * py + ky + 3, 2 * px + kx + 3
                    wp[u // 4, vdx // 4, u % 4, vdx % 4, :, py, px, :] = \
                        np.asarray(w0[ky, kx], np.float32)
    return jnp.asarray(wp.reshape(2, 2, 64, 4 * c0))


def stem1_s2d_kernel(w1, c0):
    """(3,3,c0,c1) -> (2,2, 2*2*c0, c1): k=2 conv on s2d(2) input, native out."""
    c1 = w1.shape[-1]
    wp = np.zeros((2, 2, 2, 2, c0, c1), np.float32)
    for ky in range(3):
        for kx in range(3):
            u, vdx = ky + 1, kx + 1
            wp[u // 2, vdx // 2, u % 2, vdx % 2] = np.asarray(w1[ky, kx], np.float32)
    return jnp.asarray(wp.reshape(2, 2, 4 * c0, c1))


def main():
    rng = np.random.default_rng(0)
    B, S, C = 8, 640, 4
    c0, c1 = 16, 32
    imgs = jnp.asarray(rng.integers(0, 255, (B, S, S, C), dtype=np.uint8))
    w0 = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, c0)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(0, 0.1, (3, 3, c0, c1)).astype(np.float32))
    w0p, w1p = stem0_s2d_kernel(w0), stem1_s2d_kernel(w1, c0)

    def native(imgs, w0, w1):
        x = (imgs.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        y0 = conv(x, w0.astype(jnp.bfloat16), 2, ((1, 1), (1, 1))).astype(jnp.bfloat16)
        y0 = jax.nn.silu(y0)
        y1 = conv(y0, w1.astype(jnp.bfloat16), 2, ((1, 1), (1, 1)))
        return y1.astype(jnp.bfloat16)

    def s2d_path(imgs, w0p, w1p):
        x = (imgs.astype(jnp.float32) / 255.0).astype(jnp.bfloat16)
        x = s2d(x, 4)                                      # (B,160,160,64)
        y0 = conv(x, w0p.astype(jnp.bfloat16), 1, ((1, 0), (1, 0)))
        y0 = jax.nn.silu(y0).astype(jnp.bfloat16)          # (B,160,160,64) s2d(2)
        y1 = conv(y0, w1p.astype(jnp.bfloat16), 1, ((1, 0), (1, 0)))
        return y1.astype(jnp.bfloat16)                     # (B,160,160,32)

    f_nat = jax.jit(native)
    f_s2d = jax.jit(s2d_path)

    # --- exactness: s2d output must equal s2d(native output) per phase
    a = np.asarray(f_nat(imgs, w0, w1), np.float32)        # (B,320... wait 160
    bb = np.asarray(f_s2d(imgs, w0p, w1p), np.float32)
    # native: (B,160,160,32); s2d path: (B,160,160,32) directly comparable
    print("exactness max abs diff:", np.abs(a - bb).max(),
          "rel:", np.abs(a - bb).max() / max(np.abs(a).max(), 1e-9))

    B = 128
    imgs = jnp.asarray(rng.integers(0, 255, (B, S, S, C), dtype=np.uint8))
    t_nat = slope(f_nat, (imgs, w0, w1))
    t_s2d = slope(f_s2d, (imgs, w0p, w1p))
    print(f"native chain {t_nat*1e3:.3f}ms  s2d chain {t_s2d*1e3:.3f}ms  "
          f"speedup {t_nat/t_s2d:.2f}x")


if __name__ == "__main__":
    main()
