"""Probe: does XLA lower int8 convs/matmuls to native int8 MXU ops on v5e,
and what do they gain over bf16 at bandwidth-bound YOLO shapes?

Gates the int8-inference-mode project (CLAUDE.md headroom list).
"""
import time
import jax
import jax.numpy as jnp


def slope(fn, args, iters=24, warmup=3):
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


def conv(x, w, s=1, pet=jnp.float32):
    p = (w.shape[0] // 2, w.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, w, (s, s), (p, p), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet)


def main():
    rng = jax.random.key(0)
    # (name, x shape, kernel k, cout, stride) — bandwidth-bound + compute-bound
    cases = [
        ("proto-cv2 160sq 3x3 c32", (128, 160, 160, 32), 3, 32, 1),
        ("neck 1x1 80sq 256->128", (128, 80, 80, 256), 1, 128, 1),
        ("bb 3x3 40sq 128->128", (128, 40, 40, 128), 3, 128, 1),
    ]
    for name, xs, k, co, s in cases:
        kx, kw = jax.random.split(jax.random.fold_in(rng, hash(name) % 1000))
        xb = jax.random.normal(kx, xs, jnp.bfloat16)
        wb = jax.random.normal(kw, (k, k, xs[-1], co), jnp.bfloat16)
        xi = (jax.random.normal(kx, xs) * 20).astype(jnp.int8)
        wi = (jax.random.normal(kw, (k, k, xs[-1], co)) * 20).astype(jnp.int8)

        f_bf = jax.jit(lambda x, w: conv(x, w, s, jnp.float32).astype(jnp.bfloat16))
        # int8 in, int32 accum, requantize epilogue to int8 (realistic chain)
        f_i8 = jax.jit(lambda x, w: jnp.clip(
            conv(x, w, s, jnp.int32) // 64, -128, 127).astype(jnp.int8))
        try:
            t_i8 = slope(f_i8, (xi, wi))
        except Exception as e:
            t_i8 = float("nan")
            print(f"{name}: int8 FAILED: {str(e)[:120]}")
        t_bf = slope(f_bf, (xb, wb))
        print(f"{name}: bf16 {t_bf*1e3:.3f}ms int8 {t_i8*1e3:.3f}ms "
              f"ratio {t_bf/t_i8 if t_i8 == t_i8 else float('nan'):.2f}x")


if __name__ == "__main__":
    main()
