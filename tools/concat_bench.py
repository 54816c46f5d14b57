"""Microbench: is conv1x1(concat(a,b)) slower than split-GEMM sum on TPU?

Decides whether lazy-concat (split the consumer's 1x1 kernel and sum two
GEMMs) is worth wiring into the graph executor. Run on the real chip.
"""
import time
import jax
import jax.numpy as jnp


def slope(fn, args, iters=24, warmup=3):
    sumfn = jax.jit(lambda o: jnp.sum(o))

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


def conv1x1(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    dt = jnp.bfloat16
    shapes = [
        ("L13", (128, 80, 80, 128), (128, 80, 80, 128), 128),
        ("L10", (128, 40, 40, 256), (128, 40, 40, 128), 128),
        ("L16", (128, 40, 40, 64), (128, 40, 40, 128), 128),
        ("blk-int", (128, 160, 160, 16), (128, 160, 160, 32), 64),
    ]
    rng = jax.random.key(0)
    for name, sa, sb, cout in shapes:
        ka, kb, kw = jax.random.split(rng, 3)
        a = jax.random.normal(ka, sa, dt)
        b = jax.random.normal(kb, sb, dt)
        ca, cb = sa[-1], sb[-1]
        w = jax.random.normal(kw, (1, 1, ca + cb, cout), dt)

        f_cat = jax.jit(lambda a, b, w: jnp.maximum(
            conv1x1(jnp.concatenate([a, b], axis=-1), w), 0))
        f_split = jax.jit(lambda a, b, w: jnp.maximum(
            (conv1x1(a, w[:, :, :ca]) + conv1x1(b, w[:, :, ca:])), 0))

        t_cat = slope(f_cat, (a, b, w))
        t_split = slope(f_split, (a, b, w))
        bytes_cat = 2 * (a.size + b.size) * 2  # extra concat traffic, bf16
        print(f"{name}: concat {t_cat*1e3:.3f}ms split {t_split*1e3:.3f}ms "
              f"(theoretical extra {bytes_cat/528e9*1e3:.3f}ms)")


if __name__ == "__main__":
    main()
