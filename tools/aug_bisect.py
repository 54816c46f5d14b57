"""Per-stage timing of the on-device augmentation pipeline (data/augment.py)
at the detector-train shape (b32/160): each stage jitted alone on
representative inputs, slope-timed.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/aug_bisect.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.data import augment as A


def slope(fn, args, iters=24):
    sumfn = jax.jit(
        lambda o: sum(jnp.sum(t.astype(jnp.float32))
                      for t in jax.tree_util.tree_leaves(o)))

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
    return max((tn - t1) / iters, 1e-9) * 1e3


def main(b=32, s=160, g=8, g_out=8):
    rng = np.random.default_rng(0)
    hyp = A.AugHyp()
    img = jnp.asarray(rng.random((b, s, s, 4)).astype(np.float32))
    big = jnp.asarray(rng.random((b, 2 * s, 2 * s, 4)).astype(np.float32))
    idm = jnp.asarray(rng.integers(0, g + 1, (b, s, s)).astype(np.int32))
    bigid = jnp.asarray(
        rng.integers(0, 4 * g + 1, (b, 2 * s, 2 * s)).astype(np.int32))
    cls = jnp.zeros((b, g), jnp.int32)
    val = jnp.ones((b, g), bool)
    key = jax.random.key(0)
    keys = jax.random.split(key, 8)
    minvs = jax.vmap(lambda k: A._affine_inverse_params(k, hyp, 2 * s, s))(
        jax.random.split(keys[0], b))

    stages = {
        "mosaic4": (jax.jit(lambda i, m, c, v, k: A.mosaic4(i, m, c, v, k)),
                    (img, idm, cls, val, keys[1])),
        "warp_sep_2s": (jax.jit(lambda i, m, mv: jax.vmap(
            lambda a, bb, cc: A.affine_warp_separable(a, bb, cc, s))(i, m, mv)),
            (big, bigid, minvs)),
        "noise": (jax.jit(lambda i, k: A.gaussian_noise_per_channel(i, k, hyp)),
                  (img, keys[2])),
        "blur": (jax.jit(lambda i, k: A.mild_gaussian_blur(i, k, hyp)),
                 (img, keys[3])),
        "bias": (jax.jit(lambda i, k: A.random_bias_field(i, k, hyp)),
                 (img, keys[4])),
        "flips": (jax.jit(lambda i, m, k: A.random_flips(i, m, k, hyp)),
                  (img, idm, keys[5])),
        "reduce_g32": (jax.jit(lambda m, c, v: A.reduce_instances(
            m, jnp.tile(c, (1, 4)), jnp.tile(v, (1, 4)), g_out)),
            (jnp.asarray(rng.integers(0, 4 * g + 1, (b, s, s)).astype(np.int32)),
             cls, val)),
        "boxes": (jax.jit(lambda m: A.boxes_from_idmap(m, g_out)), (idm,)),
        "masks": (jax.jit(lambda m: A.masks_at_proto_res(m, g_out, 4)), (idm,)),
    }
    for name, (f, a) in stages.items():
        print(f"{name:<14} {slope(f, a):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
