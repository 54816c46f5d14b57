"""Round-3 aug follow-up probe: full augment_batch timing, threefry vs rbg
RNG, and stage-level suspects at the detector-train shape (b32/160, g=8).

The TRAIN_BISECT artifact shows aug_mosaic 10.19 ms / aug_nomosaic 8.43 ms —
53% of the fused train step. Naive traffic accounting says ~4-5 ms, so ~2x
is overhead; the two suspects are threefry random bits (jax.random.normal on
(32,160,160,4) is ~30 VPU ops/element) and the photometric stages' full-batch
compute behind per-image probability gates.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/aug_probe2.py
"""
import json
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


def step(msg):
    print(f"[aug_probe2] {msg}", flush=True)


def main(b=32, s=160, g=8):
    rng = np.random.default_rng(0)
    hyp = A.AugHyp()
    img = jnp.asarray(rng.random((b, s, s, 4)).astype(np.float32))
    idm = jnp.asarray(rng.integers(0, g + 1, (b, s, s)).astype(np.int32))
    cls = jnp.zeros((b, g), jnp.int32)
    val = jnp.ones((b, g), bool)
    key_tf = jax.random.key(0)
    key_rbg = jax.random.key(0, impl="rbg")

    results = {}

    full = jax.jit(lambda i, m, c, v, k: A.augment_batch(
        i, m, c, v, k, hyp, g_out=g, mask_ratio=4, use_mosaic=True))
    full_nm = jax.jit(lambda i, m, c, v, k: A.augment_batch(
        i, m, c, v, k, hyp, g_out=g, mask_ratio=4, use_mosaic=False))

    for name, f, k in (("full_mosaic_threefry", full, key_tf),
                       ("full_mosaic_rbg", full, key_rbg),
                       ("full_nomosaic_threefry", full_nm, key_tf),
                       ("full_nomosaic_rbg", full_nm, key_rbg)):
        step(f"compile+time {name}")
        results[name] = slope(f, (img, idm, cls, val, k))
        step(f"{name} {results[name]:.3f} ms")

    # stage-level: the RNG-heavy stages under both key impls
    stages = {
        "noise": lambda i, k: A.gaussian_noise_per_channel(i, k, hyp),
        "blur": lambda i, k: A.mild_gaussian_blur(i, k, hyp),
        "bias": lambda i, k: A.random_bias_field(i, k, hyp),
    }
    for name, f in stages.items():
        jf = jax.jit(f)
        for impl, k in (("threefry", key_tf), ("rbg", key_rbg)):
            step(f"compile+time {name}_{impl}")
            results[f"{name}_{impl}"] = slope(jf, (img, k))
            step(f"{name}_{impl} {results[f'{name}_{impl}']:.3f} ms")

    # raw RNG cost at the big shape
    nrm = jax.jit(lambda k: jax.random.normal(k, (b, s, s, 4)))
    results["normal_threefry"] = slope(nrm, (key_tf,))
    results["normal_rbg"] = slope(nrm, (key_rbg,))
    step(f"normal threefry {results['normal_threefry']:.3f} "
         f"rbg {results['normal_rbg']:.3f} ms")

    # mosaic + warp pair (the 2S-canvas block) for completeness
    def mosaic_warp(i, m, c, v, k):
        k0, k1 = jax.random.split(k)
        canvas, mcanvas, c4, v4 = A.mosaic4(i, m, c, v, k0)
        minvs = jax.vmap(
            lambda kk: A._affine_inverse_params(kk, hyp, 2 * s, s))(
                jax.random.split(k1, b))
        im, mm = jax.vmap(lambda a, bb, mv: A.affine_warp_separable(
            a, bb, mv, s))(canvas, mcanvas, minvs)
        return im, mm, c4, v4

    jmw = jax.jit(mosaic_warp)
    results["mosaic+warp"] = slope(jmw, (img, idm, cls, val, key_tf))
    step(f"mosaic+warp {results['mosaic+warp']:.3f} ms")

    # label finalize block (reduce + boxes + masks) on a post-mosaic idmap
    idm4 = jnp.asarray(rng.integers(0, 4 * g + 1, (b, s, s)).astype(np.int32))
    cls4 = jnp.tile(cls, (1, 4))
    val4 = jnp.tile(val, (1, 4))

    def finalize(m, c, v):
        m2, c2, v2 = A.reduce_instances(m, c, v, g)
        return m2, A.boxes_from_idmap(m2, g), A.masks_at_proto_res(m2, g, 4)

    results["finalize"] = slope(jax.jit(finalize), (idm4, cls4, val4))
    step(f"finalize {results['finalize']:.3f} ms")

    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
