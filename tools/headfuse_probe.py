"""Time the full Segment head (b128/640 v12n features, bf16) with and
without the eval entry-conv fusion (fuse_entry flag) on the real chip."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.nn.heads import Segment


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


def main():
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.normal(0, 0.5, (128, 80, 80, 64)).astype(np.float32)).astype(dt),
             jnp.asarray(rng.normal(0, 0.5, (128, 40, 40, 128)).astype(np.float32)).astype(dt),
             jnp.asarray(rng.normal(0, 0.5, (128, 20, 20, 256)).astype(np.float32)).astype(dt)]
    small = [f[:2] for f in feats]
    for fuse, fuse_cls in ((False, False), (True, False), (True, True)):
        seg = Segment(nc=1, nm=32, npr=64, dtype=dt, fuse_entry=fuse,
                      fuse_cls_entry=fuse_cls)
        v = jax.jit(lambda k, f: seg.init(k, f, train=False))(
            jax.random.key(0), small)
        print(f"init done fuse={fuse} cls={fuse_cls}", flush=True)
        f = jax.jit(lambda v, f: seg.apply(v, f, train=False))
        ms = slope(f, (v, feats)) * 1e3
        print(f"Segment head b128 fuse_entry={fuse} "
              f"fuse_cls_entry={fuse_cls}: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
