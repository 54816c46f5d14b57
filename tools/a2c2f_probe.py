"""Probe the whole-A2C2f mega-kernel (ops/pallas_a2c2f.py): parity vs the
pure-XLA reference composition, then device timing at the production shapes:
L6 (128,40,40,256)->128ch c_=64 area=4 heads=2, L8 (128,20,20,512)->256ch
c_=128 area=1 heads=4. Compare against the current staged path cost
(l6_bisect: 8.3ms L6)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.ops.pallas_a2c2f import a2c2f_fused, a2c2f_reference


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


def make_weights(rng, cin, c_, c2, n_stages, dt):
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.05, s).astype(np.float32))
    ws = [mk(cin, c_).astype(dt), mk(c_)]
    for _ in range(2 * n_stages):
        ws += [mk(c_, 3 * c_).astype(dt), mk(3 * c_),
               mk(7, 7, c_), mk(c_),
               mk(c_, c_).astype(dt), mk(c_),
               mk(c_, 2 * c_).astype(dt), mk(2 * c_),
               mk(2 * c_, c_).astype(dt), mk(c_)]
    ws += [mk((n_stages + 1) * c_, c2).astype(dt), mk(c2)]
    return ws


def parity(B, H, W, cin, c_, c2, n_stages, area, heads):
    rng = np.random.default_rng(0)
    dt = jnp.float32
    x = jnp.asarray(rng.normal(0, 0.5, (B, H, W, cin)).astype(np.float32))
    ws = make_weights(rng, cin, c_, c2, n_stages, dt)
    ref = a2c2f_reference(x, ws, n_stages, area, heads)
    got = a2c2f_fused(x, ws, n_stages, area, heads, interpret=True)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"parity f32 (B{B} {H}x{W} cin{cin} c{c_} a{area} h{heads}): "
          f"max|d|={err:.2e}", flush=True)
    return err


def timing(B, H, W, cin, c_, c2, n_stages, area, heads, label):
    rng = np.random.default_rng(1)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(0, 0.5, (B, H, W, cin)).astype(np.float32)).astype(dt)
    ws = make_weights(rng, cin, c_, c2, n_stages, dt)
    import sys
    abl = [a[len("--ablate="):] for a in sys.argv if a.startswith("--ablate=")]
    ab = abl[0] if abl else ""
    f = jax.jit(lambda x, *w: a2c2f_fused(x, list(w), n_stages, area,
                                          heads, ablate=ab))
    ms = slope(f, (x, *ws)) * 1e3
    print(f"{label} fused[ablate={ab or 'none'}]: {ms:.3f} ms", flush=True)


if __name__ == "__main__":
    import sys
    if "--parity" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        e1 = parity(2, 16, 16, 32, 32, 64, 2, 4, 1)
        e2 = parity(1, 8, 8, 24, 64, 48, 1, 1, 2)
        assert max(e1, e2) < 2e-5, "parity FAIL"
        print("parity OK")
    else:
        timing(128, 40, 40, 256, 64, 128, 2, 4, 2, "L6 b128")
        timing(128, 20, 20, 512, 128, 256, 2, 1, 4, "L8 b128")
