"""Whole-A2C2f mega-kernel (ops/pallas_a2c2f.py) parity in interpret mode.

Round 3 wired the kernel into A2C2f's eval path behind an OPT-IN
`mega_kernel` flag: pe-early scheduling wins in isolation (L6 7.95 vs 8.3 ms
b128/640 on v5e) but loses in-situ (tools/mega_probe.py: full forward 42.1
vs 32.1 ms), so it stays off in the product surfaces. Covered here: op-level
parity vs the pure-XLA reference composition plus module-level routing
parity (mega path vs staged path over the SAME variables).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolou_tpu.ops.pallas_a2c2f import a2c2f_fused, a2c2f_reference


def _weights(rng, cin, c_, c2, n_stages):
    mk = lambda *s: jnp.asarray(rng.normal(0, 0.05, s).astype(np.float32))
    ws = [mk(cin, c_), mk(c_)]
    for _ in range(2 * n_stages):
        ws += [mk(c_, 3 * c_), mk(3 * c_), mk(7, 7, c_), mk(c_),
               mk(c_, c_), mk(c_), mk(c_, 2 * c_), mk(2 * c_),
               mk(2 * c_, c_), mk(c_)]
    ws += [mk((n_stages + 1) * c_, c2), mk(c2)]
    return ws


@pytest.mark.parametrize("shape,cfg", [
    ((2, 16, 16, 32), dict(c_=32, c2=64, n_stages=2, area=4, heads=1)),
    ((1, 8, 8, 24), dict(c_=64, c2=48, n_stages=1, area=1, heads=2)),
])
@pytest.mark.parametrize("ablate", ["", "early"])
def test_a2c2f_fused_matches_reference(shape, cfg, ablate):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.5, shape).astype(np.float32))
    ws = _weights(rng, shape[-1], cfg["c_"], cfg["c2"], cfg["n_stages"])
    ref = a2c2f_reference(x, ws, cfg["n_stages"], cfg["area"], cfg["heads"])
    got = a2c2f_fused(x, ws, cfg["n_stages"], cfg["area"], cfg["heads"],
                      interpret=True, ablate=ablate)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(got), atol=2e-5)


def test_a2c2f_module_mega_routing_parity():
    """use_pallas=True at an eligible eval shape routes through the
    mega-kernel and must match the staged path over the same variables."""
    from yolou_tpu.nn.attention import A2C2f
    from yolou_tpu.ops.pallas_a2c2f import a2c2f_mega_eligible

    # smallest eligible shape: n=400 tokens, c_=32 (gate sanity first)
    assert a2c2f_mega_eligible(20, 20, 64, 32, 1, 1)
    assert not a2c2f_mega_eligible(5, 5, 512, 128, 1, 4)   # 160-input L8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 20, 20, 64)).astype(np.float32))
    staged = A2C2f(c2=64, n=1, a2=True, area=1, dtype=jnp.float32,
                   use_pallas=False)
    mega = A2C2f(c2=64, n=1, a2=True, area=1, dtype=jnp.float32,
                 use_pallas=True, mega_kernel=True)
    off = A2C2f(c2=64, n=1, a2=True, area=1, dtype=jnp.float32,
                use_pallas=True)   # default: mega stays off
    v = staged.init(jax.random.key(0), x, train=False)
    y0 = staged.apply(v, x, train=False)
    y1 = mega.apply(v, x, train=False)          # same tree, folded mirrors
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)
    y3 = off.apply(v, x, train=False)           # default routing: no mega
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y3), atol=2e-5)
    # train path over the same variables still runs the staged modules
    y2, _ = mega.apply(v, x, train=True, mutable=["batch_stats"])
    assert y2.shape == y0.shape
