"""Whole-A2C2f mega-kernel (ops/pallas_a2c2f.py) parity in interpret mode.

The kernel is currently unwired (measured slower than the staged path on
v5e — CLAUDE.md dead-ends), but kept correct as the base for future
attention-stage fusion work: exact vs the pure-XLA reference composition.
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
