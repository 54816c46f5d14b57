"""s2d-stem inference mode: exact parity with the native stem on shared
variables (the lane-density rewrite must be a pure evaluation-order change)."""

import jax
import jax.numpy as jnp
import numpy as np

from yolou_tpu.models.yolo import build_yolo
from yolou_tpu.nn.blocks import space_to_depth


def test_s2d_stem_matches_native(rng):
    x = jnp.asarray(rng.random((2, 96, 96, 4)), jnp.float32)
    m0 = build_yolo("yolov12", "n", nc=1, ch=4, task="segment")
    m1 = build_yolo("yolov12", "n", nc=1, ch=4, task="segment", stem_s2d=True)
    v = jax.jit(lambda k, x: m0.init(k, x, train=False))(jax.random.key(0), x)
    o0 = jax.jit(lambda v, x: m0.apply(v, x, train=False).preds)(v, x)
    o1 = jax.jit(lambda v, x: m1.apply(v, x, train=False).preds)(
        v, space_to_depth(x, 4))
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=2e-4, atol=2e-4)


def test_s2d_stem_protos_match(rng):
    x = jnp.asarray(rng.random((1, 96, 96, 4)), jnp.float32)
    m0 = build_yolo("yolov12", "n", nc=1, ch=4, task="segment")
    m1 = build_yolo("yolov12", "n", nc=1, ch=4, task="segment", stem_s2d=True)
    v = jax.jit(lambda k, x: m0.init(k, x, train=False))(jax.random.key(1), x)
    p0 = jax.jit(lambda v, x: m0.apply(v, x, train=False).protos)(v, x)
    p1 = jax.jit(lambda v, x: m1.apply(v, x, train=False).protos)(
        v, space_to_depth(x, 4))
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               rtol=2e-4, atol=2e-4)
