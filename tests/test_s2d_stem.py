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


def test_s2d_predictor_matches_normal(rng):
    """Predictor wiring of stem_s2d: host letterbox+s2d path must reproduce
    the device-letterbox path. Model-sized input isolates the s2d plumbing
    (no resize, so host-u8 and device-float letterbox agree exactly)."""
    from yolou_tpu.engine.predictor import Predictor
    from yolou_tpu.native.loader import s2d4_np

    size = 96
    img = (rng.random((size, size, 4)) * 255).astype(np.uint8)
    m0 = build_yolo("yolov12", "n", nc=1, ch=4, task="segment")
    m1 = build_yolo("yolov12", "n", nc=1, ch=4, task="segment", stem_s2d=True)
    v = jax.jit(lambda k, x: m0.init(k, x, train=False))(
        jax.random.key(2), jnp.zeros((1, size, size, 4)))
    p0 = Predictor(m0, v, imgsz=size, channels=4, batch_size=1)
    p1 = Predictor(m1, v, imgsz=size, channels=4, batch_size=1)
    assert p1.stem_s2d and not p0.stem_s2d
    o0 = p0.raw_forward(img[None])
    o1 = p1.raw_forward(img[None])
    np.testing.assert_allclose(np.asarray(o0.preds), np.asarray(o1.preds),
                               rtol=2e-4, atol=2e-4)
    # host s2d numpy fallback agrees with nn.blocks.space_to_depth order
    hs = s2d4_np(img[None])
    ds = np.asarray(space_to_depth(jnp.asarray(img[None], jnp.float32), 4))
    np.testing.assert_array_equal(hs.astype(np.float32), ds)
    # end-to-end __call__ returns results through the fused NMS program
    res = p1([img])
    assert len(res) == 1


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
