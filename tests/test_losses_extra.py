"""Composite losses, new augs, profiling utils, video source routing."""

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.losses.composite import (focal_loss, hausdorff_dt_loss,
                                        yolou_composite_loss)
from yolou_tpu.data.augment import (AugHyp, augment_batch, cutmix,
                                    copy_paste_flip, random_resolution)
from yolou_tpu.utils.profiling import StepTimer, summarize_params


def test_focal_loss_behaviour(rng):
    g = (jnp.asarray(rng.random((2, 16, 16))) > 0.7).astype(jnp.float32)
    good = jnp.where(g > 0, 8.0, -8.0)
    bad = -good
    assert float(focal_loss(good, g)) < 1e-3
    assert float(focal_loss(bad, g)) > float(focal_loss(good, g))


def test_hausdorff_dt_loss(rng):
    g = jnp.zeros((2, 32, 32)).at[:, 8:20, 8:20].set(1.0)
    good = jnp.where(g > 0, 8.0, -8.0)
    shifted = jnp.zeros((2, 32, 32)).at[:, 14:26, 14:26].set(8.0) - 4.0
    l_good = float(hausdorff_dt_loss(good, g))
    l_shift = float(hausdorff_dt_loss(shifted, g))
    assert l_good < l_shift
    # empty prediction/target does not NaN
    assert np.isfinite(float(hausdorff_dt_loss(jnp.full((1, 16, 16), -8.0),
                                               jnp.zeros((1, 16, 16)))))


def test_composite_loss(rng):
    g = (jnp.asarray(rng.random((2, 1, 16, 16))) > 0.5).astype(jnp.float32)
    z = jnp.asarray(rng.normal(size=(2, 1, 16, 16)), jnp.float32)
    v = float(yolou_composite_loss(z, g, hausdorff_weight=0.0,
                                   focal_weight=0.1))
    assert np.isfinite(v) and v > 0
    grads = jax.grad(lambda z: yolou_composite_loss(z, g, focal_weight=0.1))(z)
    assert np.all(np.isfinite(np.asarray(grads)))


def test_new_augs_shapes(rng):
    img = jnp.asarray(rng.random((4, 64, 64, 4)), jnp.float32)
    idmap = jnp.zeros((4, 64, 64), jnp.int32).at[:, 10:30, 10:30].set(1)
    cls = jnp.zeros((4, 4), jnp.int32)
    valid = jnp.zeros((4, 4), bool).at[:, 0].set(True)
    key = jax.random.key(0)
    i2, m2, c2, v2 = cutmix(img, idmap, cls, valid, key, p=1.0)
    assert c2.shape == (4, 8) and m2.max() <= 8
    i3, m3, c3, v3 = copy_paste_flip(img, idmap, cls, valid, key, p=1.0)
    assert c3.shape == (4, 8)
    out = random_resolution(img, key, AugHyp(resolution_p=1.0))
    assert out.shape == img.shape
    assert float(jnp.abs(out - img).max()) > 0  # actually degraded
    # full pipeline with everything enabled
    hyp = AugHyp(mixup=0.5, cutmix=0.5, copy_paste=0.5, resolution_p=0.5)
    full = augment_batch(img, idmap, cls, valid, key, hyp, g_out=4,
                         mask_ratio=4)
    assert full["img"].shape == (4, 64, 64, 4)
    assert full["masks"].shape == (4, 4, 16, 16)


def test_profiling_utils():
    t = StepTimer()
    for _ in range(3):
        t.tick()
    assert np.isfinite(t.step_time)
    assert t.images_per_sec(8) > 0
    table = summarize_params({"a": {"w": np.zeros((2, 3))},
                              "b": {"x": {"y": np.zeros(5)}}})
    assert "TOTAL" in table and "11" in table


def test_video_source_routing(tmp_path, rng):
    import cv2
    vp = str(tmp_path / "clip.avi")
    vw = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"MJPG"), 5, (64, 48))
    for _ in range(6):
        vw.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    vw.release()
    from yolou_tpu.engine.predictor import load_source
    items = load_source(vp, channels=4)
    assert len(items) == 6
    assert items[0][1].shape == (48, 64, 4)
    assert "#frame0" in items[0][0]
