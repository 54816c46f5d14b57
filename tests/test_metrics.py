"""Metric golden tests: EDT vs scipy, HD95 vs a numpy reference, Dice semantics."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage

from yolou_tpu.metrics.seg import (_edt_sq_2d, _surface, dice_binary,
                                   hd95_batch, nanmean, precision_recall_counts)
from yolou_tpu.losses.dice import soft_dice_loss, tversky_loss


def test_edt_matches_scipy(rng):
    for _ in range(3):
        m = rng.random((48, 64)) > 0.85
        if not m.any():
            m[10, 10] = True
        # scipy: distance to nearest zero of input -> feed ~m
        want = ndimage.distance_transform_edt(~m) ** 2
        got = np.asarray(_edt_sq_2d(jnp.asarray(m)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def _ref_hd95(pred, gt, q=95.0):
    def surface(m):
        er = ndimage.binary_erosion(m, structure=ndimage.generate_binary_structure(2, 1))
        return m & ~er
    sp, sg = surface(pred), surface(gt)
    if not sp.any() or not sg.any():
        return np.nan
    dp = ndimage.distance_transform_edt(~sg)
    dg = ndimage.distance_transform_edt(~sp)
    fwd = np.percentile(dp[sp], q)
    bwd = np.percentile(dg[sg], q)
    return max(fwd, bwd)


def test_hd95_matches_numpy_reference(rng):
    preds, gts, wants = [], [], []
    for _ in range(4):
        p = np.zeros((64, 64), bool)
        g = np.zeros((64, 64), bool)
        y0, x0 = rng.integers(5, 30, 2)
        p[y0:y0 + 20, x0:x0 + 25] = True
        g[y0 + 3:y0 + 26, x0 - 2:x0 + 20] = True
        preds.append(p)
        gts.append(g)
        wants.append(_ref_hd95(p, g))
    got = np.asarray(hd95_batch(jnp.asarray(np.stack(preds), jnp.float32),
                                jnp.asarray(np.stack(gts), jnp.float32)))
    np.testing.assert_allclose(got, wants, rtol=1e-5)


def test_hd95_nan_when_empty():
    z = jnp.zeros((1, 32, 32))
    o = jnp.zeros((1, 32, 32)).at[0, 5:10, 5:10].set(1.0)
    assert np.isnan(np.asarray(hd95_batch(z, o))[0])
    assert np.isnan(np.asarray(hd95_batch(o, z))[0])
    vals = jnp.asarray([1.0, jnp.nan, 3.0])
    assert np.isclose(float(nanmean(vals)), 2.0)


def test_dice_binary_empty_semantics():
    empty = jnp.zeros((1, 8, 8))
    full = jnp.ones((1, 8, 8))
    assert float(dice_binary(empty, empty)[0]) == 1.0    # ignore_empty=False
    assert float(dice_binary(full, empty)[0]) == 0.0
    assert float(dice_binary(full, full)[0]) == 1.0
    half = jnp.zeros((1, 8, 8)).at[0, :4].set(1.0)
    assert np.isclose(float(dice_binary(half, full)[0]), 2 * 32 / (32 + 64))


def test_precision_recall_counts():
    p = jnp.zeros((2, 4, 4)).at[0, 0, :].set(1.0)   # 4 pred positives
    g = jnp.zeros((2, 4, 4)).at[0, 0, :2].set(1.0)  # 2 gt positives
    tp, fp, fn = precision_recall_counts(p, g)
    assert (float(tp), float(fp), float(fn)) == (2.0, 2.0, 0.0)


def test_losses_sane(rng):
    logits = jnp.asarray(rng.normal(size=(2, 1, 16, 16)), jnp.float32)
    target = (jnp.asarray(rng.random((2, 1, 16, 16))) > 0.5).astype(jnp.float32)
    d = float(soft_dice_loss(logits, target))
    t = float(tversky_loss(logits, target))
    assert 0.0 <= d <= 1.0 and 0.0 <= t <= 1.0
    # perfect prediction -> ~0 loss
    big = jnp.where(target > 0, 50.0, -50.0)
    assert float(soft_dice_loss(big, target)) < 1e-3
    assert float(tversky_loss(big, target)) < 1e-3
