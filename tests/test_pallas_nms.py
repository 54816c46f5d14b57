"""Fused Pallas NMS (ops/pallas_nms.py) keep-set parity in interpret mode:
must reproduce `_suppress_greedy(box_iou(b, b), valid, t)` exactly — same
Jacobi fixpoint, division-free threshold, bf16 hit matrix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolou_tpu.ops.boxes import box_iou
from yolou_tpu.ops.nms import _suppress_greedy, non_max_suppression
from yolou_tpu.ops.pallas_nms import pallas_nms_eligible, suppress_greedy_fused


def _random_boxes(rng, k, spread=100.0, size=30.0):
    xy = rng.random((k, 2)) * spread
    wh = rng.random((k, 2)) * size + 1
    return jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))


@pytest.mark.parametrize("k", [128, 256])
@pytest.mark.parametrize("thres", [0.3, 0.45, 0.7])
def test_fused_matches_xla_greedy(k, thres):
    rng = np.random.default_rng(k)
    boxes = _random_boxes(rng, k)
    valid = jnp.asarray(rng.random(k) < 0.9)
    ref = _suppress_greedy(box_iou(boxes, boxes), valid, thres)
    got = suppress_greedy_fused(boxes, valid, thres, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_fused_vmapped_and_dense_overlap():
    """Batched via vmap (the nms.py call pattern) on a dense-overlap cloud
    (deep suppression chains exercise the while-loop fixpoint)."""
    rng = np.random.default_rng(7)
    k, b = 128, 3
    boxes = jnp.stack([_random_boxes(rng, k, spread=20.0) for _ in range(b)])
    valid = jnp.asarray(rng.random((b, k)) < 0.95)
    ref = jax.vmap(
        lambda bx, v: _suppress_greedy(box_iou(bx, bx), v, 0.45))(boxes, valid)
    got = jax.vmap(
        lambda bx, v: suppress_greedy_fused(bx, v, 0.45, interpret=True))(
        boxes, valid)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_eligibility_gate():
    assert pallas_nms_eligible(1024)
    assert pallas_nms_eligible(256)
    assert pallas_nms_eligible(300)        # unaligned -> padded inside
    assert not pallas_nms_eligible(4096)   # hit matrix past the VMEM budget


@pytest.mark.parametrize("k", [100, 300, 525])
def test_fused_unaligned_k_padding(k):
    """Unaligned candidate counts (e.g. the 160-input eval surface's n=525)
    are lane-padded inside the wrapper; pads are invalid and zero-area, so
    the keep-set over the real rows is unchanged."""
    rng = np.random.default_rng(k)
    boxes = _random_boxes(rng, k, spread=40.0)
    valid = jnp.asarray(rng.random(k) < 0.9)
    ref = _suppress_greedy(box_iou(boxes, boxes), valid, 0.45)
    got = suppress_greedy_fused(boxes, valid, 0.45, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_nms_entry_unchanged_off_tpu():
    """non_max_suppression still routes through the XLA reference off-TPU
    (CPU tests must not pay interpret-mode kernels) and produces the same
    result regardless of the top_k alignment."""
    rng = np.random.default_rng(3)
    n, e = 200, 6   # n <= both top_k values => identical candidate sets
    xy = rng.random((2, n, 2)).astype(np.float32) * 80
    wh = rng.random((2, n, 2)).astype(np.float32) * 20 + 2
    conf = rng.random((2, n, 1)).astype(np.float32)
    extra = rng.random((2, n, e)).astype(np.float32)
    pred = jnp.asarray(np.concatenate(
        [xy + wh / 2, wh, conf, extra], -1))   # xywh + 1 cls + extras
    a = non_max_suppression(pred, nc=1, top_k=256)
    b = non_max_suppression(pred, nc=1, top_k=250)
    # same candidate population (n<=both k) => identical detections
    np.testing.assert_allclose(np.asarray(a.boxes)[np.asarray(a.valid)],
                               np.asarray(b.boxes)[np.asarray(b.valid)])
