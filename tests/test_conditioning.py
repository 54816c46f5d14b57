"""Objectmap conditioning parity — the reference's train/eval mismatch, pinned.

The reference conditions the decoder's logits bottleneck DIFFERENTLY between
training and evaluation (quirk SURVEY.md §2.4.2, replicated by design):

  * decoder training: z-score the saved raw objectmap, then sigmoid
    (/root/reference/dataset.py:88-97),
  * end-to-end eval: sigmoid of the raw logits, NO z-score
    (/root/reference/evaluate_model.py:142-144).

These tests pin the exact math of both paths so neither can silently drift
(VERDICT r2 next-steps #6). CONDITIONING.md quantifies the consequence.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolou_tpu.data.decoder_dataset import DecoderDataset
from yolou_tpu.models.segpp import YOLOSegPP
from yolou_tpu.models.yolo import parse_model_spec

from .common import cached_init


def _write_png(path, arr):
    import cv2

    cv2.imwrite(path, arr)


@pytest.fixture()
def triplet_root(tmp_path):
    import cv2  # noqa: F401 — skip cleanly if unavailable

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "images/train"))
    os.makedirs(os.path.join(root, "masks/train"))
    os.makedirs(os.path.join(root, "objectmaps/train"))
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (160, 160, 4), np.uint8)
    _write_png(os.path.join(root, "images/train/a.png"), img)
    _write_png(os.path.join(root, "masks/train/a.png"),
               (rng.random((160, 160)) > 0.5).astype(np.uint8) * 255)
    om = rng.normal(-9.6, 2.0, (20, 20)).astype(np.float32)  # round-2-like
    np.save(os.path.join(root, "objectmaps/train/a_20.npy"), om)
    return root, om


def test_train_path_is_zscore_then_sigmoid(triplet_root):
    """dataset.py:88-97 semantics: sigmoid((om - mean) / std), with the
    UNBIASED torch.Tensor.std() divisor (ddof=1, dataset.py:90)."""
    root, om = triplet_root
    ds = DecoderDataset(root, "images/train", "masks/train", 160,
                        objectmap_path="objectmaps/train")
    _, _, got = ds[0]
    import torch
    t = torch.from_numpy(om)
    want_t = torch.sigmoid((t - t.mean()) / t.std()).numpy()
    np.testing.assert_allclose(got[..., 0], want_t, rtol=1e-6)
    want = 1.0 / (1.0 + np.exp(-(om - om.mean()) / om.std(ddof=1)))
    np.testing.assert_allclose(got[..., 0], want, rtol=1e-6)
    # the z-score recenters: conditioned map must straddle 0.5 even though
    # every raw logit is far negative
    assert got.min() < 0.5 < got.max()


def test_train_path_zero_std_branch(triplet_root):
    """Constant map: z-score degrades to mean-subtraction (dataset.py:94-97)."""
    root, _ = triplet_root
    om = np.full((20, 20), -7.25, np.float32)
    np.save(os.path.join(root, "objectmaps/train/a_20.npy"), om)
    ds = DecoderDataset(root, "images/train", "masks/train", 160,
                        objectmap_path="objectmaps/train")
    _, _, got = ds[0]
    np.testing.assert_allclose(got[..., 0], 0.5, rtol=1e-6)


def test_eval_path_is_raw_sigmoid_no_zscore():
    """The fused forward must feed the decoder sigmoid(raw P3 last channel)
    with NO normalization: running fused equals running the two-stage path
    with externally computed sigmoid(raw) — and differs from z-scored."""
    model, variables = cached_init("yolov12", "n", task="segment", ch=4,
                                   nc=1, imgsz=160)
    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="segment")
    segpp = YOLOSegPP(spec=spec)
    x = jnp.asarray(np.random.default_rng(0).random((1, 160, 160, 4)),
                    jnp.float32)
    tpl = segpp.init(jax.random.key(1), x, train=False)
    sp_vars = {
        "params": {**tpl["params"], "yolo": variables["params"]},
        "batch_stats": {**tpl.get("batch_stats", {}),
                        "yolo": variables["batch_stats"]},
    }

    fused_mask, out = segpp.apply(sp_vars, x, train=False)

    raw_p3 = out.raw[0][..., -1:]
    ext = jax.nn.sigmoid(raw_p3.astype(jnp.float32))
    staged_mask, _ = segpp.apply(sp_vars, x, logits=ext, train=False)
    np.testing.assert_allclose(np.asarray(fused_mask),
                               np.asarray(staged_mask), atol=1e-6)

    om = np.asarray(raw_p3)[0, ..., 0]
    z = (om - om.mean()) / (om.std() + 1e-12)
    zs = jnp.asarray(1.0 / (1.0 + np.exp(-z)), jnp.float32)[None, ..., None]
    zs_mask, _ = segpp.apply(sp_vars, x, logits=zs, train=False)
    assert float(jnp.abs(fused_mask - zs_mask).max()) > 1e-4
