"""Detector trainer: single-device and 8-device data-parallel smoke tests."""

import os

import jax
import numpy as np
import pytest

from yolou_tpu.data import synthetic
from yolou_tpu.data.augment import AugHyp
from yolou_tpu.data.config import load_data_yaml
from yolou_tpu.engine.trainer_detector import DetectorTrainConfig, DetectorTrainer
from yolou_tpu.parallel import mesh as meshlib

from .common import cached_init


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    r = str(tmp_path_factory.mktemp("det"))
    synthetic.generate(r, {"train": 16, "val": 4, "test": 4}, size=96, seed=11)
    return r


def _train(root, tmp_path, mesh=None, epochs=2, batch=8):
    cfg_data = load_data_yaml(os.path.join(root, "data.yaml"))
    model, variables = cached_init("yolov12", "n", task="segment", ch=4,
                                   nc=1, imgsz=96)
    cfg = DetectorTrainConfig(imgsz=96, batch_size=batch, epochs=epochs,
                              close_mosaic=1, max_instances=8,
                              warmup_epochs=1.0,
                              run_dir=str(tmp_path / "runs_det"))
    aug = AugHyp(scale=0.3, translate=0.05)
    tr = DetectorTrainer(model, variables, cfg_data, cfg, aug=aug, mesh=mesh)
    return tr.train(), tr


def test_detector_train_smoke(root, tmp_path):
    history, tr = _train(root, tmp_path)
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"]).all()
    assert history["seg"][0] > 0  # segment task: mask loss active
    ema = tr.ema_variables()
    assert "params" in ema
    runs = os.listdir(str(tmp_path / "runs_det"))
    assert "last.ckpt" in os.listdir(os.path.join(str(tmp_path / "runs_det"),
                                                  runs[0], "weights"))


def test_detector_train_data_parallel(root, tmp_path):
    assert jax.device_count() >= 8, "conftest should give 8 CPU devices"
    mesh = meshlib.make_mesh(n_data=8)
    history, _ = _train(root, tmp_path, mesh=mesh, epochs=1, batch=8)
    assert np.isfinite(history["loss"]).all()
