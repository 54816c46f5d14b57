"""CLI glue tests: run the real argparse mains in-process on synthetic data."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    from yolou_tpu.data import synthetic
    r = str(tmp_path_factory.mktemp("cli"))
    synthetic.generate(r, {"train": 8, "val": 4, "test": 4}, size=96, seed=9)
    return r


def test_generate_objectmaps_cli(root):
    from yolou_tpu.cli.generate_objectmaps import main
    counts = main(["--data_dir", root, "--image_size", "96",
                   "--batch_size", "8", "--yolo_dir", "/nonexistent.ckpt"])
    assert counts == {"test": 4, "train": 8, "val": 4}
    files = os.listdir(os.path.join(root, "objectmap", "val"))
    assert len(files) == 4
    m = np.load(os.path.join(root, "objectmap", "val", sorted(files)[0]))
    assert m.shape == (12, 12)  # 96/8


def test_train_decoder_and_evaluate_cli(root, tmp_path):
    from yolou_tpu.cli.train_decoder import main as train_main
    from yolou_tpu.cli.evaluate import main as eval_main

    run_dir = str(tmp_path / "runs")
    history = train_main([
        "--data", root, "--imgsz", "96", "--batch", "4", "--epochs", "1",
        "--early-stopping-start", "99", "--run-dir", run_dir,
        "--model", "/nonexistent.ckpt"])
    assert len(history["train_loss"]) == 1
    final = os.path.join(run_dir, "segpp_final.ckpt")
    assert os.path.exists(final)

    metrics = eval_main(["--data", root, "--model", final, "--imgsz", "96",
                         "--batch", "4", "--no-hd95"])
    assert metrics["n_images"] == 4
    assert np.isfinite(metrics["dice"])


def test_train_detector_cli(root, tmp_path):
    from yolou_tpu.cli.train_detector import main
    out_ckpt = str(tmp_path / "det.ckpt")
    history = main([
        "--data", os.path.join(root, "data.yaml"), "--imgsz", "96",
        "--batch", "4", "--epochs", "1", "--close-mosaic", "0",
        "--run-dir", str(tmp_path / "rd"), "--out", out_ckpt])
    assert len(history["loss"]) == 1
    assert os.path.exists(out_ckpt)
    # the saved checkpoint loads back as a segment model
    from yolou_tpu.utils.model_io import load_model
    model, variables = load_model(out_ckpt)
    assert model.spec.task == "segment"


def test_predict_cli(root, tmp_path):
    from yolou_tpu.cli.predict import main
    out = str(tmp_path / "pred_out")
    res = main(["--source", os.path.join(root, "images", "val"),
                "--model", "/nonexistent.ckpt", "--imgsz", "96",
                "--batch", "4", "--save-dir", out, "--stem-s2d"])
    assert len(res) == 4
    with open(os.path.join(out, "detections.json")) as f:
        assert len(json.load(f)) == 4
    assert any(f.endswith("_pred.png") for f in os.listdir(out))


def test_val_cli(root, tmp_path):
    from yolou_tpu.cli.val import main
    out = str(tmp_path / "val_metrics.json")
    m = main(["--data", os.path.join(root, "data.yaml"), "--model",
              "/nonexistent.ckpt", "--imgsz", "96", "--batch", "4",
              "--rect", "--out", out])
    assert set(m) >= {"map50", "map", "precision", "recall"}
    with open(out) as f:
        assert json.load(f) == m


def test_convert_cli(tmp_path):
    """Fabricate a torch state_dict from a template tree (ultralytics names,
    torch layouts), convert via the CLI, and load the result back."""
    import torch
    from yolou_tpu.cli.convert import main
    from yolou_tpu.tools.torch2jax import flax_to_torch_name
    from yolou_tpu.utils.model_io import load_model
    from .common import cached_init

    _, variables = cached_init("yolov12", "n", task="segment", ch=4, nc=1)

    def _flat(tree, prefix=()):
        for k, v in tree.items():
            p = prefix + (k,)
            if isinstance(v, dict):
                yield from _flat(v, p)
            else:
                yield p, v

    sd = {}
    for coll in ("params", "batch_stats"):
        for path, leaf in _flat(variables[coll]):
            a = np.array(leaf)
            if a.ndim == 4 and "upsample" in path:
                a = a[::-1, ::-1].transpose(2, 3, 0, 1)  # torch convT layout
            elif a.ndim == 4:
                a = a.transpose(3, 2, 0, 1)
            elif a.ndim == 3:
                a = a.transpose(2, 1, 0)
            sd[flax_to_torch_name(path, coll)] = torch.from_numpy(a.copy())
    pt = str(tmp_path / "synthetic.pt")
    torch.save(sd, pt)

    out = str(tmp_path / "converted.ckpt")
    # the fabricated state_dict skips the qkv permutation, so convert
    # leniently is NOT needed — names/layouts all match
    report = main(["--pt", pt, "--out", out, "--task", "segment",
                   "--imgsz", "96"])
    assert report["missing"] == []
    model, conv = load_model(out)
    assert model.spec.task == "segment"


def test_export_cli_roundtrip(root, tmp_path):
    """Export the fused pipeline to StableHLO, reload, and check the
    exported program reproduces the live predictor's outputs."""
    import jax
    import jax.numpy as jnp
    from yolou_tpu.cli.export import main
    from yolou_tpu.engine.exporter import ExportedModel, build_inference_fn
    from .common import cached_init

    out = str(tmp_path / "exported")
    main(["--model", "/nonexistent.ckpt", "--out", out, "--imgsz", "96",
          "--batch", "2", "--platforms", "cpu"])
    ex = ExportedModel(out)
    assert ex.meta["task"] == "segment" and ex.meta["batch"] == 2

    rng = np.random.default_rng(4)
    imgs = rng.integers(0, 255, (2, 96, 96, 4), dtype=np.uint8)
    got = ex(imgs)

    # live reference on the same weights
    model, _ = cached_init("yolov12", "n", task="segment", ch=4, nc=1)
    fn = build_inference_fn(model, imgsz=96)
    want = jax.jit(fn)(ex.variables, jnp.asarray(imgs))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=1e-5, rtol=1e-4)


def test_export_cli_segpp(tmp_path):
    from yolou_tpu.cli.export import main
    from yolou_tpu.engine.exporter import ExportedModel

    out = str(tmp_path / "exported_segpp")
    meta = main(["--model", "/nonexistent.ckpt", "--kind", "segpp",
                 "--out", out, "--imgsz", "96", "--batch", "1",
                 "--platforms", "cpu"])
    assert meta["kind"] == "segpp"
    ex = ExportedModel(out)
    imgs = np.random.default_rng(5).integers(
        0, 255, (1, 96, 96, 4), dtype=np.uint8)
    mask, boxes, conf, valid = ex(imgs)
    assert mask.shape == (1, 96, 96, 1) and set(np.unique(mask)) <= {0, 1}
