"""Per-layer parameter-count parity with the reference backbone table.

The reference documents its (torch) backbone layer parameter counts at
/root/reference/YOLOSegPlusPlus.py:124-136. Torch counts = conv kernels + BN
scale/bias (+ head conv biases); flax params exclude BN running stats
(collection `batch_stats`), matching torch's param/buffer split. Exact
per-layer equality here pins down the entire block structure.
"""

import jax
import jax.numpy as jnp

from yolou_tpu.models.yolo import build_yolo, count_params, inflate_stem_to_4ch

from .common import cached_init

REFERENCE_BACKBONE_COUNTS = {
    0: 608,
    1: 4672,
    2: 6640,
    3: 36992,
    4: 26080,
    5: 147712,
    6: 180864,
    7: 295424,
    8: 689408,
}


def _init(task="detect", ch=4, nc=1, imgsz=160):
    return cached_init("yolov12", "n", task=task, ch=ch, nc=nc, imgsz=imgsz)


def test_backbone_layer_param_counts():
    _, variables = _init()
    params = variables["params"]
    for idx, want in REFERENCE_BACKBONE_COUNTS.items():
        got = count_params(params[f"model_{idx}"])
        assert got == want, f"layer {idx}: {got} != {want}"


def test_total_params_near_reference():
    # README claims ~2.6M total for the (4-ch, nc=1) detector.
    _, variables = _init(task="detect")
    total = count_params(variables["params"])
    assert 2.4e6 < total < 2.8e6, total


def test_segment_head_builds_and_runs():
    model, variables = _init(task="segment", imgsz=160)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((2, 160, 160, 4)))
    assert len(out.raw) == 3
    assert out.raw[0].shape == (2, 20, 20, 64 + 1)
    assert out.raw[1].shape == (2, 10, 10, 65)
    assert out.raw[2].shape == (2, 5, 5, 65)
    n = 20 * 20 + 10 * 10 + 5 * 5
    assert out.preds.shape == (2, n, 4 + 1 + 32)
    assert out.protos.shape == (2, 40, 40, 32)
    assert out.mask_coefs.shape == (2, n, 32)


def test_detect_raw_last_channel_is_cls_logit():
    # objectmap semantics: raw[0][..., -1] is the single-class logit map
    model, variables = _init(task="detect")
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.ones((1, 160, 160, 4)))
    logit_map = out.raw[0][..., -1]
    assert logit_map.shape == (1, 20, 20)


def test_stem_inflation_3_to_4():
    _, v3 = cached_init("yolov12", "n", task="detect", ch=3)
    p4 = inflate_stem_to_4ch(v3["params"])
    w = p4["model_0"]["conv"]["kernel"]
    assert w.shape[2] == 4
    w3 = v3["params"]["model_0"]["conv"]["kernel"]
    assert jnp.allclose(w[..., 3:4, :], jnp.mean(w3, axis=2, keepdims=True))
    # inflated params must run in a 4-ch model
    model4, v4 = cached_init("yolov12", "n", task="detect", ch=4)
    out = jax.jit(lambda v, x: model4.apply(v, x, train=False))(
        {"params": p4, "batch_stats": v4["batch_stats"]},
        jnp.zeros((1, 160, 160, 4)))
    assert out.preds.shape[0] == 1
