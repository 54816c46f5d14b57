"""YOLOSegPlusPlus decoder: shapes, fused-forward equivalence, param split."""

import jax
import jax.numpy as jnp
import numpy as np

from yolou_tpu.models.segpp import YOLOSegPP, decoder_param_filter
from yolou_tpu.models.yolo import count_params, parse_model_spec

from .common import cached_init


def _segpp(use_logits=True):
    spec = parse_model_spec("yolov12", "n", nc=1, ch=4, task="detect")
    model = YOLOSegPP(spec=spec, use_logits=use_logits)
    x = jnp.zeros((1, 160, 160, 4))
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(jax.random.key(0), x)
    return model, jax.device_get(variables)


def test_segpp_shapes_and_split():
    model, variables = _segpp()
    x = jnp.asarray(np.random.default_rng(0).random((2, 160, 160, 4)), jnp.float32)
    mask_logits, out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert mask_logits.shape == (2, 160, 160, 1)
    assert out.preds.shape[0] == 2
    dec_params = {k: v for k, v in variables["params"].items() if decoder_param_filter((k,))}
    n_dec = count_params(dec_params)
    # reference README claims ~80K trainable; exact decoder arithmetic gives ~64K
    assert 55_000 < n_dec < 90_000, n_dec
    n_enc_slice = sum(count_params(variables["params"]["yolo"][f"model_{i}"]) for i in range(5))
    assert n_enc_slice == 608 + 4672 + 6640 + 36992 + 26080  # YOLOSegPlusPlus.py:127-131


def test_fused_equals_two_stage():
    model, variables = _segpp()
    x = jnp.asarray(np.random.default_rng(1).random((1, 160, 160, 4)), jnp.float32)
    fused_mask, out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    logits = jax.nn.sigmoid(out.raw[0][..., -1:])
    staged_mask, _ = jax.jit(lambda v, x, l: model.apply(v, x, logits=l, train=False))(
        variables, x, logits)
    np.testing.assert_allclose(np.asarray(fused_mask), np.asarray(staged_mask),
                               rtol=2e-4, atol=2e-5)


def test_ablation_no_logits():
    model, variables = _segpp(use_logits=False)
    x = jnp.zeros((1, 160, 160, 4))
    mask_logits, _ = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert mask_logits.shape == (1, 160, 160, 1)


def test_decoder_gradients_do_not_touch_encoder():
    model, variables = _segpp()
    x = jnp.asarray(np.random.default_rng(2).random((1, 160, 160, 4)), jnp.float32)
    target = jnp.zeros((1, 160, 160, 1))

    def loss_fn(params):
        mask_logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False)
        return jnp.mean((jax.nn.sigmoid(mask_logits) - target) ** 2)

    grads = jax.jit(jax.grad(loss_fn))(variables["params"])
    enc_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["yolo"]))
    dec_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads["decoder"]))
    assert enc_norm == 0.0
    assert dec_norm > 0.0


def test_segment_checkpoint_transplants_into_segpp():
    """Regression: a segment-task detector checkpoint (head under
    model_N/detect + proto/cv4) must re-root into the detect-task SegPP
    encoder (bug found by the TRAINING_DEMO pipeline)."""
    from yolou_tpu.cli.common import build_segpp_from_detector

    _, seg_vars = cached_init("yolov12", "n", task="segment", ch=4, nc=1)
    model, variables = build_segpp_from_detector(seg_vars, nc=1, ch=4,
                                                 imgsz=160)
    x = jnp.asarray(np.random.default_rng(3).random((1, 160, 160, 4)),
                    jnp.float32)
    mask_logits, out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, x)
    assert mask_logits.shape == (1, 160, 160, 1)
    # the transplanted stem really is the segment checkpoint's stem
    np.testing.assert_allclose(
        np.asarray(variables["params"]["yolo"]["model_0"]["conv"]["kernel"]),
        np.asarray(seg_vars["params"]["model_0"]["conv"]["kernel"]))
