"""Eval-path entry-conv fusion in the Segment head (nn/heads.py): the
per-level first 3x3 convs of Detect.cv2 / cv4 / Proto.cv1 are batched into
one conv. Must be numerically the staged path with an identical variable
tree (checkpoint + torch-converter compatibility)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolou_tpu.nn.heads import Segment


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(0)
    return [jnp.asarray(rng.normal(0, 0.5, (2, 16, 16, 64)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.5, (2, 8, 8, 128)).astype(np.float32)),
            jnp.asarray(rng.normal(0, 0.5, (2, 4, 4, 256)).astype(np.float32))]


def _shapes(v):
    return {"/".join(map(str, k)): x.shape
            for k, x in jax.tree_util.tree_leaves_with_path(v)}


def test_param_tree_identical_across_paths(feats):
    fused = Segment(nc=1, nm=32, npr=64, fuse_entry=True)
    staged = Segment(nc=1, nm=32, npr=64, fuse_entry=False)
    v_f = fused.init(jax.random.key(0), feats, train=False)
    v_s = staged.init(jax.random.key(0), feats, train=False)
    v_t = fused.init(jax.random.key(0), feats, train=True)
    assert _shapes(v_f) == _shapes(v_s) == _shapes(v_t)


@pytest.mark.parametrize("pad_p5", [False, True])
def test_fused_matches_staged_eval(feats, pad_p5):
    # pad_p5=True exercises the probe-only lane-pad path (nn/heads.py):
    # exact math is required even though the default is off
    fused = Segment(nc=1, nm=32, npr=64, fuse_entry=True, pad_p5=pad_p5)
    staged = Segment(nc=1, nm=32, npr=64, fuse_entry=False)
    v = fused.init(jax.random.key(1), feats, train=False)
    # perturb BN stats so the folding is exercised with non-trivial values
    v = jax.tree_util.tree_map(
        lambda x: x + 0.05 * np.random.default_rng(2).standard_normal(x.shape
                                                                      ).astype(x.dtype), v)
    raw_f, mc_f, pr_f = fused.apply(v, feats, train=False)
    raw_s, mc_s, pr_s = staged.apply(v, feats, train=False)
    np.testing.assert_allclose(mc_f, mc_s, atol=5e-5)
    np.testing.assert_allclose(pr_f, pr_s, atol=5e-5)
    for a, b in zip(raw_f, raw_s):
        np.testing.assert_allclose(a, b, atol=5e-5)


@pytest.mark.parametrize("legacy", [False, True])
def test_cls_entry_fold_matches_staged(feats, legacy):
    """fuse_cls_entry rides the class branch's entry conv (DW expanded to a
    diagonal dense block / legacy plain conv) on the shared entry conv —
    must equal the staged path with an identical variable tree."""
    fused = Segment(nc=1, nm=32, npr=64, fuse_entry=True,
                    fuse_cls_entry=True, legacy=legacy)
    staged = Segment(nc=1, nm=32, npr=64, fuse_entry=False, legacy=legacy)
    v_f = fused.init(jax.random.key(0), feats, train=False)
    v_s = staged.init(jax.random.key(0), feats, train=False)
    assert _shapes(v_f) == _shapes(v_s)
    v = jax.tree_util.tree_map(
        lambda x: x + 0.05 * np.random.default_rng(4).standard_normal(
            x.shape).astype(x.dtype), v_s)
    raw_f, mc_f, pr_f = fused.apply(v, feats, train=False)
    raw_s, mc_s, pr_s = staged.apply(v, feats, train=False)
    np.testing.assert_allclose(mc_f, mc_s, atol=5e-5)
    np.testing.assert_allclose(pr_f, pr_s, atol=5e-5)
    for a, b in zip(raw_f, raw_s):
        np.testing.assert_allclose(a, b, atol=5e-5)


def test_lazy_concat_differentiable_bf16():
    """Regression: bf16 + lazy-concat split-GEMM broke autodiff (the f32
    preferred_element_type output made the conv transpose see mixed dtypes).
    Training materializes the concat; the grad must exist and be finite."""
    from yolou_tpu.nn.blocks import ConvBNAct

    m = ConvBNAct(64, 1, dtype=jnp.bfloat16)
    pieces = tuple(jnp.ones((1, 8, 8, 128), jnp.bfloat16) for _ in range(2))
    v = m.init(jax.random.key(0), pieces, train=True)

    def loss(params):
        y, _ = m.apply({**v, "params": params}, pieces, train=True,
                       mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32))

    g = jax.grad(loss)(v["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf, np.float32)))
