"""Pallas area-attention kernel: parity with the XLA reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from yolou_tpu.ops.pallas_attn import area_attention, area_attention_reference
from yolou_tpu.models.yolo import build_yolo


def test_kernel_matches_reference(rng):
    g, n, hd = 6, 64, 32
    q = jnp.asarray(rng.normal(size=(g, n, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(g, n, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(g, n, hd)), jnp.float32)
    got = area_attention(q, k, v)          # interpret mode on CPU
    want = area_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_kernel_matches_reference(rng):
    from yolou_tpu.ops.pallas_attn import (area_attention_fused,
                                           area_attention_fused_reference)
    g, n, heads, hd = 4, 64, 4, 32
    c = heads * hd
    q = jnp.asarray(rng.normal(size=(g, n, c)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(g, n, c)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(g, n, c)), jnp.float32)
    got = area_attention_fused(q, k, v, heads)   # interpret mode on CPU
    want = area_attention_fused_reference(q, k, v, heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # gradients flow through the custom VJP and match the reference's
    f = lambda impl: lambda q: jnp.sum(impl(q, k, v, heads) ** 2)
    gk = jax.grad(f(area_attention_fused))(q)
    gr = jax.grad(f(area_attention_fused_reference))(q)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-4, atol=1e-4)


def test_model_same_outputs_with_pallas(rng):
    x = jnp.asarray(rng.random((1, 96, 96, 4)), jnp.float32)
    m0 = build_yolo("yolov12", "n", nc=1, ch=4, task="detect", use_pallas=False)
    m1 = build_yolo("yolov12", "n", nc=1, ch=4, task="detect", use_pallas=True)
    v = jax.jit(lambda k, x: m0.init(k, x, train=False))(jax.random.key(0), x)
    o0 = jax.jit(lambda v, x: m0.apply(v, x, train=False).preds)(v, x)
    o1 = jax.jit(lambda v, x: m1.apply(v, x, train=False).preds)(v, x)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1),
                               rtol=2e-4, atol=2e-5)
