"""Flat-buffer detector optimizer: the exact `make_detector_tx` math on one
raveled parameter vector.

`make_detector_tx` (trainer_detector.py) is a faithful rebuild of the
ultralytics BaseTrainer optimizer (/root/reference train path inherits
ultralytics' build_optimizer): 3 param groups (bias / norm-scale / decayed
weights), global-norm clip at 10, nesterov SGD with per-step lr+momentum
warmup, non-finite step skip. As an optax `multi_transform` chain that is
~630 per-leaf ops per step (clip, decayed weights, momentum trace, lr scale,
finite gate, each over ~126 leaves) — TRAIN_BISECT measured the opt+EMA tail
at ~2 ms/step on the v5e while the data it touches (~120 MB) is worth ~0.25
ms of HBM time. The per-leaf dispatch, not the arithmetic, is the cost.

This module runs the SAME math on a single raveled f32 vector:

    clip:    s = where(|g| < c, 1, c/|g|)            (optax.clip_by_global_norm)
    decay:   g += wd * decay_mask * p                (optax.add_decayed_weights)
    sgd:     mu = m*mu + g ; upd = g + m*mu          (optax.sgd nesterov trace)
    lr:      p -= (bias_mask*lr_bias + (1-bias_mask)*lr_main) * upd
    finite:  non-finite grads -> keep p/mu, count not advanced
             (optax.apply_if_finite semantics: inner state untouched)

Group membership becomes two precomputed {0,1} mask vectors, so the whole
update is ~15 full-width vector ops regardless of leaf count. Schedules are
evaluated at the optimizer's own step count exactly like
`optax.inject_hyperparams` does (count starts at 0, increments only on
finite steps).

Parity with the optax chain is pinned by tests/test_trainer_detector.py and
measured on TPU by tools/train_probe3.py / tools/opt_probe.py.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class FlatOptState(NamedTuple):
    count: jax.Array      # finite steps applied (schedule clock), int32
    mu: jax.Array         # momentum trace, flat f32
    notfinite: jax.Array  # consecutive non-finite steps seen, int32


class FlatDetectorOpt(NamedTuple):
    """Callable bundle; treat as opaque. All arrays are flat f32 vectors."""
    ravel: Any            # params tree -> flat vector
    unravel: Any          # flat vector -> params tree
    init: Any             # flat params -> FlatOptState
    update: Any           # (grads_tree, state, flat_params)
    #                       -> (new_flat_params, new_state)


def _group_masks(params):
    """{0,1} f32 vectors marking the bias group and the weight-decay group
    (same labeling as trainer_detector.make_detector_tx.label_fn: leaf name
    'bias' -> bias group, 'scale' (BatchNorm weight) -> no decay)."""
    def mask_of(pred):
        tree = jax.tree_util.tree_map_with_path(
            lambda path, p: jnp.full(p.shape, float(pred(path[-1].key)),
                                     jnp.float32), params)
        return ravel_pytree(tree)[0]

    is_bias = mask_of(lambda k: k == "bias")
    is_decay = mask_of(lambda k: k not in ("bias", "scale"))
    return is_bias, is_decay


def make_flat_detector_opt(cfg, steps_per_epoch: int, params) -> FlatDetectorOpt:
    """Build the flat optimizer for `DetectorTrainConfig` cfg (SGD path only —
    the AdamW path keeps the optax chain; ultralytics' auto default is SGD).

    The returned `update` takes the grads as a TREE (straight out of
    value_and_grad) plus the current flat params, and returns the new flat
    params. The trainer keeps params in TREE form across steps and ravels/
    unravels inside the jitted step — that pair is two fused XLA copies
    (~11 MB for the 2.7M-param model), negligible next to the per-leaf op
    dispatch this path removes (TRAIN_BISECT ~2 ms -> ~0.3 ms opt+EMA tail).
    """
    from .trainer_detector import make_detector_tx

    if getattr(cfg, "optimizer", "sgd") != "sgd":
        raise ValueError("flat optimizer implements the SGD path only")

    _, lr_main, lr_bias, mom_fn = make_detector_tx(cfg, steps_per_epoch)
    is_bias, is_decay = _group_masks(params)
    _, unravel = ravel_pytree(params)
    clip = float(cfg.clip_grad_norm or 0.0)
    wd = float(cfg.weight_decay)

    def ravel(tree):
        return ravel_pytree(tree)[0]

    def init(pflat):
        return FlatOptState(count=jnp.zeros((), jnp.int32),
                            mu=jnp.zeros_like(pflat),
                            notfinite=jnp.zeros((), jnp.int32))

    max_errs = 100  # optax.apply_if_finite(max_consecutive_errors=100) twin

    def update(grads, state: FlatOptState, pflat):
        g = ravel_pytree(grads)[0].astype(pflat.dtype)
        if cfg.skip_nonfinite:
            finite = jnp.all(jnp.isfinite(g))
            notfinite = jnp.where(finite, 0, state.notfinite + 1)
            # apply_if_finite semantics: after max_consecutive_errors
            # consecutive non-finite steps, apply the update ANYWAY — the
            # NaNs propagate into the params and the run fails visibly
            # instead of silently skipping forever
            ok = finite | (notfinite > max_errs)
        else:
            ok = jnp.asarray(True)
            notfinite = state.notfinite
        if clip:
            gnorm = jnp.sqrt(jnp.sum(g * g))
            # optax.clip_by_global_norm: scale only when |g| >= max_norm
            g = g * jnp.where(gnorm < clip, 1.0, clip / gnorm)
        g = g + wd * is_decay * pflat
        stp = state.count.astype(jnp.float32)
        m = mom_fn(stp)
        new_mu = m * state.mu + g
        upd = g + m * new_mu                         # nesterov
        lr = is_bias * lr_bias(stp) + (1.0 - is_bias) * lr_main(stp)
        new_p = jnp.where(ok, pflat - lr * upd, pflat)
        new_mu = jnp.where(ok, new_mu, state.mu)
        new_state = FlatOptState(
            count=state.count + ok.astype(jnp.int32),
            mu=new_mu,
            notfinite=notfinite)
        return new_p, new_state

    return FlatDetectorOpt(ravel=ravel, unravel=unravel, init=init,
                           update=update)
