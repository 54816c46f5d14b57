"""Optimizer/EMA tail probe: per-leaf optax chain vs a flat-buffer update.

TRAIN_BISECT derives opt+EMA at 2.08 ms (b32/160) while the data it touches
is ~120 MB of reads+writes (~0.25 ms at 528 GB/s): the cost is per-leaf op
overhead — the 3-group optax chain (clip, decayed weights, inject_hyperparams
SGD, apply_if_finite) plus the EMA lerp each emit ~630 tiny ops.

The flat variant ravels grads/params once, runs the EXACT same math (global
clip -> group wd -> nesterov momentum SGD with per-group lr -> finite gate ->
EMA) as ~15 full-width vector ops, and unravels the result.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/opt_probe.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from yolou_tpu.engine.trainer_detector import DetectorTrainConfig, make_detector_tx
from yolou_tpu.models.yolo import build_yolo


def slope(fn, args, iters=24):
    sumfn = jax.jit(
        lambda o: sum(jnp.sum(t.astype(jnp.float32))
                      for t in jax.tree_util.tree_leaves(o)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sumfn(out))
        return time.perf_counter() - t0

    run(1)
    t1 = min(run(1) for _ in range(3))
    tn = min(run(1 + iters) for _ in range(2))
    return max((tn - t1) / iters, 1e-9) * 1e3


def step(msg):
    print(f"[opt_probe] {msg}", flush=True)


def main():
    cfg = DetectorTrainConfig()
    model = build_yolo("yolov12", "n", nc=1, ch=4, task="segment",
                       dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0), jnp.zeros((1, 160, 160, 4)),
                           train=False)
    params = variables["params"]
    n_leaves = len(jax.tree_util.tree_leaves(params))
    step(f"{n_leaves} param leaves")

    tx, lr_main, lr_bias, mom_fn = make_detector_tx(cfg, steps_per_epoch=100)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-3), params)
    ema = jax.tree_util.tree_map(jnp.copy, params)

    # ---------------- current per-leaf optax form (incl. EMA lerp)
    @jax.jit
    def optax_tail(grads, opt_state, params, ema, stp):
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        d = cfg.ema_decay * (1 - jnp.exp(-stp / cfg.ema_tau))
        new_ema = jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1 - d), ema, new_params)
        return new_params, new_opt, new_ema

    # step 0: inject_hyperparams/schedules read their INTERNAL counter (0 on
    # fresh state), so parity requires the flat form to evaluate lr/mom at 0
    stp = jnp.asarray(0.0)
    t_optax = slope(optax_tail, (grads, opt_state, params, ema, stp))
    step(f"optax tail {t_optax:.3f} ms")

    # ---------------- flat-buffer form (same math)
    pflat, unravel = ravel_pytree(params)

    def group_mask(pred):
        return ravel_pytree(jax.tree_util.tree_map_with_path(
            lambda path, p: jnp.full_like(p, float(pred(path[-1].key))),
            params))[0]

    is_bias = group_mask(lambda k: k == "bias")
    is_decay = group_mask(lambda k: k not in ("bias", "scale"))

    @jax.jit
    def flat_tail(grads, mu, pflat, eflat, stp):
        g, _ = ravel_pytree(grads)
        gnorm = jnp.sqrt(jnp.sum(g * g))
        g = g * jnp.minimum(1.0, cfg.clip_grad_norm / (gnorm + 1e-12))
        g = g + cfg.weight_decay * is_decay * pflat
        mom = mom_fn(stp)
        new_mu = mom * mu + g
        upd = g + mom * new_mu                      # nesterov
        lr = is_bias * lr_bias(stp) + (1 - is_bias) * lr_main(stp)
        new_p = pflat - lr * upd
        ok = jnp.isfinite(gnorm)
        new_p = jnp.where(ok, new_p, pflat)
        new_mu = jnp.where(ok, new_mu, mu)
        d = cfg.ema_decay * (1 - jnp.exp(-stp / cfg.ema_tau))
        new_e = eflat * d + new_p * (1 - d)
        return new_p, new_mu, new_e, unravel(new_p)

    mu0 = jnp.zeros_like(pflat)
    eflat0 = pflat.copy()
    t_flat = slope(flat_tail, (grads, mu0, pflat, eflat0, stp))
    step(f"flat tail (incl ravel+unravel) {t_flat:.3f} ms")

    # flat without the unravel (the step could keep params flat and unravel
    # lazily only for model.apply via a cached tree view)
    @jax.jit
    def flat_tail_nounravel(grads, mu, pflat, eflat, stp):
        out = flat_tail.__wrapped__(grads, mu, pflat, eflat, stp)
        return out[:3]

    t_flat2 = slope(flat_tail_nounravel, (grads, mu0, pflat, eflat0, stp))
    step(f"flat tail (no unravel) {t_flat2:.3f} ms")

    # parity: flat vs optax updates
    po, _, eo = optax_tail(grads, opt_state, params, ema, stp)
    pf = flat_tail(grads, mu0, pflat, eflat0, stp)[3]
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                           - b.astype(jnp.float32)))), po, pf)
    maxdiff = max(jax.tree_util.tree_leaves(diffs))
    step(f"max |optax - flat| after one step: {maxdiff:.3e}")

    print(json.dumps({"optax_ms": round(t_optax, 3),
                      "flat_ms": round(t_flat, 3),
                      "flat_nounravel_ms": round(t_flat2, 3),
                      "n_leaves": n_leaves,
                      "max_param_diff": maxdiff}, indent=1))


if __name__ == "__main__":
    main()
