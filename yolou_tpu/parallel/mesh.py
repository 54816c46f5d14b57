"""Device-mesh utilities: data/model-parallel sharding for training and eval.

The reference has no working distributed path (vestigial torch-DDP hooks only,
SURVEY.md §2.3). The TPU-native equivalent is a `jax.sharding.Mesh` with
NamedSharding annotations: batches shard over the 'data' axis, params replicate
(optionally sharding large head kernels over 'model'), and XLA inserts the
gradient psum over ICI. Works identically on a real slice and on the
8-virtual-CPU-device test mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_data = n_data or (len(devices) // n_model)
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the 'data' mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device_put a (possibly nested) numpy batch with batch-dim sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    rep = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, rep), tree)


def param_sharding_rules(mesh: Mesh, params, min_size: int = 2 ** 16):
    """Optional tensor-parallel rules: shard the last (output-feature) axis of
    large kernels over 'model'; everything else replicated.

    With n_model == 1 this is fully replicated — the right default for a 2.7M
    -param model where DP is the only parallelism that pays (SURVEY.md §2.3).
    """
    n_model = mesh.shape["model"]

    def rule(x):
        if (n_model > 1 and hasattr(x, "ndim") and x.ndim >= 2
                and x.size >= min_size and x.shape[-1] % n_model == 0):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(rule, params)


def pad_batch_to_multiple(batch, multiple: int):
    """Pad leading dim to a multiple of the data-axis size (repeat-first pad);
    returns (padded_batch, n_real)."""

    leaves = jax.tree_util.tree_leaves(batch)
    b = leaves[0].shape[0]
    rem = b % multiple
    if rem == 0:
        return batch, b
    pad = multiple - rem

    def padfn(x):
        reps = np.repeat(x[:1], pad, axis=0)
        return np.concatenate([x, reps], axis=0)

    return jax.tree_util.tree_map(padfn, batch), b
