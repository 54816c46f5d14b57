"""Checkpointing: best/last semantics with orbax (primary) or msgpack fallback.

The reference only saves state_dicts (`best.pth`/`last.pth`, train.py:428-467)
and never saves optimizer state or supports resume (quirk SURVEY.md §2.4.5).
Here checkpoints capture params + batch_stats + optimizer state + step, and
`load_checkpoint` restores them — resume is implemented, not vestigial.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
from flax import serialization


def save_checkpoint(path: str, tree: Any) -> None:
    """Single-file msgpack checkpoint (host-gathered)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.msgpack_serialize(
        serialization.to_state_dict(jax.device_get(tree)))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    tree = serialization.msgpack_restore(data)
    if target is not None:
        return serialization.from_state_dict(target, tree)
    return tree


def save_checkpoint_orbax(path: str, tree: Any) -> None:
    """Orbax directory checkpoint — handles sharded (multi-chip) arrays
    without a host gather; preferred for large DP/TP training states."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, serialization.to_state_dict(tree), force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str, target: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.abspath(path))
    if target is not None:
        return serialization.from_state_dict(target, tree)
    return tree
