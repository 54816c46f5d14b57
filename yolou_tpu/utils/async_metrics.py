"""Pipelined scalar fetch for training loops.

Calling ``float(loss)`` right after dispatching a jitted step blocks the host
until that step finishes, so the device idles while the host collates the next
batch — on this sandbox's remote-tunnel TPU the round-trip adds ~ms per step
on top. The reference never hits this (torch CUDA streams overlap `.item()`
with the next kernel launch by default); the JAX-native equivalent is to keep
a small window of in-flight device scalars and only materialise a step's
metrics once later steps have been dispatched.

``ScalarPipeline`` holds up to ``depth`` steps of device scalars; ``push``
returns the *oldest* step's values as Python floats once the window is full
(None before that), and ``drain`` flushes the tail at epoch end. A depth of 2
keeps the device exactly one step ahead — enough to overlap host collate +
transfer with device compute without unbounded dispatch queueing.
"""

from __future__ import annotations

from collections import deque
from typing import Any, List, Optional

import jax


class ScalarPipeline:
    def __init__(self, depth: int = 2):
        self.depth = max(1, depth)
        self._q: deque = deque()

    def push(self, values: Any) -> Optional[Any]:
        """Enqueue this step's device scalars (any pytree). Returns the
        oldest enqueued pytree as host values once ``depth`` steps are in
        flight, else None."""
        self._q.append(values)
        if len(self._q) >= self.depth:
            return jax.device_get(self._q.popleft())
        return None

    def drain(self) -> List[Any]:
        """Fetch every remaining in-flight pytree (epoch end)."""
        out = [jax.device_get(v) for v in self._q]
        self._q.clear()
        return out
