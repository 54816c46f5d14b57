"""Tracing/profiling utilities — the aux subsystem the reference lacks
(SURVEY.md §5: only wall-clock prints; torchinfo imported but never called).

Provides: jax.profiler trace capture, a step timer with images/sec, and a
torchinfo-style parameter summary table.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/yolou_trace") -> Iterator[None]:
    """Capture an XLA/TPU profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time / throughput tracker for training loops."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    @property
    def step_time(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    def images_per_sec(self, batch_size: int) -> float:
        st = self.step_time
        return batch_size / st if st > 0 else float("nan")


def summarize_params(params: Dict, max_depth: int = 2) -> str:
    """torchinfo.summary-style table of parameter counts by subtree."""
    rows = []

    def count(tree) -> int:
        return sum(x.size for x in jax.tree_util.tree_leaves(tree))

    def walk(tree, path, depth):
        if depth >= max_depth or not isinstance(tree, dict):
            rows.append(("/".join(path), count(tree)))
            return
        for k in sorted(tree.keys(), key=lambda s: (len(s), s)):
            walk(tree[k], path + [k], depth + 1)

    walk(params, [], 0)
    total = count(params)
    width = max(len(r[0]) for r in rows) if rows else 10
    lines = [f"{'module':<{width}}  params"]
    lines += [f"{name:<{width}}  {n:,}" for name, n in rows]
    lines.append(f"{'TOTAL':<{width}}  {total:,}")
    return "\n".join(lines)


def device_memory_stats() -> Dict[str, float]:
    """Peak/current device memory (the torch.cuda.max_memory_reserved
    equivalent, train.py:448), where the backend exposes it."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return {k: v / 1e9 for k, v in stats.items()
                if isinstance(v, (int, float))}
    except Exception:
        return {}
