"""Profiling and timing utilities.

Reference analog: the wall-clock brackets with ``torch.cuda.synchronize``
around training and the 100-render FPS loops (train.py:126-155, :183-187).
TPU equivalents: host-fetch-synced timers (the only reliable sync on some
remote runtimes) and a ``jax.profiler`` trace context for capturing device
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import numpy as np


def sync(tree) -> None:
    """Force completion by host-fetching one element of one leaf.

    ``jax.block_until_ready`` is not reliable on all remote runtimes; a host
    fetch is.
    """
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.tree.leaves(tree)[0]).reshape(-1)[:1]
    _ = np.asarray(leaf).reshape(-1)[0]


class Timer:
    """Host-fetch-synced timing bracket.

    >>> with Timer() as t:
    ...     out = step(state)
    ...     t.sync_on(out)
    >>> t.elapsed
    """

    def __enter__(self):
        self.t0 = time.perf_counter()
        self.elapsed = None
        return self

    def sync_on(self, tree):
        self._tree = tree

    def __exit__(self, *exc):
        if getattr(self, "_tree", None) is not None:
            sync(self._tree)
        self.elapsed = time.perf_counter() - self.t0
        return False


def time_fn(f: Callable, *args, iters: int = 100, warmup: int = 1,
            chain: bool = False) -> float:
    """Seconds per call, honest protocol: warm calls + host fetch, then
    ``iters`` calls + one final fetch. With ``chain=True``, f's first arg is
    replaced by its own output each call (defeats input-identical dedup)."""
    x = args[0] if args else None
    for _ in range(warmup):
        out = f(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
        if chain:
            args = (out,) + args[1:]
    sync(out)
    return (time.perf_counter() - t0) / iters


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (TensorBoard/Perfetto viewable)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
