"""Tracing / profiling utilities.

The reference has no profiling support (SURVEY.md §5: tqdm progress bars
only).  Here: readback-synced step timing (this environment's TPU backend
returns from ``block_until_ready`` before execution finishes, so wall-clock
timing must be anchored on a host readback), a throughput tracker, and a
gated ``jax.profiler`` trace context for environments where the profiler
plugin works.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np
import jax


def enable_compilation_cache(path: str = "/root/repo/.jax_cache") -> None:
    """Enable JAX's persistent compilation cache (verified working on the
    axon backend: ~1.5 s compile → ~0.3 s reload in a fresh process).

    min_compile_time is forced to 0 because the tunnel backend reports
    near-zero local compile durations, which would skip every entry at the
    default threshold.  Call early — before the first ``jit`` compilation.
    """
    try:
        if jax.default_backend() == "cpu":
            # local CPU compiles are fast, and persisted CPU AOT executables
            # reload with machine-feature mismatch warnings (risk of SIGILL)
            return
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or unsupported backend: caching is best-effort


def sync(tree) -> None:
    """Force real device synchronization via a tiny host readback."""
    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0].ravel()[0:1])


class StepTimer:
    """Per-step wall-clock stats with correct device synchronization.

    Usage::

        timer = StepTimer()
        for batch in data:
            with timer.step(n_items=batch_size):
                out = train_step(...)
                timer.mark(out)      # sync anchor
        print(timer.summary())
    """

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self.items: List[int] = []
        self._t0: Optional[float] = None
        self._n = 0

    @contextlib.contextmanager
    def step(self, n_items: int = 1):
        self._t0 = time.perf_counter()
        self._n = n_items
        yield self
        # if mark() wasn't called, count dispatch time only
        if self._t0 is not None:
            self._finish()

    def mark(self, out) -> None:
        sync(out)
        self._finish()

    def _finish(self) -> None:
        dt = time.perf_counter() - self._t0
        self._t0 = None
        self.times.append(dt)
        self.items.append(self._n)

    def summary(self) -> Dict[str, float]:
        ts = np.asarray(self.times[self.warmup:] or self.times)
        its = np.asarray(self.items[self.warmup:] or self.items)
        return {
            "steps": int(len(ts)),
            "p50_ms": float(np.percentile(ts, 50) * 1e3),
            "p90_ms": float(np.percentile(ts, 90) * 1e3),
            "mean_ms": float(ts.mean() * 1e3),
            "items_per_sec": float(its.sum() / ts.sum()) if ts.sum() else 0.0,
        }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; no-op if the profiler is unavailable on
    the current backend (e.g. experimental TPU tunnels)."""
    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # profiler plugin missing/unsupported
        print(f"[profiling] trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
