"""Timing utilities (tic/toc + per-stage accumulators).

Replacement for the reference's CUDA-event timer
(/root/reference/mast3r_slam/tictoc.py) — on TPU, host wall-clock around a
forced device sync is the honest measurement (``jax.block_until_ready`` is
insufficient through relayed backends, so we sync via a scalar readback).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


def device_sync(x=None):
    """Force a real device sync by reading back a scalar."""
    import jax
    import jax.numpy as jnp

    if x is None:
        x = jnp.zeros(())
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32).ravel()[:1]))


class Timer:
    """Accumulating per-stage timer with optional device sync."""

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._t0 = {}

    def tic(self, name: str = "default"):
        if self.sync:
            device_sync()
        self._t0[name] = time.perf_counter()

    def toc(self, name: str = "default", result=None):
        if self.sync:
            device_sync(result)
        dt = time.perf_counter() - self._t0[name]
        self.totals[name] += dt
        self.counts[name] += 1
        return dt

    @contextlib.contextmanager
    def section(self, name: str):
        self.tic(name)
        yield
        self.toc(name)

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals):
            n = self.counts[name]
            avg = self.totals[name] / max(n, 1)
            lines.append(f"{name}: {self.totals[name]:.3f}s total, "
                         f"{avg * 1000:.1f}ms avg over {n}")
        return "\n".join(lines)


_GLOBAL = Timer()


def tic(name: str = "default"):
    _GLOBAL.tic(name)


def toc(name: str = "default"):
    return _GLOBAL.toc(name)


class ProfilerTrace:
    """jax.profiler trace capture (SURVEY §5.1: TPU-side tracing).

    Usage: ``with ProfilerTrace("/tmp/trace"):`` or via main.py
    ``--profile-dir``. View with TensorBoard or xprof.
    """

    def __init__(self, logdir):
        self.logdir = str(logdir)

    def __enter__(self):
        import jax

        jax.profiler.start_trace(self.logdir)
        return self

    def __exit__(self, *exc):
        import jax

        jax.profiler.stop_trace()
        return False
