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


_SYNC_SEQ = [0]
_SYNC_FNS = {}


def device_sync(x=None):
    """Force a real device sync by reading back a scalar.

    The read-back VALUE must differ on every call: the relayed backend
    serves bit-identical results from a cache without draining the queue
    (DEVELOPMENT.md quirk 4), so ``sum(zeros())`` is a no-op sync — a
    monotonic counter is mixed into the scalar to defeat it. One jitted
    dispatch per call (eager formulations pay several relay floors)."""
    import jax
    import jax.numpy as jnp

    _SYNC_SEQ[0] += 1
    salt = jnp.float32(_SYNC_SEQ[0])
    leaves = jax.tree_util.tree_leaves(x) if x is not None else []
    if not leaves:
        leaves = [salt]
    if "fn" not in _SYNC_FNS:
        _SYNC_FNS["fn"] = jax.jit(
            lambda v, s: jnp.sum(v.astype(jnp.float32).ravel()[:1]) + s)
    float(_SYNC_FNS["fn"](leaves[0], salt))


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
