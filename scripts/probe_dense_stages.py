#!/usr/bin/env python
"""Sub-stage timings of ops.dense_matcher.match_dense at the e2e edge-decode
batch (b=8 images: bucket-4 symmetric), to pin which stage carries the
~200 ms/pair edge-matching device cost (round-4 probe_edge_dispatch).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dense_stages.py
"""

from __future__ import annotations

import pathlib
import sys
import time
from functools import partial

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.ops import dense_matcher, matching
from mast3r_slam_tpu.ops.window_gather import refine_matches_unfold
from mast3r_slam_tpu.utils.timing import device_sync


def timeit(name, fn, inputs, reps=3):
    out = fn(*inputs[0])
    device_sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for i in range(reps):
        out = fn(*inputs[(i + 1) % len(inputs)])
        device_sync(jax.tree_util.tree_leaves(out)[0])
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:30s} {dt:8.1f} ms", flush=True)
    return dt


def main():
    h, w, f, b = 384, 512, 24, 8
    n = h * w
    key = jax.random.PRNGKey(0)
    ks = iter([jax.random.fold_in(key, i) for i in range(64)])

    def mk(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        X11 = jax.random.normal(k1, (b, h, w, 3)) + jnp.asarray([0, 0, 4.0])
        X21 = X11 + 0.01 * jax.random.normal(k2, (b, h, w, 3))
        D11 = jax.random.normal(k3, (b, h, w, f), dtype=jnp.bfloat16)
        D21 = D11 + 0.1 * jax.random.normal(k4, (b, h, w, f),
                                            dtype=jnp.bfloat16)
        return X11, X21, D11, D21

    sets = [mk(next(ks)) for _ in range(4)]

    full = jax.jit(lambda X11, X21, D11, D21: dense_matcher.match_dense(
        X11, X21, D11, D21))
    timeit("match_dense (full)", full, sets)

    coarse = jax.jit(lambda D21, D11: dense_matcher.coarse_correlate(
        D21.reshape(b, n, -1), D11, 4))
    timeit("coarse_correlate s4", coarse,
           [(s[3], s[2]) for s in sets])

    coarse8 = jax.jit(lambda D21, D11: dense_matcher.coarse_correlate(
        D21.reshape(b, n, -1), D11, 8))
    timeit("coarse_correlate s8", coarse8,
           [(s[3], s[2]) for s in sets])

    @jax.jit
    def lm(X11, X21, idx_c):
        rays_grad = matching.prep_rays_grad(X11)
        pts3d_norm = matching._normalize(X21.reshape(b, n, 3))
        p_init = matching.lin_to_pixel(idx_c, w).astype(X11.dtype)
        return matching.iter_proj(rays_grad, pts3d_norm, p_init, 3, 1e-8,
                                  1e-6)

    idxs = [coarse(s[3], s[2]) for s in sets]
    timeit("lm polish (3 it)", lm,
           [(s[0], s[1], i) for s, i in zip(sets, idxs)])

    @jax.jit
    def gate(X11, X21, p1i):
        lin = matching.pixel_to_lin(p1i, w)
        X11_flat = X11.reshape(b, n, 3)
        X11_at = jnp.take_along_axis(X11_flat, lin[..., None], axis=1)
        return jnp.linalg.norm(X11_at - X21.reshape(b, n, 3), axis=-1)

    p1is = [jnp.stack([i % w, i // w], -1).astype(jnp.int32) for i in idxs]
    timeit("occlusion gate", gate,
           [(s[0], s[1], p) for s, p in zip(sets, p1is)])

    fine = jax.jit(partial(refine_matches_unfold, radius=3, dilation_max=2))
    timeit("fine refine r3 d2", fine,
           [(s[2], s[3].reshape(b, n, -1), p) for s, p in zip(sets, p1is)])
    fine1 = jax.jit(partial(refine_matches_unfold, radius=3, dilation_max=1))
    timeit("fine refine r3 d1", fine1,
           [(s[2], s[3].reshape(b, n, -1), p) for s, p in zip(sets, p1is)])


def variants():
    """Post-rework sweep: full match_dense + fine_dilation variants."""
    h, w, f, b = 384, 512, 24, 8
    n = h * w
    key = jax.random.PRNGKey(0)
    ks = iter([jax.random.fold_in(key, 100 + i) for i in range(64)])

    def mk(k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        X11 = jax.random.normal(k1, (b, h, w, 3)) + jnp.asarray([0, 0, 4.0])
        X21 = X11 + 0.01 * jax.random.normal(k2, (b, h, w, 3))
        D11 = jax.random.normal(k3, (b, h, w, f), dtype=jnp.bfloat16)
        D21 = D11 + 0.1 * jax.random.normal(k4, (b, h, w, f),
                                            dtype=jnp.bfloat16)
        return X11, X21, D11, D21

    sets = [mk(next(ks)) for _ in range(4)]
    for fr, fd in ((2, 2), (2, 1), (3, 1)):
        fn = jax.jit(lambda X11, X21, D11, D21, fr=fr, fd=fd:
                     dense_matcher.match_dense(X11, X21, D11, D21,
                                               fine_radius=fr,
                                               fine_dilation=fd))
        timeit(f"match_dense r{fr} d{fd}", fn, sets)


if __name__ == "__main__":
    if "--variants" in sys.argv:
        variants()
    else:
        main()
