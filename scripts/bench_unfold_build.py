#!/usr/bin/env python
"""R-delta comparison of the refine-window BUILD implementations on chip.

The matcher's full-window unfold build (~5 ms of the 14.4 ms matcher,
DEVELOPMENT.md) moves 25x the descriptor image through HBM at ~94 GB/s —
~8x below roofline. Candidates measured here, in production-like dataflow
(descriptor image varies per step so the build cannot be hoisted):

  slice_concat — ops.window_gather.build_unfolded_windows (shipped)
  conv_patches — build_unfolded_windows_patches (lax im2col lowering)

Each timed as build + ONE full refine gather+argmax pass (the consumer
forces the build's layout to be materialized as production uses it).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_unfold_build.py
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from mast3r_slam_tpu.ops import window_gather as wg

H, W, C = 384, 512, 24
N = H * W
R1, R8 = 1, 8


def refine_from_build(build_fn, channel_major):
    k = 5
    r = 2

    def one(D, Dq, u0, v0):
        U2 = build_fn(D, 1, r)
        wnd = wg.gather_dilated_windows_full(U2, u0, v0, 1, r)
        n = wnd.shape[0]
        if channel_major:                      # (c, i, j) feature blocks
            cand = wnd.reshape(n, C, k * k)
            s = jnp.einsum("nck,nc->nk", cand.astype(jnp.float32),
                           Dq.astype(jnp.float32))
        else:                                  # (i, j, c) feature blocks
            cand = wnd.reshape(n, k * k, C)
            s = jnp.einsum("nkc,nc->nk", cand.astype(jnp.float32),
                           Dq.astype(jnp.float32))
        best = jnp.argmax(s, axis=-1).astype(jnp.int32)
        u = jnp.clip(u0 + best % k - r, 0, W - 1)
        v = jnp.clip(v0 + best // k - r, 0, H - 1)
        return u, v

    return one


def chain(one, reps):
    """reps sequential (data-dependent) build+refine passes in one jit."""

    @jax.jit
    def fn(D, Dq, u0, v0):
        for i in range(reps):
            u0, v0 = one(D + (u0[0] % 2).astype(D.dtype) * 1e-6, Dq, u0, v0)
        return u0, v0

    return fn


def run(name, build_fn, channel_major, D, Dq, u0, v0):
    one = refine_from_build(build_fn, channel_major)
    f1 = chain(one, R1)
    f8 = chain(one, R8)
    o = f1(D, Dq, u0, v0)
    _ = float(jnp.sum(o[0]))
    o = f8(D, Dq, u0, v0)
    _ = float(jnp.sum(o[0]))

    def t(f, ntimes=6):
        ts = []
        for i in range(ntimes):
            Dv = D + np.float32(i + 1) * 1e-6   # vary values (relay cache)
            t0 = time.time()
            o = f(Dv, Dq, u0, v0)
            _ = float(jnp.sum(o[0]))
            ts.append(time.time() - t0)
        return min(ts)

    t1 = t(f1)
    t8 = t(f8)
    per = (t8 - t1) / (R8 - R1) * 1e3
    print(f"{name}: R1={t1 * 1e3:.1f} ms R8={t8 * 1e3:.1f} ms "
          f"-> {per:.2f} ms per build+refine", flush=True)
    return per


def main():
    key = jax.random.PRNGKey(0)
    D = jax.random.normal(key, (H, W, C), jnp.float32).astype(jnp.bfloat16)
    Dq = jax.random.normal(jax.random.fold_in(key, 1), (N, C),
                           jnp.float32).astype(jnp.bfloat16)
    u0 = jax.random.randint(jax.random.fold_in(key, 2), (N,), 2, W - 3,
                            jnp.int32)
    v0 = jax.random.randint(jax.random.fold_in(key, 3), (N,), 2, H - 3,
                            jnp.int32)

    # numeric cross-check first (positions must agree exactly)
    a = refine_from_build(wg.build_unfolded_windows, False)(D, Dq, u0, v0)
    b = refine_from_build(wg.build_unfolded_windows_patches, True)(
        D, Dq, u0, v0)
    same = (np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
            and np.array_equal(np.asarray(a[1]), np.asarray(b[1])))
    print(f"positions identical: {same}", flush=True)

    run("slice_concat", wg.build_unfolded_windows, False, D, Dq, u0, v0)
    run("conv_patches", wg.build_unfolded_windows_patches, True, D, Dq, u0,
        v0)


if __name__ == "__main__":
    main()
