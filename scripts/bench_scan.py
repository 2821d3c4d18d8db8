#!/usr/bin/env python
"""Amortized per-op timings: K executions chained by data dependency inside
one jit (UNROLLED python loop, not lax.scan — scanning gather-heavy ops on
this backend degrades them ~100x, see DEVELOPMENT.md). Prints per-exec ms
after subtracting nothing; the single dispatch's ~30-40 ms tunnel latency is
divided across K."""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.ops import matching
from mast3r_slam_tpu.ops.window_gather import refine_matches_unfold
from mast3r_slam_tpu.slam import tracker as tracker_mod
from mast3r_slam_tpu.utils.timing import device_sync

H, W = 384, 512
N = H * W
K_CHAIN = 4


def chain_time(name, step, x0, reps=3):
    """step: x -> x (same pytree structure); chained K_CHAIN times in one
    jit. Per-exec ms printed."""

    @jax.jit
    def run(x, seed):
        x = jax.tree_util.tree_map(
            lambda a: a + seed.astype(a.dtype) if jnp.issubdtype(
                a.dtype, jnp.floating) else a, x)
        for _ in range(K_CHAIN):
            x = step(x)
        return x

    out = run(x0, jnp.zeros(()))
    device_sync(out)
    t0 = time.perf_counter()
    outs = [run(x0, jnp.full((), float(i + 1) * 1e-3)) for i in range(reps)]
    for o in outs:
        device_sync(o)
    dt = (time.perf_counter() - t0) / (reps * K_CHAIN) * 1000
    print(f"{name:46s} {dt:8.2f} ms/exec  (K={K_CHAIN})", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="all")
    args = ap.parse_args()
    want = set(args.stages.split(","))

    def on(s):
        return "all" in want or s in want

    key = jax.random.PRNGKey(0)
    ks = [jax.random.fold_in(key, i) for i in range(64)]

    if on("gather"):
        rows = N
        for dt_name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
            for width in (18, 32, 128, 168, 256, 336):
                tab = jax.random.normal(ks[0], (rows, width), dt)
                i0 = jax.random.randint(ks[1], (N,), 0, rows)

                def step(x, tab=tab, rows=rows):
                    i, acc = x
                    g = jnp.take(tab, i, axis=0)
                    s = jnp.sum(g.astype(jnp.float32), axis=-1)
                    return ((i + s.astype(jnp.int32)) % rows, acc + s[0])

                chain_time(f"take {dt_name} w={width} n=192k", step,
                           (i0, jnp.zeros(())))

    if on("refine"):
        D = jax.random.normal(ks[2], (1, H, W, 24), jnp.bfloat16)
        Dq = jax.random.normal(ks[3], (1, N, 24), jnp.bfloat16)
        p0 = jax.random.randint(ks[4], (1, N, 2), 3, 300)

        for dm in (1, 2):
            def step(p1, dm=dm):
                out = refine_matches_unfold(D, Dq, p1, 3, dm)
                return (out + 1) % 300 + 3

            chain_time(f"refine_unfold dm={dm}", step, p0)

    if on("iterproj"):
        uv = jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, W),
                                    jnp.linspace(-.75, .75, H),
                                    indexing="xy"), -1)
        z = 2.0 + 0.5 * jnp.sin(uv[..., 0] * 3) * jnp.cos(uv[..., 1] * 2)
        X = jnp.concatenate([uv * z[..., None], z[..., None]], -1)[None]
        rg = matching.prep_rays_grad(X)
        X2 = X + 0.02 * jax.random.normal(ks[5], X.shape)
        pts = matching._normalize(X2.reshape(1, N, 3))
        p0 = jax.random.uniform(ks[6], (1, N, 2)) * 300 + 3

        for it in (1, 5):
            def step(p, it=it):
                pn, cv = matching.iter_proj(rg, pts, p, it)
                return pn

            chain_time(f"iter_proj {it} iters (no prep)", step, p0)

    if on("gn"):
        Xk = jax.random.normal(ks[7], (N, 3)) + jnp.asarray([0, 0, 3.0])
        Q = jnp.full((N, 1), 4.0)
        v = jnp.ones((N, 1), bool)
        tcfg = tracker_mod.TrackerConfig()._replace(
            rel_error=0.0, delta_norm=0.0, max_iters=10)

        def step(x):
            tau, acc = x
            Xf = sim3.act(sim3.inv(sim3.exp(tau)), Xk)
            r = tracker_mod.opt_pose_ray_dist_sim3(
                Xf, Xk, sim3.identity(), Q, v, tcfg)
            return (tau + r.T_CkCf[:7] * 1e-9, acc + r.cost)

        chain_time("tracker GN 10 forced iters", step,
                   (0.03 * jax.random.normal(ks[8], (7,)), jnp.zeros(())))


if __name__ == "__main__":
    main()
