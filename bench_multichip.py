#!/usr/bin/env python
"""Multi-chip scaling benchmark: global-BA throughput (keyframes/s).

BASELINE.md target: >= 0.8 scaling efficiency on global-BA keyframes/s.
Measures the edge-sharded distributed Gauss-Newton (parallel/dist_ba.py)
on a 1-device vs an N-device mesh over a synthetic pose graph sized like a
real run (capacity-padded, h*w points per edge).

On a single-chip host this runs on a virtual CPU mesh
(--xla_force_host_platform_device_count) — demonstrating the sharded code
path and its collective structure; absolute numbers need real chips.

Prints one JSON line:
  {"metric": "ba_scaling_efficiency", "value": eff, "unit": "x",
   "devices": N, "kf_per_s_1dev": a, "kf_per_s_ndev": b}
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--n-kf", type=int, default=16)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU mesh")
    ap.add_argument("--schur", action="store_true",
                    help="use the Schur-complement solver (parallel/schur.py)"
                         " on the N-device mesh instead of the dense psum")
    args = ap.parse_args()

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax

    if args.cpu or jax.device_count() < args.devices:
        jax.config.update("jax_platforms", "cpu")
        from jax.extend.backend import clear_backends

        clear_backends()

    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.parallel import dist_ba, mesh as mesh_mod
    from mast3r_slam_tpu.slam import ba

    n_dev = min(args.devices, jax.device_count())
    n_kf, P = args.n_kf, args.points
    key = jax.random.PRNGKey(0)

    pts_w = jax.random.normal(key, (P, 3)) + jnp.array([0.0, 0.0, 4.0])
    T_true = [sim3.identity()]
    for i in range(1, n_kf):
        xi = 0.05 * jax.random.normal(jax.random.fold_in(key, i), (7,))
        T_true.append(sim3.mul(T_true[-1], sim3.exp(xi)))
    T_true = jnp.stack(T_true)
    Xs = jax.vmap(lambda T: sim3.act(sim3.inv(T), pts_w))(T_true)
    Cs = jnp.full((n_kf, P), 5.0)

    pairs = [(i, i + 1) for i in range(n_kf - 1)] + [
        (i, i + 4) for i in range(n_kf - 4)
    ]
    ii = jnp.array([p for a, b in pairs for p in (a, b)], jnp.int32)
    jj = jnp.array([p for a, b in pairs for p in (b, a)], jnp.int32)
    E = ii.shape[0]
    idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (E, P))
    valid = jnp.ones((E, P), bool)
    Q = jnp.full((E, P), 4.0)
    mask = jnp.ones((E,), jnp.float32)

    noise = 0.03 * jax.random.normal(jax.random.fold_in(key, 9), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)
    cfg = ba.BAConfig(max_iters=10, point_chunk=min(4096, P))

    def run_mesh(nd):
        m = mesh_mod.make_mesh(nd)
        if args.schur and nd > 1:
            from mast3r_slam_tpu.parallel import schur

            part, order, keep = schur.schur_partition(ii, jj, mask,
                                                      K_cap=n_kf,
                                                      n_shards=nd)
            ii_r, jj_r, idx_r, valid_r, Q_r, mask_r = schur.reorder_edges(
                order, keep, ii, jj, idx, valid, Q, mask)
            f = lambda: schur.gauss_newton_rays_schur(
                T_init, Xs, Cs, jnp.asarray(part.owner),
                jnp.asarray(part.int_slot), jnp.asarray(part.sep_slot),
                jnp.asarray(ii_r), jnp.asarray(jj_r), jnp.asarray(idx_r),
                jnp.asarray(valid_r), jnp.asarray(Q_r), jnp.asarray(mask_r),
                jnp.asarray(n_kf), part.I_cap, part.S_cap, m, cfg)
        else:
            pad = lambda a, fill=0: mesh_mod.pad_to_multiple(a, nd, 0, fill)
            f = lambda: dist_ba.gauss_newton_rays_dist(
                T_init, Xs, Cs, pad(ii), pad(jj), pad(idx), pad(valid, False),
                pad(Q), pad(mask), jnp.asarray(n_kf), m, cfg)
        float(jnp.sum(f()))  # compile + warm
        t0 = time.time()
        for _ in range(args.iters):
            out = f()
        float(jnp.sum(out))
        dt = (time.time() - t0) / args.iters
        return n_kf / dt

    kf_s_1 = run_mesh(1)
    kf_s_n = run_mesh(n_dev)
    eff = kf_s_n / (kf_s_1 * n_dev)
    platform = jax.devices()[0].platform
    out = {
        "metric": "ba_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "x",
        "devices": n_dev,
        "kf_per_s_1dev": round(kf_s_1, 2),
        "kf_per_s_ndev": round(kf_s_n, 2),
        "platform": platform,
    }
    if platform == "cpu":
        out["note"] = ("virtual host-device mesh shares physical cores; "
                       "efficiency ceiling = n_cores/devices, not 1.0")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
