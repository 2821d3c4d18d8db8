#!/usr/bin/env python
"""Per-stage steady-state timings on the live chip (see DEVELOPMENT.md).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_stages.py
Varies input *values* between timed reps (the relay caches bit-identical
calls) and syncs via scalar readback (block_until_ready is unreliable).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import MASt3RConfig, init_params, mast3r
from mast3r_slam_tpu.ops import matching, dense_matcher
from mast3r_slam_tpu.ops.window_gather import refine_matches_unfold
from mast3r_slam_tpu.slam import tracker as tracker_mod
from mast3r_slam_tpu.utils.timing import device_sync


def timeit(name, fn, inputs, reps=4):
    """fn(*inputs[i]) for distinct input sets; returns avg ms."""
    out = fn(*inputs[0])
    device_sync(out)
    t0 = time.perf_counter()
    outs = []
    for i in range(reps):
        outs.append(fn(*inputs[(i + 1) % len(inputs)]))
    for o in outs:
        device_sync(o)
    dt = (time.perf_counter() - t0) / reps * 1000
    print(f"{name:36s} {dt:8.1f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="all",
                    help="comma list: model,match,refine,gn,dense")
    args = ap.parse_args()
    want = set(args.stages.split(","))

    def on(s):
        return "all" in want or s in want

    h, w = 384, 512
    n = h * w
    key = jax.random.PRNGKey(0)
    ks = [jax.random.fold_in(key, i) for i in range(64)]
    kit = iter(ks)

    if on("model"):
        cfg = MASt3RConfig(img_size=(h, w), dtype="bfloat16",
                           head_dtype="bfloat16")
        params = init_params(next(kit), cfg)
        imgs = [jax.random.normal(next(kit), (1, h, w, 3)) for _ in range(5)]
        enc = jax.jit(lambda p, im: mast3r.encode(p, im, cfg))
        timeit("encode (ViT-L bf16)", enc, [(params, im) for im in imgs])
        f0, p0 = enc(params, imgs[0])
        feats = [enc(params, im) for im in imgs]
        dec = jax.jit(lambda p, f, q, g, r: mast3r.inference_asymmetric(
            p, f, q, g, r, cfg))
        timeit("dual decode + heads", dec,
               [(params, f, q, f0, p0) for f, q in feats])

    # synthetic geometry: smooth pointmaps so the matcher behaves like real
    def mk_maps(k):
        k1, k2, k3 = jax.random.split(k, 3)
        uv = jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, w),
                                    jnp.linspace(-0.75, 0.75, h),
                                    indexing="xy"), -1)
        z = 2.0 + 0.5 * jnp.sin(uv[..., 0] * 3) * jnp.cos(uv[..., 1] * 2)
        z = z + 0.05 * jax.random.normal(k1, (h, w))
        X = jnp.concatenate([uv * z[..., None], z[..., None]], -1)[None]
        D = jax.random.normal(k2, (1, h, w, 24), jnp.bfloat16)
        X2 = X + 0.02 * jax.random.normal(k3, X.shape)
        return X, X2, D

    sets = [mk_maps(next(kit)) for _ in range(5)]

    if on("match"):
        def ip(X, X2, D):
            rg = matching.prep_rays_grad(X)
            pts = matching._normalize(X2.reshape(1, n, 3))
            p0 = matching.lin_to_pixel(
                jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (1, n)),
                w).astype(X.dtype)
            return matching.iter_proj(rg, pts, p0, 10)

        timeit("iter_proj 10 it (incl prep)", jax.jit(ip), sets)

        def ip2(X, X2, D):
            rg = matching.prep_rays_grad(X)
            pts = matching._normalize(X2.reshape(1, n, 3))
            p0 = matching.lin_to_pixel(
                jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (1, n)),
                w).astype(X.dtype)
            return matching.iter_proj(rg, pts, p0, 2)

        timeit("iter_proj 2 it (incl prep)", jax.jit(ip2), sets)

        for dm in (2, 5):
            fm = jax.jit(lambda X, X2, D, dm=dm: matching.match(
                X, X2, D, D, dilation_max=dm))
            timeit(f"match full (dilation_max={dm})", fm, sets)

    if on("refine"):
        p1 = [(D, jax.random.randint(k, (1, n, 2), 3, 300, jnp.int32))
              for (_, _, D), k in zip(sets, ks[40:])]
        for dm in (1, 2, 5):
            rf = jax.jit(lambda D, p, dm=dm: refine_matches_unfold(
                D, D.reshape(1, n, 24), p, 3, dm))
            timeit(f"refine_unfold dilation_max={dm}", rf, p1)

    if on("gn"):
        tcfg = tracker_mod.TrackerConfig()
        tcfg_f = tcfg._replace(rel_error=0.0, delta_norm=0.0)  # forced 50 it
        def mk_gn(k):
            k1, k2 = jax.random.split(k)
            Xk = jax.random.normal(k1, (n, 3)) + jnp.asarray([0, 0, 3.0])
            tau = 0.03 * jax.random.normal(k2, (7,))
            T = sim3.exp(tau)
            Xf = sim3.act(sim3.inv(T), Xk)
            Q = jnp.full((n, 1), 4.0)
            v = jnp.ones((n, 1), bool)
            return Xf, Xk, sim3.identity(), Q, v
        gn_in = [mk_gn(k) for k in ks[50:55]]
        gn50 = jax.jit(lambda *a: tracker_mod.opt_pose_ray_dist_sim3(
            *a, tcfg_f).T_CkCf)
        timeit("tracker GN 50 forced iters", gn50, gn_in)
        gn = jax.jit(lambda *a: tracker_mod.opt_pose_ray_dist_sim3(
            *a, tcfg).T_CkCf)
        timeit("tracker GN adaptive", gn, gn_in)

    if on("layout"):
        # Is (N, small) vs (small, N) layout material on this backend?
        N = h * w * 4
        a_nm = [jax.random.normal(k, (N, 7)) for k in ks[20:24]]
        a_mn = [jax.random.normal(k, (7, N)) for k in ks[24:28]]

        f_nm = jax.jit(lambda a: (jnp.tanh(a * 1.1) + a * a).T @ a)
        f_mn = jax.jit(lambda a: (jnp.tanh(a * 1.1) + a * a) @ a.T)
        timeit("elemwise+H (N,7) layout", f_nm, [(a,) for a in a_nm])
        timeit("elemwise+H (7,N) layout", f_mn, [(a,) for a in a_mn])

        b_nm = [jax.random.normal(k, (N // 4, 4, 7)) for k in ks[28:32]]
        f3 = jax.jit(lambda a: jnp.einsum(
            "nri,nrj->ij", jnp.tanh(a * 1.1) + a * a, a,
            preferred_element_type=jnp.float32))
        timeit("elemwise+H (N,4,7) layout", f3, [(a,) for a in b_nm])
        b_mn = [jax.random.normal(k, (4, 7, N // 4)) for k in ks[32:36]]
        f4 = jax.jit(lambda a: jnp.einsum(
            "rin,rjn->ij", jnp.tanh(a * 1.1) + a * a, a,
            preferred_element_type=jnp.float32))
        timeit("elemwise+H (4,7,N) layout", f4, [(a,) for a in b_mn])

    if on("dense"):
        dm_fn = jax.jit(lambda X, X2, D: dense_matcher.match_dense(
            X, X2, D, D))
        timeit("dense matcher (default cfg)", dm_fn, sets)


if __name__ == "__main__":
    main()
