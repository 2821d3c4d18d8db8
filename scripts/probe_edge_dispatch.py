#!/usr/bin/env python
"""Attribute the e2e backend whale: the single `_match_edges_symmetric`
dispatch measures a dead-constant ~0.84 s/keyframe on the tunnel (round-4
FG_STAGE_TIMERS run) while its device cost by the R-delta tables should be
~30-50 ms. This probe separates, for the SAME program + inputs the e2e
backend uses (oracle_timing params, dense edge matcher, b=1 bucket):

  A. serialized wall    — dispatch, sync, repeat (what the backend pays
                          today: add_factors is followed by a frac
                          readback that forces completion)
  B. pipelined wall     — dispatch N with varying inputs, sync once; if
                          per-call wall collapses toward the device cost,
                          the overhead is host/relay dispatch work that
                          OVERLAPS device execution (fix = overlap, e.g.
                          dispatch the decode before draining the window)
  C. split programs     — decode-only then match-only as two dispatches;
                          if each small program pays proportionally less,
                          the cost scales with program/arg size (fix =
                          restructure programs), else it's a flat floor.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_edge_dispatch.py
"""

from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

import bench
from mast3r_slam_tpu import config as config_mod
from mast3r_slam_tpu.models import (MASt3RConfig, init_params, mast3r,
                                    oracle, oracle_timing)
from mast3r_slam_tpu.ops import dense_matcher
from mast3r_slam_tpu.slam.factor_graph import (MatchingConfig,
                                               _match_edges_symmetric)
from mast3r_slam_tpu.utils.timing import device_sync


def main():
    h, w = 384, 512
    model_cfg = MASt3RConfig(img_size=(h, w), dtype="bfloat16",
                             head_dtype="bfloat16")
    net_params = init_params(jax.random.PRNGKey(0), model_cfg)
    traj = bench._make_traj(16, 0.0)
    oparams = oracle.make_params(traj, desc_dim=model_cfg.desc_dim)
    params = oracle_timing.make_params(net_params, oparams)

    cfg = config_mod.load_config(REPO / "configs" / "tpu_fast.yaml")
    mcfg = config_mod.make_matching_config(cfg)

    rng = np.random.default_rng(7)
    n_in = 10
    feats, poss = [], []
    for i in range(n_in):
        img = oracle_timing.make_frame_image(i, h, w, rng)[None]
        f, p = oracle_timing.encode(params, jnp.asarray(img), model_cfg)
        feats.append(f)
        poss.append(p)
    device_sync(feats[-1])
    print("encoded", flush=True)

    def call(i, j):
        return _match_edges_symmetric(params, model_cfg, mcfg,
                                      feats[i], poss[i], feats[j], poss[j],
                                      1, "dense", oracle_timing)

    # warm (compile)
    t0 = time.perf_counter()
    m = call(0, 1)
    device_sync(m["idx_i2j"])
    print(f"warm compile+run {time.perf_counter() - t0:.2f}s", flush=True)

    # A: serialized
    pairs = [(i, i + 1) for i in range(1, 9)]
    t0 = time.perf_counter()
    for i, j in pairs[:4]:
        m = call(i, j)
        device_sync(m["idx_i2j"])
    a = (time.perf_counter() - t0) / 4
    print(f"A serialized      {a * 1000:8.1f} ms/call", flush=True)

    # B: pipelined (dispatch all, sync once)
    t0 = time.perf_counter()
    ms = [call(i, j) for i, j in pairs[4:8]]
    t_disp = (time.perf_counter() - t0) / 4
    for m in ms:
        device_sync(m["idx_i2j"])
    b = (time.perf_counter() - t0) / 4
    print(f"B pipelined       {b * 1000:8.1f} ms/call "
          f"(dispatch-only {t_disp * 1000:.1f} ms/call)", flush=True)

    # C: split decode / match
    @jax.jit
    def decode_only(params, fi, pi, fj, pj):
        return oracle_timing.inference_symmetric(params, fi, pi, fj, pj,
                                                 model_cfg)

    @jax.jit
    def match_only(out):
        X11 = jnp.concatenate([out["Xii"], out["Xjj"]], axis=0)
        X21 = jnp.concatenate([out["Xji"], out["Xij"]], axis=0)
        D11 = jnp.concatenate([out["Dii"], out["Djj"]], axis=0)
        D21 = jnp.concatenate([out["Dji"], out["Dij"]], axis=0)
        return dense_matcher.match_dense(
            X11, X21, D11, D21, dist_thresh=mcfg.dist_thresh,
            fine_radius=mcfg.radius, lambda_init=mcfg.lambda_init,
            convergence_thresh=mcfg.convergence_thresh)

    out = decode_only(params, feats[0], poss[0], feats[1], poss[1])
    device_sync(out["Xii"])
    idx, valid = match_only(out)
    device_sync(idx)
    t0 = time.perf_counter()
    for i, j in pairs[:4]:
        out = decode_only(params, feats[i], poss[i], feats[j], poss[j])
        device_sync(out["Xii"])
    cd = (time.perf_counter() - t0) / 4
    print(f"C decode-only     {cd * 1000:8.1f} ms/call", flush=True)
    outs = [decode_only(params, feats[i], poss[i], feats[j], poss[j])
            for i, j in pairs[4:8]]
    for o in outs:
        device_sync(o["Xii"])
    t0 = time.perf_counter()
    for o in outs:
        idx, valid = match_only(o)
        device_sync(idx)
    cm = (time.perf_counter() - t0) / 4
    print(f"C match-only      {cm * 1000:8.1f} ms/call", flush=True)

    # floor reference: a tiny program dispatched the same way
    tiny = jax.jit(lambda x: x * 2.0 + 1.0)
    xs = [jnp.full((8,), float(i)) for i in range(8)]
    y = tiny(xs[0]); device_sync(y)
    t0 = time.perf_counter()
    for i in range(1, 5):
        y = tiny(xs[i]); device_sync(y)
    fl = (time.perf_counter() - t0) / 4
    print(f"floor (tiny jit)  {fl * 1000:8.1f} ms/call", flush=True)

    # D: bucket-size x matcher sweep (the e2e pads candidates to power-of-2
    # buckets; the round-4 stage timers show a dead-constant 0.844 s —
    # which bucket/matcher combination does that correspond to?)
    def call_b(i, j, b, matcher):
        fi = jnp.concatenate([feats[(i + t) % n_in] for t in range(b)])
        pi = jnp.concatenate([poss[(i + t) % n_in] for t in range(b)])
        fj = jnp.concatenate([feats[(j + t) % n_in] for t in range(b)])
        pj = jnp.concatenate([poss[(j + t) % n_in] for t in range(b)])
        return _match_edges_symmetric(params, model_cfg, mcfg, fi, pi,
                                      fj, pj, 1, matcher, oracle_timing)

    for matcher in ("dense", "iter_proj"):
        for b in (1, 2, 4):
            m = call_b(0, 1, b, matcher)
            device_sync(m["idx_i2j"])   # compile + warm
            t0 = time.perf_counter()
            for r in range(3):
                m = call_b(1 + r, 5 + r, b, matcher)
                device_sync(m["idx_i2j"])
            dt = (time.perf_counter() - t0) / 3
            print(f"D {matcher:9s} b={b}  {dt * 1000:8.1f} ms/call",
                  flush=True)


if __name__ == "__main__":
    main()
