#!/usr/bin/env python
"""Instrumented single warm-pass of the e2e bench: logs per-frame match
stats (metrics JSONL) to localize the 512x384 oracle tracking skips the
round-3 bench health gate caught (8/49 frames skipped, each recovered by
reloc). CPU-repro first; falls back to the real chip when run without
JAX_PLATFORMS=cpu.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/debug_e2e_skips.py \
      [--h 384 --w 512] [--frames 49] [--window 8] [--oracle-only]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


class _Metrics:
    """Collect AND stream events (so a timeout still leaves partial data)."""

    def __init__(self):
        self.rows = []

    def log(self, **kw):
        self.rows.append(kw)
        print("EV", json.dumps(kw), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=384)
    ap.add_argument("--w", type=int, default=512)
    ap.add_argument("--frames", type=int, default=49)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--kf-every", type=int, default=4)
    ap.add_argument("--oracle-only", action="store_true",
                    help="pure oracle module (skip the real network ride-"
                         "along; much faster compiles)")
    ap.add_argument("--no-probes", action="store_true",
                    help="skip the per-window/per-backend-step finiteness "
                         "probes (each forces a device sync, serializing "
                         "the backend/frontend overlap — run without to "
                         "test async/donation interleaving)")
    ap.add_argument("--codebook", type=int, default=4096)
    ap.add_argument("--no-retrieval", action="store_true",
                    help="consecutive edges only (isolates loop-closure "
                         "edge proposals as a failure source)")
    ap.add_argument("--dump-ba", default="",
                    help="save every global-BA solve's inputs+output to "
                         "<prefix>NNN.npz (replay on CPU with "
                         "scripts/replay_ba.py to separate wrong-program "
                         "from wrong-input)")
    ap.add_argument("--kf-bucket-floor", type=int, default=8,
                    help="force the BA keyframe bucket (16 reproduces the "
                         "Kb=16 program from frame 1 — the frame-33/34 "
                         "failure onset coincides with the first Kb=16 "
                         "solve)")
    ap.add_argument("--stage-timers", action="store_true",
                    help="wall-clock per backend stage (device-synced)")
    ap.add_argument("--edge-matcher", default="",
                    help="override local_opt.matcher (dense | iter_proj)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        try:
            jax.extend.backend.clear_backends()
        except Exception:
            pass

    import numpy as np
    import jax

    import bench
    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.models import (MASt3RConfig, init_params, oracle,
                                        oracle_timing)
    from mast3r_slam_tpu.slam import retrieval as retrieval_mod
    from mast3r_slam_tpu.slam.system import SLAMSystem

    h, w, W = args.h, args.w, args.window
    n_frames = args.frames
    print(f"platform={jax.devices()[0].platform} {h}x{w} W={W} "
          f"n={n_frames}", file=sys.stderr, flush=True)

    model_cfg = MASt3RConfig(img_size=(h, w), dtype="bfloat16",
                             head_dtype="bfloat16")
    cfg = config_mod.load_config(REPO / "configs" / "tpu_fast.yaml")
    cfg["single_thread"] = True
    cfg["tracking"] = dict(cfg["tracking"], kf_every=args.kf_every)
    # capacities scale with the run length (the >=100-frame e2e
    # demonstration needs ~n/kf_every keyframes + reloc margin and ~8-10
    # two-way edges per keyframe)
    kf_cap = max(32, 2 * (n_frames // max(args.kf_every, 1) + 2))
    e_cap = max(128, 8 * kf_cap)
    cfg["runtime"] = dict(cfg.get("runtime", {}), tracking_window=W,
                          edge_bucket_floor=64,
                          kf_bucket_floor=args.kf_bucket_floor,
                          max_edge_capacity=e_cap)
    if args.edge_matcher:
        cfg["local_opt"] = dict(cfg["local_opt"], matcher=args.edge_matcher)

    traj = bench._make_traj(n_frames, 0.0)
    oparams = oracle.make_params(traj, desc_dim=model_cfg.desc_dim)
    if args.oracle_only:
        params, model_mod = oparams, oracle
        frames = [oracle.make_frame_image(i, h, w) for i in range(n_frames)]
    else:
        net_params = init_params(jax.random.PRNGKey(0), model_cfg)
        params = oracle_timing.make_params(net_params, oparams)
        model_mod = oracle_timing
        rng = np.random.default_rng(1234)
        frames = [oracle_timing.make_frame_image(i, h, w, rng)
                  for i in range(n_frames)]

    rparams = (None if args.no_retrieval
               else retrieval_mod.init_retrieval_params(
                   jax.random.PRNGKey(1),
                   backbone_dim=model_cfg.enc_embed_dim,
                   codebook_size=args.codebook))

    metrics = _Metrics()
    system = SLAMSystem(params, model_cfg, cfg, (h, w),
                        retrieval_params=rparams, keyframe_capacity=kf_cap,
                        edge_capacity=e_cap, metrics=metrics,
                        model_module=model_mod)

    # finiteness probes around every backend step and window consume: the
    # TPU failure mode is a non-finite tracker Cholesky from frame 34 on —
    # find WHICH state array goes bad, and WHEN
    def check(tag):
        n = len(system.keyframes)
        kf = system.keyframes
        for name, arr in [("T_WC", kf.T_WC[:n]), ("X", kf.X[:n]),
                          ("C", kf.C[:n]), ("score", kf.score[:n]),
                          ("feat", kf.feat[:n])]:
            a = np.asarray(arr)
            if not np.all(np.isfinite(a)):
                bad = np.argwhere(~np.isfinite(a).reshape(a.shape[0], -1)
                                  .all(axis=1)).ravel().tolist()
                print(f"NONFINITE {tag} {name} rows={bad}", flush=True)
        # correctness, not just finiteness: per-keyframe pose error vs the
        # known oracle trajectory (finite-but-wrong BA output would pass
        # the isfinite probes and still wreck the next window's T_init)
        if n >= 2:
            ids = np.asarray(kf.dataset_idx[:n])
            T_est = np.asarray(kf.T_WC[:n])
            T_gt = np.asarray(traj)[ids]
            terr = np.linalg.norm(T_est[:, :3] - T_gt[:, :3], axis=1)
            qerr = 1.0 - np.abs(np.sum(T_est[:, 3:7] * T_gt[:, 3:7],
                                       axis=1))
            print(f"POSE {tag} max_terr={terr.max():.4f} "
                  f"max_qerr={qerr.max():.5f} argmax={int(terr.argmax())}",
                  flush=True)

    orig_bs = system.backend_step
    orig_cw = system.consume_window

    def bs():
        r = orig_bs()
        if r:
            check("after_backend")
        return r

    def cw(pending):
        r = orig_cw(pending)
        check(f"after_window(consumed={r})")
        return r

    if not args.no_probes:
        system.backend_step = bs
        system.consume_window = cw

    if args.stage_timers:
        # wall-clock per backend stage, each ended with a device sync so
        # the time lands on the stage that queued it (first stage also
        # absorbs the in-flight window's device time)
        import time as _t

        from mast3r_slam_tpu.utils.timing import device_sync

        def timed(name, fn, sync_of=None):
            def wrapper(*a, **k):
                t0 = _t.time()
                r = fn(*a, **k)
                device_sync(sync_of() if sync_of else None)
                print(f"STAGE {name} {_t.time() - t0:.3f}s", flush=True)
                return r
            return wrapper

        if system.retrieval is not None:
            system.retrieval.update = timed("retrieval",
                                            system.retrieval.update)
        fg = system.factor_graph
        fg.add_factors = timed("add_factors", fg.add_factors,
                               sync_of=lambda: fg.Q)
        fg.solve_GN_rays = timed("ba_solve", fg.solve_GN_rays,
                                 sync_of=lambda: system.keyframes.T_WC)
    if args.dump_ba:
        fg = system.factor_graph
        orig_solve = fg.solve_GN_rays
        dump_n = [0]

        def dumping_solve():
            e = fg.n_edges
            n_kf = len(system.keyframes)
            pre = dict(
                T_WC=np.asarray(system.keyframes.T_WC),
                X=np.asarray(system.keyframes.X[: max(n_kf, 1)]),
                Cavg=np.asarray(
                    system.keyframes.average_confs()[: max(n_kf, 1)]),
                ii=np.asarray(fg.ii[:e]), jj=np.asarray(fg.jj[:e]),
                idx=np.asarray(fg.idx_ii2jj[:e]),
                vm=np.asarray(fg.valid_match[:e]),
                Q=np.asarray(fg.Q[:e]), n_kf=n_kf, n_edges=e)
            orig_solve()
            pre["T_out"] = np.asarray(system.keyframes.T_WC)
            path = f"{args.dump_ba}{dump_n[0]:03d}.npz"
            np.savez_compressed(path, **pre)
            print(f"BA DUMP {path} n_kf={n_kf} E={e}", flush=True)
            dump_n[0] += 1

        fg.solve_GN_rays = dumping_solve

    import time as _time

    t_run = _time.time()
    system.run(bench._ArrayDataset(frames, img_size=max(h, w)))
    t_run = _time.time() - t_run

    print(json.dumps({"stats": system.stats,
                      "edges": system.factor_graph.n_edges,
                      "wall_s": round(t_run, 2),
                      "fps_incl_compiles": round(n_frames / t_run, 3)}))
    for r in metrics.rows:
        if r.get("event") == "track":
            flag = " <-- SKIP" if r.get("reloc") else (
                " [kf]" if r.get("new_kf") else "")
            print(f"f{r['frame']:3d} mf={r.get('match_frac', -1):.3f} "
                  f"mfk={r.get('match_frac_k', -1):.3f} "
                  f"uf={r.get('unique_frac', -1):.3f} nkf={r['n_kf']}"
                  f"{flag}")
        else:
            print(r)


if __name__ == "__main__":
    main()
