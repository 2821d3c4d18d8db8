#!/usr/bin/env python
"""Benchmark: end-to-end SLAM throughput on one chip (headline) plus the
tracking-only hot-path number.

End-to-end mode drives the PRODUCTION ``SLAMSystem.run`` loop — window
frontend (batched encode + dual decode + heads + matcher + Sim(3) GN +
fusion + store writes) PLUS everything the reference's wall-clock FPS print
includes (main.py:310-312): host resize, retrieval query/add per keyframe,
candidate-edge symmetric decode + matching (``add_factors``), and global
bundle adjustment, at a fixed 1-in-``BENCH_KF_EVERY`` keyframe cadence
(``TrackerConfig.kf_every``). Protocol: one full warm pass compiles every
program (window, mono-init, retrieval prep/quantize, edge-decode buckets
1/2/4, BA at the pinned (E=64, K=32) bucket), then a second system instance
runs the same-shape sequence on DIFFERENT frame values (the relay serves
bit-identical inputs from a cache, DEVELOPMENT.md quirk 4) and is timed
wall-clock, exactly like the reference's ``FPS = i / (time - t0)``.

Tracking-only mode measures the fused window program alone in steady state
(the round-1 headline; kept for comparability).

Prints exactly one JSON line:
  {"metric": "end_to_end_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/15, "tracking_fps_per_chip": M, ...}

Baseline target: 15 FPS/chip end-to-end (BASELINE.md).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# end-to-end: SLAMSystem.run on an in-memory synthetic sequence
# ---------------------------------------------------------------------------


class _ArrayDataset:
    """Minimal in-memory dataset (the run loop needs img_size/len/getitem)."""

    def __init__(self, frames, img_size=512):
        self.frames = frames
        self.img_size = img_size

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i):
        return float(i), self.frames[i]


def _make_frames(seed, n, h, w):
    import numpy as np

    rng = np.random.default_rng(seed)
    base = rng.integers(0, 255, (h, w, 3), np.uint8).astype(np.float32)
    out = []
    for i in range(n):
        # smoothly drifting content: every frame distinct (quirk 4) but
        # consecutive frames correlated like video
        noise = rng.integers(0, 255, (h, w, 3), np.uint8).astype(np.float32)
        base = 0.9 * base + 0.1 * noise
        out.append(base.astype(np.uint8))
    return out


def bench_e2e(params, rparams, model_cfg, h, w, W, kf_every, n_frames):
    import jax.numpy as jnp

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.slam.system import SLAMSystem
    from mast3r_slam_tpu.utils.timing import device_sync

    repo = pathlib.Path(__file__).resolve().parent
    cfg = config_mod.load_config(repo / "configs" / "tpu_fast.yaml")
    cfg["single_thread"] = True
    cfg["tracking"] = dict(cfg["tracking"],
                           kf_every=kf_every,
                           # random weights: never skip, and keep the
                           # match-confidence gate open so the GN normal
                           # equations stay full-rank (same compute as a
                           # confident real-weights run; a closed gate
                           # zeroes H -> Cholesky failure -> RELOC)
                           min_match_frac=0.0,
                           Q_conf=-1.0, C_conf=-1.0)
    cfg["runtime"] = dict(cfg.get("runtime", {}),
                          tracking_window=W,
                          # pin the BA bucket so the timed pass never
                          # triggers a fresh remote compile mid-measurement
                          edge_bucket_floor=64, kf_bucket_floor=32)

    def make_system():
        return SLAMSystem(params, model_cfg, cfg, (h, w),
                          retrieval_params=rparams,
                          keyframe_capacity=32, edge_capacity=64)

    def run_pass(seed, timed):
        frames = _make_frames(seed, n_frames, h, w)
        system = make_system()
        t0 = time.time()
        system.run(_ArrayDataset(frames, img_size=max(h, w)))
        device_sync(system.keyframes.T_WC)  # flush any async backend work
        dt = time.time() - t0
        return system, dt

    _log("e2e warm pass (compiles; expect several minutes of remote "
         "compilation on a fresh process)...")
    sys_w, dt_w = run_pass(1234, timed=False)
    _log(f"warm pass: {n_frames} frames in {dt_w:.1f}s, "
         f"stats={sys_w.stats}, edges={sys_w.factor_graph.n_edges}")
    # warm the candidate-batch decode buckets (2, 4) the random retriever
    # may hit in the timed pass: non-consecutive pairs + min_match_frac > 1
    # compile the decode+match program but can never add an edge
    if len(sys_w.keyframes) >= 8:
        sys_w.factor_graph.add_factors([0, 1], [5, 6], 1.1)
        sys_w.factor_graph.add_factors([0, 1, 2], [5, 6, 7], 1.1)

    sys_t, dt = run_pass(5678, timed=True)
    fps = n_frames / dt
    _log(f"timed pass: {n_frames} frames in {dt:.2f}s = {fps:.2f} FPS, "
         f"stats={sys_t.stats}, edges={sys_t.factor_graph.n_edges}")
    return fps, sys_t.stats


# ---------------------------------------------------------------------------
# tracking-only: the fused window program in steady state (round-1 metric)
# ---------------------------------------------------------------------------


def bench_tracking(params, model_cfg, h, w, W):
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.utils.timing import device_sync
    from mast3r_slam_tpu.models import mast3r
    from mast3r_slam_tpu.slam import tracker as tracker_mod
    from mast3r_slam_tpu.slam.factor_graph import MatchingConfig
    from mast3r_slam_tpu.slam.frame import KeyframeStore
    from mast3r_slam_tpu.slam.system import _track_window_fused

    n = h * w
    cfg = model_cfg
    mcfg = MatchingConfig(dilation_max=1, max_iter=0, radius=2,
                          coarse_iter=4)
    tcfg = tracker_mod.TrackerConfig()

    key = jax.random.PRNGKey(0)
    kfs = KeyframeStore(16, n, cfg.num_patches, cfg.enc_embed_dim, (h, w))
    kf_img = jax.random.normal(jax.random.fold_in(key, 1), (1, h, w, 3))
    feat_k, pos_k = mast3r.encode(params, kf_img, cfg)
    kfs.feat = kfs.feat.at[0].set(feat_k[0].astype(kfs.feat.dtype))
    kfs.pos = kfs.pos.at[0].set(pos_k[0])
    X0 = jax.random.normal(jax.random.fold_in(key, 2), (n, 3)) \
        + jnp.asarray([0.0, 0.0, 3.0])
    kfs.X = kfs.X.at[0].set(X0)
    kfs.C = kfs.C.at[0].set(jnp.full((n,), 2.0))
    kfs.N = kfs.N.at[0].set(1)
    kfs.N_updates = kfs.N_updates.at[0].set(1)
    jax.block_until_ready(kfs.X)

    K_eye = jnp.eye(3)
    row0 = jnp.asarray(0, jnp.int32)

    def window_step(imgs, ids, idx, prev_T, bufs):
        return _track_window_fused(
            params, cfg, mcfg, tcfg, imgs, ids, idx, prev_T, K_eye,
            row0, *bufs, 1, "weighted_pointmap",
            "median", False, (h, w), W, mast3r)

    def bufs_of(kfs):
        return (kfs.X, kfs.C, kfs.N, kfs.N_updates, kfs.score, kfs.T_WC,
                kfs.feat, kfs.pos, kfs.dataset_idx)

    def adopt(out):
        return (out.kX, out.kC, out.kN, out.kNU, out.kscore, out.kT,
                out.kfeat, out.kpos, out.kdix)

    idx0 = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (n,))
    ident = sim3.identity()
    ids = jnp.arange(W, dtype=jnp.int32)

    n_windows = 4
    img_sets = [jax.random.normal(jax.random.fold_in(key, 10 + i),
                                  (W, h, w, 3)) for i in range(n_windows)]

    bufs = bufs_of(kfs)
    warm0 = jax.random.normal(jax.random.fold_in(key, 100), (W, h, w, 3))
    warm1 = jax.random.normal(jax.random.fold_in(key, 101), (W, h, w, 3))
    out = window_step(warm0, ids, idx0, ident, bufs)
    device_sync(out.prev_T_WC)
    out = window_step(warm1, ids, out.idx_last, out.prev_T_WC, adopt(out))
    device_sync(out.prev_T_WC)

    t0 = time.time()
    idx_cur, prev_T, bufs = out.idx_last, out.prev_T_WC, adopt(out)
    for i in range(n_windows):
        out = window_step(img_sets[i], ids, idx_cur, prev_T, bufs)
        idx_cur, prev_T, bufs = out.idx_last, out.prev_T_WC, adopt(out)
    device_sync(out.prev_T_WC)   # block_until_ready is unreliable here
    return n_windows * W / (time.time() - t0)


def main():
    import jax

    from mast3r_slam_tpu.models import MASt3RConfig, init_params
    from mast3r_slam_tpu.slam import retrieval as retrieval_mod

    h, w = 384, 512
    W = int(os.environ.get("BENCH_WINDOW", "8"))
    kf_every = int(os.environ.get("BENCH_KF_EVERY", "4"))
    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", str(1 + 6 * W)))

    model_cfg = MASt3RConfig(img_size=(h, w), dtype="bfloat16",
                             head_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), model_cfg)

    result = {"metric": "end_to_end_fps_per_chip", "unit": "frames/s",
              "window": W, "kf_every": kf_every}

    if os.environ.get("BENCH_SKIP_TRACKING", "0") != "1":
        fps_tracking = bench_tracking(params, model_cfg, h, w, W)
        _log(f"tracking-only: {fps_tracking:.2f} FPS/chip")
        result["tracking_fps_per_chip"] = round(fps_tracking, 3)

    if os.environ.get("BENCH_SKIP_E2E", "0") != "1":
        rparams = retrieval_mod.init_retrieval_params(
            jax.random.PRNGKey(1), backbone_dim=model_cfg.enc_embed_dim,
            codebook_size=int(os.environ.get("BENCH_CODEBOOK", "65536")))
        fps_e2e, stats = bench_e2e(params, rparams, model_cfg, h, w, W,
                                   kf_every, n_frames)
        result["value"] = round(fps_e2e, 3)
        result["vs_baseline"] = round(fps_e2e / 15.0, 3)
        result["keyframes"] = stats["keyframes"]
    else:
        result["metric"] = "tracking_fps_per_chip"
        result["value"] = result.pop("tracking_fps_per_chip")
        result["vs_baseline"] = round(result["value"] / 15.0, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
