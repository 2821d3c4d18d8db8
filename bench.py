#!/usr/bin/env python
"""Benchmark: end-to-end per-frame tracking throughput on one chip.

Measures the SLAM hot path (SURVEY.md §3.1) at the reference resolution
512x384 with the full ViT-L model through the PRODUCTION frontend program
(`slam.system._track_window_fused`): batched encode over the tracking
window + dual decoder + heads + projective matcher + Sim(3) GN + pointmap
fusion + on-device keyframe-store writes, with the match-index warm start
chained window-to-window (the frontend's steady state; equivalence-tested
against per-frame stepping in tests/test_window.py). Baseline target:
15 FPS/chip (BASELINE.md).

Prints exactly one JSON line:
  {"metric": "tracking_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/15}
"""

from __future__ import annotations

import json
import os
import time


def main():
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.utils.timing import device_sync
    from mast3r_slam_tpu.models import MASt3RConfig, init_params, mast3r
    from mast3r_slam_tpu.slam import tracker as tracker_mod
    from mast3r_slam_tpu.slam.factor_graph import MatchingConfig
    from mast3r_slam_tpu.slam.frame import KeyframeStore
    from mast3r_slam_tpu.slam.system import _track_window_fused

    h, w = 384, 512
    n = h * w
    # configs/tpu_fast.yaml serving settings (see DEVELOPMENT.md for the
    # accuracy tradeoffs; reference-parity settings run ~40% slower)
    cfg = MASt3RConfig(img_size=(h, w), dtype="bfloat16",
                       head_dtype="bfloat16")
    mcfg = MatchingConfig(dilation_max=1, max_iter=0, radius=2,
                          coarse_iter=4)
    tcfg = tracker_mod.TrackerConfig()
    W = int(os.environ.get("BENCH_WINDOW", "8"))

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)

    # keyframe store seeded with an encoded keyframe + plausible geometry
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
    # pre-build per-window image batches (distinct values: the relay serves
    # bit-identical inputs from a cache, DEVELOPMENT.md quirk 4)
    img_sets = [jax.random.normal(jax.random.fold_in(key, 10 + i),
                                  (W, h, w, 3)) for i in range(n_windows)]

    bufs = bufs_of(kfs)
    warm0 = jax.random.normal(jax.random.fold_in(key, 100), (W, h, w, 3))
    warm1 = jax.random.normal(jax.random.fold_in(key, 101), (W, h, w, 3))
    out = window_step(warm0, ids, idx0, ident, bufs)
    device_sync(out.prev_T_WC)
    out = window_step(warm1, ids, out.idx_last, out.prev_T_WC, adopt(out))
    device_sync(out.prev_T_WC)

    # steady state: distinct frames, warm-start chained like the frontend
    t0 = time.time()
    idx_cur, prev_T, bufs = out.idx_last, out.prev_T_WC, adopt(out)
    for i in range(n_windows):
        out = window_step(img_sets[i], ids, idx_cur, prev_T, bufs)
        idx_cur, prev_T, bufs = out.idx_last, out.prev_T_WC, adopt(out)
    device_sync(out.prev_T_WC)   # block_until_ready is unreliable here
    elapsed = time.time() - t0
    fps = n_windows * W / elapsed

    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 15.0, 3),
    }))


if __name__ == "__main__":
    main()
