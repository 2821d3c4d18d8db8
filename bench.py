#!/usr/bin/env python
"""Benchmark: end-to-end per-frame tracking throughput on one chip.

Measures the SLAM hot path (SURVEY.md §3.1) at the reference resolution
512x384 with the full ViT-L model: encoder (new frame) + dual decoder +
heads + projective matcher + Sim(3) GN, on a stream of distinct frames with
the match-index warm start chained frame-to-frame (exactly the frontend's
steady state). Baseline target: 15 FPS/chip (BASELINE.md).

Prints exactly one JSON line:
  {"metric": "tracking_fps_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": N/15}
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.utils.timing import device_sync
    from mast3r_slam_tpu.models import MASt3RConfig, init_params, mast3r
    from mast3r_slam_tpu.ops import matching
    from mast3r_slam_tpu.slam import tracker as tracker_mod
    from mast3r_slam_tpu.slam.factor_graph import MatchingConfig

    h, w = 384, 512
    # configs/tpu_fast.yaml serving settings (see DEVELOPMENT.md for the
    # accuracy tradeoffs; reference-parity settings run ~40% slower)
    cfg = MASt3RConfig(img_size=(h, w), dtype="bfloat16",
                       head_dtype="bfloat16")
    mcfg = MatchingConfig(dilation_max=1, max_iter=5, radius=2)
    tcfg = tracker_mod.TrackerConfig()

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)

    kf_img = jax.random.normal(jax.random.fold_in(key, 1), (1, h, w, 3))
    feat_k, pos_k = mast3r.encode(params, kf_img, cfg)
    jax.block_until_ready(feat_k)

    @jax.jit
    def frame_step(params, img, feat_k, pos_k, idx_init, acc):
        feat_f, pos_f = mast3r.encode(params, img, cfg)
        X, C, D, Q = mast3r.inference_asymmetric(
            params, feat_f, pos_f, feat_k, pos_k, cfg)
        out = matching.match(X[0:1], X[1:2], D[0:1], D[1:2],
                             idx_1_to_2_init=idx_init, **mcfg._asdict())
        if mcfg.subpixel:
            idx, valid, p_sub = out
        else:
            idx, valid = out
            p_sub = None
        hw = h * w
        Xff = X[0:1].reshape(hw, 3)
        Xkf = X[1:2].reshape(hw, 3)
        Qff = Q[0:1].reshape(hw)
        Qkf = Q[1:2].reshape(hw)
        if p_sub is not None:
            # subpixel correspondence interpolation (fused system path)
            unf = matching._unfold_pairs(X[0:1])
            u = jnp.clip(p_sub[:, :, 0], 0.0, w - 1.001)
            v = jnp.clip(p_sub[:, :, 1], 0.0, h - 1.001)
            Xf = matching._bilinear_gather(unf, u, v, w, h, 3)[0]
            Qk = jnp.sqrt(jnp.take(Qff, idx[0], axis=0) * Qkf)[:, None]
        else:
            # one fused 4-wide gather: frame points + desc-conf
            g = jnp.take(jnp.concatenate([Xff, Qff[:, None]], -1),
                         idx[0], axis=0)
            Xf = g[:, 0:3]
            Qk = jnp.sqrt(g[:, 3] * Qkf)[:, None]
        res = tracker_mod.opt_pose_ray_dist_sim3(
            Xf, Xkf, sim3.identity(), Qk, valid[0], tcfg)
        return idx, acc + res.T_CkCf

    n_frames = 10
    # pre-extract per-frame arrays so no eager slice ops (each a fresh
    # compile through a remote-compile backend) land in the timed loop
    imgs = [jax.random.normal(jax.random.fold_in(key, 10 + i), (1, h, w, 3))
            for i in range(n_frames)]

    # warm up BOTH compile variants on images DISJOINT from the timed set
    # (the relay backend serves bit-identical inputs from a cache,
    # DEVELOPMENT.md quirk 4). The pose accumulator is folded INTO the
    # frame step: exactly ONE dispatch per frame (each dispatch costs
    # ~30 ms through the tunnel, DEVELOPMENT.md quirk 5).
    warm0 = jax.random.normal(jax.random.fold_in(key, 100), (1, h, w, 3))
    warm1 = jax.random.normal(jax.random.fold_in(key, 101), (1, h, w, 3))
    acc = jnp.zeros((8,))
    idx0, acc0 = frame_step(params, warm0, feat_k, pos_k, None, acc)
    device_sync(acc0)
    idx1, acc1 = frame_step(params, warm1, feat_k, pos_k, idx0, acc)
    device_sync(acc1)

    # steady state: distinct frames, warm-start chained like the frontend
    t0 = time.time()
    idx_cur = idx1
    acc = jnp.zeros((8,))
    for i in range(n_frames):
        idx_cur, acc = frame_step(params, imgs[i], feat_k, pos_k, idx_cur,
                                  acc)
    device_sync(acc)   # real sync; block_until_ready is unreliable here
    elapsed = time.time() - t0
    fps = n_frames / elapsed

    print(json.dumps({
        "metric": "tracking_fps_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 15.0, 3),
    }))


if __name__ == "__main__":
    main()
