#!/usr/bin/env python
"""Benchmark: end-to-end SLAM throughput on one chip (headline) plus the
tracking-only hot-path number.

End-to-end mode drives the PRODUCTION ``SLAMSystem.run`` loop — window
frontend (batched encode + dual decode + heads + matcher + Sim(3) GN +
fusion + store writes) PLUS everything the reference's wall-clock FPS print
includes (main.py:310-312): host resize, retrieval query/add per keyframe,
candidate-edge symmetric decode + matching (``add_factors``), and global
bundle adjustment, at a fixed 1-in-``BENCH_KF_EVERY`` keyframe cadence.

The model module is ``models.oracle_timing``: the FULL real network
(ViT-L encoder, dual decoder, DPT/CatMLP heads) executes on every frame and
edge — kept alive through a runtime data dependency so XLA cannot eliminate
it — while the SLAM stack consumes ground-truth oracle geometry. That makes
the run HEALTHY and deterministic (trained-quality keyframe cadence, loop
closures, convergent BA) while the measured wall-clock pays the genuine
model cost; the round-2 bench on raw random weights collapsed into a
relocalization storm and timed a pathology (VERDICT round 2). The bench now
FAILS (non-zero exit, no JSON) if the run is unhealthy instead of printing
a garbage number: see ``_assert_healthy``.

Protocol: one full warm pass compiles every program (window, mono-init,
retrieval prep/quantize, edge-decode buckets 1/2/4, BA buckets), then a
second system instance runs a value-perturbed trajectory + fresh image
content (the relay serves bit-identical inputs from a cache,
DEVELOPMENT.md quirk 4) with identical control flow, timed wall-clock
exactly like the reference's ``FPS = i / (time - t0)``.

``BENCH_E2E_THREADED=1`` switches to the reference-style execution mode:
per-frame stepping with the backend in a concurrent host thread
(main.py:228 process overlap) instead of the windowed single-controller
mode — for the overlap comparison recorded in DEVELOPMENT.md.

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
# end-to-end: SLAMSystem.run with the timing-faithful oracle
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


def _make_traj(n_frames, phase, step_scale=1.0):
    """Smooth orbit keeping the oracle scene in view (~8 px/frame apparent
    motion at 512x384 at step_scale 1). ``phase`` != 0 perturbs the start
    pose and the lateral sweep so every array VALUE differs between the
    warm and timed passes (relay value-cache, quirk 4) with identical
    control flow. Natural-cadence runs (BENCH_KF_EVERY=0) use a larger
    step so the keyframe statistic crosses its threshold every ~6-9
    frames (scripts/probe_unique_frac.py)."""
    import numpy as np
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3

    start = sim3.exp(jnp.asarray(
        [0.011, -0.007, 0.004, 0.0, 0.002, 0.001, 0.0]) * phase)
    Ts = [start]
    for i in range(1, n_frames):
        xi = jnp.asarray([0.03, 0.01 * np.sin((i + 3.0 * phase) / 5.0),
                          0.008, 0.0, 0.012, 0.002, 0.0]) * step_scale
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


def _assert_healthy(system, n_frames, kf_every):
    """A benchmark of a degenerate run is worse than no benchmark: require
    the keyframe cadence, a live factor graph, zero skips/reloc attempts
    and a TRACKING end state, else fail loudly (VERDICT r2 item 1b)."""
    from mast3r_slam_tpu.slam.frame import Mode

    st = dict(system.stats)
    problems = []
    if kf_every:
        expect_kf = len(range(0, n_frames, kf_every))
        if abs(st["keyframes"] - expect_kf) > 2:
            problems.append(f"keyframes {st['keyframes']} != ~{expect_kf}")
    else:
        # kf_every == 0: natural match-fraction keyframing (reference
        # semantics) — the cadence is the algorithm's own choice, but a
        # LIVE one: at least a couple of keyframes and not one per frame
        # (the degenerate regime DEVELOPMENT.md documents for this
        # fixture must be refused, not reported)
        if not (2 <= st["keyframes"] <= max(n_frames // 2, 2)):
            problems.append(
                f"degenerate natural cadence: {st['keyframes']} keyframes "
                f"over {n_frames} frames")
    if st["skipped"] != 0:
        problems.append(f"skipped={st['skipped']}")
    if st["reloc_failed"] != 0 or st["frames_reloc"] != 0:
        problems.append(f"reloc storm: {st}")
    # run() always ends TERMINATED; a run stuck in RELOC shows up as
    # frames_reloc > 0 above. Anything else means run() aborted early.
    if system.mode not in (Mode.TERMINATED, Mode.TRACKING):
        problems.append(f"end mode {system.mode}")
    if system.factor_graph.n_edges <= 0:
        problems.append("empty factor graph")
    if problems:
        raise RuntimeError(
            "UNHEALTHY e2e bench run — refusing to report a number: "
            + "; ".join(problems))


def bench_e2e(net_params, rparams, model_cfg, h, w, W, kf_every, n_frames,
              threaded=False, repeats=1, desc_freq=2.0, step_scale=1.0):
    import numpy as np

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.models import oracle, oracle_timing
    from mast3r_slam_tpu.slam.system import SLAMSystem
    from mast3r_slam_tpu.utils.timing import device_sync

    repo = pathlib.Path(__file__).resolve().parent
    cfg = config_mod.load_config(repo / "configs" / "tpu_fast.yaml")
    cfg["single_thread"] = not threaded
    cfg["tracking"] = dict(cfg["tracking"], kf_every=kf_every)
    cfg["runtime"] = dict(cfg.get("runtime", {}),
                          tracking_window=W,
                          # bound the compiled BA shapes: the warm pass
                          # exercises each bucket the edge count reaches;
                          # the hard cap keeps a retrieval fluctuation in
                          # the timed pass from growing a FRESH bigger
                          # program mid-measurement (drops would be
                          # visible in edges_dropped)
                          edge_bucket_floor=64, kf_bucket_floor=8,
                          max_edge_capacity=256)

    def run_pass(phase, seed, nf=None):
        nf = n_frames if nf is None else nf
        traj = _make_traj(nf, phase, step_scale)
        oparams = oracle.make_params(traj, desc_dim=model_cfg.desc_dim,
                                     desc_freq=desc_freq)
        params = oracle_timing.make_params(net_params, oparams)
        kf_cap = max(32, (nf // max(kf_every, 1)) + 8 if kf_every
                     else nf + 8)
        system = SLAMSystem(params, model_cfg, cfg, (h, w),
                            retrieval_params=rparams,
                            keyframe_capacity=kf_cap, edge_capacity=256,
                            model_module=oracle_timing)
        rng = np.random.default_rng(seed)
        frames = [oracle_timing.make_frame_image(i, h, w, rng)
                  for i in range(nf)]
        t0 = time.time()
        system.run(_ArrayDataset(frames, img_size=max(h, w)))
        device_sync(system.keyframes.T_WC)  # flush any async backend work
        dt = time.time() - t0
        return system, dt

    _log("e2e warm pass (compiles; expect several minutes of remote "
         "compilation on a fresh process)...")
    sys_w, dt_w = run_pass(0.0, 1234)
    _log(f"warm pass: {n_frames} frames in {dt_w:.1f}s, "
         f"stats={sys_w.stats}, edges={sys_w.factor_graph.n_edges}")
    _assert_healthy(sys_w, n_frames, kf_every)
    # force-warm every candidate-batch decode bucket (1, 2, 4) retrieval
    # can hit: min_match_frac > 1 compiles decode+match but adds no edge
    if len(sys_w.keyframes) >= 8:
        sys_w.factor_graph.add_factors([0], [5], 1.1)
        sys_w.factor_graph.add_factors([0, 1], [5, 6], 1.1)
        sys_w.factor_graph.add_factors([0, 1, 2], [5, 6, 7], 1.1)

    # locality-restore pass (short, unmeasured): the first dispatches
    # after a compile-heavy warm pass measure the relay re-staging its
    # executables, not SLAM — the round-4 repeats run trended 1.99 ->
    # 3.58 -> 4.33 FPS across otherwise-identical passes. One short run
    # absorbs that.
    run_pass(0.7, 4321, nf=2 * W + 1)

    # median-of-N timed passes (relay load varies ~2x day to day,
    # DEVELOPMENT.md quirk 5; each pass gets a fresh value-perturbed
    # trajectory so the relay's value cache cannot serve repeats)
    all_fps = []
    sys_t = None
    for r in range(max(int(repeats), 1)):
        sys_t, dt = run_pass(1.0 + 0.1 * r, 5678 + r)
        _assert_healthy(sys_t, n_frames, kf_every)
        fps_r = n_frames / dt
        all_fps.append(fps_r)
        _log(f"timed pass {r + 1}/{repeats}: {n_frames} frames in "
             f"{dt:.2f}s = {fps_r:.2f} FPS, stats={sys_t.stats}, "
             f"edges={sys_t.factor_graph.n_edges}, "
             f"dropped={sys_t.factor_graph.edges_dropped}")
    all_fps.sort()
    n = len(all_fps)
    fps = (all_fps[n // 2] if n % 2
           else 0.5 * (all_fps[n // 2 - 1] + all_fps[n // 2]))
    if len(all_fps) > 1:
        _log(f"median {fps:.2f} FPS over {len(all_fps)} passes "
             f"(min {all_fps[0]:.2f}, max {all_fps[-1]:.2f})")
    return fps, sys_t, all_fps


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
    mcfg = MatchingConfig(dilation_max=1, max_iter=0, radius=1,
                          coarse_iter=3)   # = tpu_fast matcher settings
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
    # 65 frames = 8 full W=8 windows + init (raised from 33 in round 4
    # after the 'frame-34 corruption' was root-caused to quaternion
    # denormalization in sim3.mul and fixed — 120-frame W=8 runs are
    # healthy; see DEVELOPMENT.md). More frames = more steady-state
    # fraction in the measured wall clock.
    n_frames = int(os.environ.get("BENCH_E2E_FRAMES", "65"))
    threaded = os.environ.get("BENCH_E2E_THREADED", "0") == "1"
    skip_tracking = os.environ.get("BENCH_SKIP_TRACKING", "0") == "1"
    skip_e2e = os.environ.get("BENCH_SKIP_E2E", "0") == "1"
    if skip_tracking and skip_e2e:
        raise SystemExit("BENCH_SKIP_TRACKING and BENCH_SKIP_E2E are both "
                         "set; nothing to measure")

    model_cfg = MASt3RConfig(img_size=(h, w), dtype="bfloat16",
                             head_dtype="bfloat16")
    params = init_params(jax.random.PRNGKey(0), model_cfg)

    result = {"metric": "end_to_end_fps_per_chip", "unit": "frames/s",
              "window": W, "kf_every": kf_every}

    if not skip_tracking:
        fps_tracking = bench_tracking(params, model_cfg, h, w, W)
        _log(f"tracking-only: {fps_tracking:.2f} FPS/chip")
        result["tracking_fps_per_chip"] = round(fps_tracking, 3)

    if not skip_e2e:
        rparams = retrieval_mod.init_retrieval_params(
            jax.random.PRNGKey(1), backbone_dim=model_cfg.enc_embed_dim,
            codebook_size=int(os.environ.get("BENCH_CODEBOOK", "65536")))
        repeats = int(os.environ.get("BENCH_E2E_REPEATS", "3"))
        # natural cadence (BENCH_KF_EVERY=0): the default fixture's smooth
        # descriptor field pins unique_frac at the keyframe threshold
        # (degenerate; DEVELOPMENT.md round-4 note) — use the sharp-
        # descriptor fixture + a larger step so keyframing is the
        # algorithm's own meaningful choice (~every 6-9 frames;
        # scripts/probe_unique_frac.py sweep)
        natural = kf_every == 0
        desc_freq = float(os.environ.get("BENCH_DESC_FREQ",
                                         "20.0" if natural else "2.0"))
        step_scale = float(os.environ.get("BENCH_STEP_SCALE",
                                          "3.0" if natural else "1.0"))
        fps_e2e, sys_t, all_fps = bench_e2e(params, rparams, model_cfg, h,
                                            w, W, kf_every, n_frames,
                                            threaded=threaded,
                                            repeats=repeats,
                                            desc_freq=desc_freq,
                                            step_scale=step_scale)
        if natural:
            result["desc_freq"] = desc_freq
            result["step_scale"] = step_scale
        if threaded:
            result["metric"] = "end_to_end_fps_per_chip_threaded"
        if len(all_fps) > 1:
            result["fps_passes"] = [round(f, 3) for f in all_fps]
        result["value"] = round(fps_e2e, 3)
        result["vs_baseline"] = round(fps_e2e / 15.0, 3)
        result["keyframes"] = sys_t.stats["keyframes"]
        result["loop_closures"] = sys_t.stats["loop_closures"]
        result["edges"] = sys_t.factor_graph.n_edges
        result["skipped"] = sys_t.stats["skipped"]
        result["reloc_failed"] = sys_t.stats["reloc_failed"]
    else:
        result["metric"] = "tracking_fps_per_chip"
        result["value"] = result.pop("tracking_fps_per_chip")
        result["vs_baseline"] = round(result["value"] / 15.0, 3)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
