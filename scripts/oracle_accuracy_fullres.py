#!/usr/bin/env python
"""Full-resolution oracle end-to-end accuracy gate on the REAL device path
(VERDICT round-2 directive #6).

The CPU suite regression (tests/test_e2e_oracle.py) runs the oracle SLAM
stack only at 64x96; this script runs the SAME stack at the production
512x384 resolution on the default JAX platform (the tunneled TPU when
available), once per preset:

  * configs/base.yaml      — reference-parity matcher/BA settings
  * configs/tpu_fast.yaml  — the throughput preset (pyramidal-only matcher,
                             point_stride=4 BA, bf16 runtime dtypes)

and reports rel-ATE (Sim3-aligned RMSE / trajectory extent) for each.
This is the strongest available proxy for the real-data accuracy gap while
egress is zero (eval protocol: /root/reference/scripts/eval_tum.sh:35-50).
Numbers are pinned in DEVELOPMENT.md ("Full-res oracle accuracy").

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/oracle_accuracy_fullres.py
  [--frames N] [--cpu] [--presets base tpu_fast]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def make_traj(n_frames, step_scale=1.0):
    """Smooth orbit keeping the oracle scene in view (~8 px/frame apparent
    motion at 512x384 at step_scale 1 — same regime as bench.py's e2e
    trajectory; natural-cadence runs use a larger step so the keyframe
    statistic crosses the threshold every ~6-9 frames, scripts/
    probe_unique_frac.py)."""
    import numpy as np
    import jax.numpy as jnp

    from mast3r_slam_tpu.lie import sim3

    Ts = [sim3.identity()]
    for i in range(1, n_frames):
        xi = jnp.asarray([0.03, 0.01 * np.sin(i / 5.0), 0.008,
                          0.0, 0.012, 0.002, 0.0]) * step_scale
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


def rel_ate(system, traj):
    import numpy as np

    from mast3r_slam_tpu.eval import ate

    n = len(system.keyframes)
    ids = np.asarray(system.keyframes.dataset_idx[:n])
    T_est = np.asarray(system.keyframes.T_WC[:n])
    T_gt = np.asarray(traj)[ids]
    s, R, t = ate.umeyama_alignment(T_est[:, :3], T_gt[:, :3])
    aligned = (s * (R @ T_est[:, :3].T)).T + t
    rmse = float(np.sqrt((np.linalg.norm(aligned - T_gt[:, :3], axis=1)
                          ** 2).mean()))
    extent = float(np.linalg.norm(T_gt[:, :3].max(0) - T_gt[:, :3].min(0)))
    return rmse / max(extent, 1e-9), n


def run_preset(preset, n_frames, h, w, kf_every=0,
               desc_freq=2.0, step_scale=1.0):
    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.models import oracle
    from mast3r_slam_tpu.models.mast3r import MASt3RConfig
    from mast3r_slam_tpu.slam.system import SLAMSystem

    cfg = config_mod.load_config(REPO / "configs" / f"{preset}.yaml")
    cfg["single_thread"] = True
    if kf_every:
        # the synthetic oracle scene sits AT the natural unique_frac
        # keyframe boundary at 512x384 (DEVELOPMENT.md round-4 note), so
        # natural cadence degenerates to a keyframe nearly every frame;
        # a fixed cadence isolates preset accuracy from that fixture quirk
        cfg["tracking"] = dict(cfg["tracking"], kf_every=kf_every)
    model_cfg = MASt3RConfig(img_size=(h, w), desc_dim=24)

    traj = make_traj(n_frames, step_scale)
    params = oracle.make_params(traj, desc_dim=model_cfg.desc_dim,
                                desc_freq=desc_freq)
    system = SLAMSystem(params, model_cfg, cfg, (h, w),
                        keyframe_capacity=32, edge_capacity=64,
                        model_module=oracle)
    t0 = time.time()
    for i in range(n_frames):
        frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
        system.process_frame(frame)
        while system.backend_step():
            pass
    dt = time.time() - t0
    rel, n_kf = rel_ate(system, traj)
    return {"preset": preset, "rel_ate": round(rel, 5), "keyframes": n_kf,
            "edges": system.factor_graph.n_edges,
            "skipped": system.stats["skipped"],
            "loop_closures": system.stats["loop_closures"],
            "wall_s": round(dt, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=25)
    ap.add_argument("--presets", nargs="*", default=["base", "tpu_fast"])
    ap.add_argument("--kf-every", type=int, default=0,
                    help="0 = natural cadence (degenerate on this fixture "
                         "at 512x384; see DEVELOPMENT.md)")
    ap.add_argument("--desc-freq", type=float, default=2.0,
                    help="descriptor field frequency; ~20 de-degenerates "
                         "natural-cadence keyframing (probe_unique_frac)")
    ap.add_argument("--step-scale", type=float, default=1.0,
                    help="trajectory step multiplier (natural-cadence runs "
                         "use 3-4 for a ~6-9 frame keyframe interval)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        try:
            jax.extend.backend.clear_backends()
        except Exception:
            pass

    import jax

    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)
    results = []
    for preset in args.presets:
        print(f"running preset {preset} ({args.frames} frames at 512x384; "
              "expect minutes of remote compiles on a fresh process)...",
              file=sys.stderr, flush=True)
        r = run_preset(preset, args.frames, 384, 512, args.kf_every,
                       args.desc_freq, args.step_scale)
        print(json.dumps(r), flush=True)
        results.append(r)
    return results


if __name__ == "__main__":
    main()
