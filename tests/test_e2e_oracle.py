"""End-to-end SLAM validation with the ground-truth oracle predictor.

The ONLY substitute component is the network (models/oracle.py); everything
else — projective matcher, Sim(3) GN tracker, keyframing, factor graph,
global BA, export, ATE — is the production stack. The recovered trajectory
must match the ground truth after Sim(3) alignment (SURVEY.md §4's
"end-to-end ATE regression with a fake pointmap predictor").
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mast3r_slam_tpu import config as config_mod
from mast3r_slam_tpu.eval import ate
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import oracle
from mast3r_slam_tpu.models.mast3r import MASt3RConfig
from mast3r_slam_tpu.slam.system import SLAMSystem

CFG = MASt3RConfig(img_size=(64, 96), enc_embed_dim=64, desc_dim=8,
                   dtype="float32")


def _gt_trajectory(n):
    """Smooth orbit-ish motion keeping the sphere in view. Steps are large
    relative to the pixel footprint so the inherent half-pixel match
    quantization (same as the reference's integer matching) stays a small
    fraction of the motion at this miniature resolution."""
    Ts = [sim3.identity()]
    for i in range(1, n):
        xi = jnp.array([0.18, 0.04 * np.sin(i / 3), 0.04,
                        0.0, 0.06, 0.008, 0.0])
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


@pytest.fixture(scope="module")
def oracle_run(tmp_path_factory):
    n_frames = 10
    h, w = CFG.img_size
    traj = _gt_trajectory(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    cfg = dict(config_mod.default_config())
    cfg["tracking"] = dict(cfg["tracking"])
    # keyframe often so the factor graph / BA chain is exercised
    cfg["tracking"]["match_frac_thresh"] = 0.95

    system = SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                        edge_capacity=64, model_module=oracle)
    for i in range(n_frames):
        frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
        system.process_frame(frame)
        while system.backend_step():
            pass
    return system, traj


def test_oracle_tracking_recovers_trajectory(oracle_run, tmp_path):
    system, traj = oracle_run
    n = len(system.keyframes)
    assert n >= 4, f"expected several keyframes, got {n}"
    assert system.stats["skipped"] == 0

    ids = np.asarray(system.keyframes.dataset_idx[:n])
    T_est = np.asarray(system.keyframes.T_WC[:n])
    T_gt = np.asarray(traj)[ids]

    # Sim3-aligned ATE over keyframe positions
    s, R, t = ate.umeyama_alignment(T_est[:, :3], T_gt[:, :3])
    aligned = (s * (R @ T_est[:, :3].T)).T + t
    err = np.linalg.norm(aligned - T_gt[:, :3], axis=1)
    rmse = float(np.sqrt((err ** 2).mean()))
    extent = float(np.linalg.norm(T_gt[:, :3].max(0) - T_gt[:, :3].min(0)))
    # floor set by half-pixel match quantization at this tiny resolution
    assert rmse < 0.06 * max(extent, 1e-6), (rmse, extent, ids)


def test_oracle_run_exports_valid_trajectory(oracle_run, tmp_path):
    from mast3r_slam_tpu.io import export

    system, traj = oracle_run
    stamps = [float(i) for i in range(len(traj))]
    f = export.save_traj(tmp_path, "oracle.txt", stamps, system.keyframes)
    # write ground truth and run the full ATE tool on the files
    n_all = len(traj)
    gt = np.asarray(traj)
    with open(tmp_path / "gt.txt", "w") as fh:
        for i in range(n_all):
            x, y, z, qx, qy, qz, qw = gt[i, :7]
            fh.write(f"{i}.0 {x} {y} {z} {qx} {qy} {qz} {qw}\n")
    res = ate.ate_rmse(tmp_path / "gt.txt", f, max_diff=0.5)
    assert res["n_pairs"] == len(system.keyframes)
    assert res["rmse"] < 0.12, res


def test_subpixel_matching_no_regression():
    """Subpixel correspondences (beyond the reference's integer matching)
    must not regress trajectory accuracy; on this fixture the gain is small
    (~6%) because fusion effects, not quantization, dominate the drift."""
    n_frames = 10
    h, w = CFG.img_size
    traj = _gt_trajectory(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    def run(subpixel):
        cfg = dict(config_mod.default_config())
        cfg["tracking"] = dict(cfg["tracking"])
        cfg["tracking"]["match_frac_thresh"] = 0.95
        cfg["matching"] = dict(cfg["matching"])
        cfg["matching"]["subpixel"] = subpixel
        system = SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                            edge_capacity=64, model_module=oracle)
        for i in range(n_frames):
            frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
            system.process_frame(frame)
            while system.backend_step():
                pass
        n = len(system.keyframes)
        ids = np.asarray(system.keyframes.dataset_idx[:n])
        T_est = np.asarray(system.keyframes.T_WC[:n])
        T_gt = np.asarray(traj)[ids]
        s, R, t = ate.umeyama_alignment(T_est[:, :3], T_gt[:, :3])
        aligned = (s * (R @ T_est[:, :3].T)).T + t
        return float(np.sqrt((np.linalg.norm(aligned - T_gt[:, :3], axis=1)
                              ** 2).mean()))

    rmse_int = run(False)
    rmse_sub = run(True)
    assert rmse_sub <= 1.02 * rmse_int, (rmse_int, rmse_sub)


def test_crash_resume_trajectory_equivalence(tmp_path):
    """Kill the run mid-sequence, resume from the checkpoint in a FRESH
    system, and recover the identical trajectory — the crash-recovery
    guarantee behind --save-state-every/--resume (SURVEY.md §5.4; the
    reference loses the whole run on a crash)."""
    from mast3r_slam_tpu.slam import checkpoint

    n_frames = 10
    h, w = CFG.img_size
    traj = _gt_trajectory(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    def mk_cfg():
        cfg = dict(config_mod.default_config())
        cfg["tracking"] = dict(cfg["tracking"])
        cfg["tracking"]["match_frac_thresh"] = 0.95
        return cfg

    def step(system, i):
        frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
        system.process_frame(frame)
        while system.backend_step():
            pass

    # uninterrupted run
    sys_a = SLAMSystem(params, CFG, mk_cfg(), (h, w), keyframe_capacity=16,
                       edge_capacity=64, model_module=oracle)
    for i in range(n_frames):
        step(sys_a, i)

    # interrupted at frame 5 -> checkpoint -> fresh system -> resume
    sys_b = SLAMSystem(params, CFG, mk_cfg(), (h, w), keyframe_capacity=16,
                       edge_capacity=64, model_module=oracle)
    for i in range(5):
        step(sys_b, i)
    ck = checkpoint.save_state(tmp_path / "crash.npz", sys_b)
    del sys_b

    sys_c = SLAMSystem(params, CFG, mk_cfg(), (h, w), keyframe_capacity=16,
                       edge_capacity=64, model_module=oracle)
    checkpoint.load_state(ck, sys_c)
    assert sys_c.resume_frame == 5
    for i in range(sys_c.resume_frame, n_frames):
        step(sys_c, i)

    na, nc = len(sys_a.keyframes), len(sys_c.keyframes)
    assert na == nc
    np.testing.assert_array_equal(
        np.asarray(sys_a.keyframes.dataset_idx[:na]),
        np.asarray(sys_c.keyframes.dataset_idx[:nc]))
    np.testing.assert_allclose(
        np.asarray(sys_a.keyframes.T_WC[:na]),
        np.asarray(sys_c.keyframes.T_WC[:nc]), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sys_a.keyframes.X[:na]),
        np.asarray(sys_c.keyframes.X[:nc]), atol=1e-5)


def test_tpu_fast_matcher_settings_no_major_regression():
    """The tpu_fast preset's matcher shortcuts (pyramidal-only LM
    max_iter=0 + coarse_iter=4, radius 2, dilation 1) must stay within a
    small factor of the reference-parity matcher settings on the oracle
    e2e regression — the automated version of the DEVELOPMENT.md sweep
    (0.0165 vs 0.0162 rel-ATE) that gates the preset."""
    n_frames = 10
    h, w = CFG.img_size
    traj = _gt_trajectory(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    def run(matching_overrides):
        cfg = dict(config_mod.default_config())
        cfg["tracking"] = dict(cfg["tracking"])
        cfg["tracking"]["match_frac_thresh"] = 0.95
        cfg["matching"] = dict(cfg["matching"], **matching_overrides)
        system = SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                            edge_capacity=64, model_module=oracle)
        for i in range(n_frames):
            frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
            system.process_frame(frame)
            while system.backend_step():
                pass
        n = len(system.keyframes)
        ids = np.asarray(system.keyframes.dataset_idx[:n])
        T_est = np.asarray(system.keyframes.T_WC[:n])
        T_gt = np.asarray(traj)[ids]
        s, R, t = ate.umeyama_alignment(T_est[:, :3], T_gt[:, :3])
        aligned = (s * (R @ T_est[:, :3].T)).T + t
        return float(np.sqrt((np.linalg.norm(aligned - T_gt[:, :3], axis=1)
                              ** 2).mean()))

    rmse_ref = run({})   # base.yaml reference-parity settings
    rmse_fast = run({"max_iter": 0, "coarse_iter": 4, "radius": 2,
                     "dilation_max": 1})
    assert rmse_fast <= 1.15 * rmse_ref + 1e-6, (rmse_ref, rmse_fast)


def test_ba_point_stride_no_major_regression():
    """local_opt.point_stride=4 (the tpu_fast BA cost lever: ~1/4 the
    Hessian-accumulation device time) must stay within a small factor of
    the full-integration e2e trajectory on the oracle regression."""
    n_frames = 10
    h, w = CFG.img_size
    traj = _gt_trajectory(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    def run(point_stride):
        cfg = dict(config_mod.default_config())
        cfg["tracking"] = dict(cfg["tracking"])
        cfg["tracking"]["match_frac_thresh"] = 0.95
        cfg["local_opt"] = dict(cfg["local_opt"],
                                point_stride=point_stride)
        system = SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                            edge_capacity=64, model_module=oracle)
        for i in range(n_frames):
            frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
            system.process_frame(frame)
            while system.backend_step():
                pass
        n = len(system.keyframes)
        ids = np.asarray(system.keyframes.dataset_idx[:n])
        T_est = np.asarray(system.keyframes.T_WC[:n])
        T_gt = np.asarray(traj)[ids]
        s, R, t = ate.umeyama_alignment(T_est[:, :3], T_gt[:, :3])
        aligned = (s * (R @ T_est[:, :3].T)).T + t
        return float(np.sqrt((np.linalg.norm(aligned - T_gt[:, :3], axis=1)
                              ** 2).mean()))

    rmse_full = run(1)
    rmse_sub = run(4)
    assert rmse_sub <= 1.15 * rmse_full + 1e-6, (rmse_full, rmse_sub)


def test_reuse_consec_edge_no_major_regression():
    """local_opt.reuse_consec_edge (the tpu_fast backend cost lever: the
    consecutive edge is built from the tracker's existing match instead of
    a fresh symmetric decode + match) must stay within a small factor of
    the decode-every-edge trajectory on the oracle regression, with the
    same keyframes and a healthy edge set."""
    n_frames = 10
    h, w = CFG.img_size
    traj = _gt_trajectory(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    def run(reuse):
        cfg = dict(config_mod.default_config())
        cfg["tracking"] = dict(cfg["tracking"])
        cfg["tracking"]["match_frac_thresh"] = 0.95
        cfg["local_opt"] = dict(cfg["local_opt"],
                                reuse_consec_edge=reuse)
        system = SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                            edge_capacity=64, model_module=oracle)
        for i in range(n_frames):
            frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
            system.process_frame(frame)
            while system.backend_step():
                pass
        n = len(system.keyframes)
        ids = np.asarray(system.keyframes.dataset_idx[:n])
        T_est = np.asarray(system.keyframes.T_WC[:n])
        T_gt = np.asarray(traj)[ids]
        s, R, t = ate.umeyama_alignment(T_est[:, :3], T_gt[:, :3])
        aligned = (s * (R @ T_est[:, :3].T)).T + t
        rmse = float(np.sqrt((np.linalg.norm(aligned - T_gt[:, :3], axis=1)
                              ** 2).mean()))
        return rmse, system

    rmse_dec, sys_dec = run(False)
    rmse_reuse, sys_reuse = run(True)
    assert sys_reuse.stats["skipped"] == 0
    assert len(sys_reuse.keyframes) == len(sys_dec.keyframes)
    # every consecutive pair still produced a two-way edge
    n_kf = len(sys_reuse.keyframes)
    e = sys_reuse.factor_graph.n_edges
    ii = np.asarray(sys_reuse.factor_graph.ii[:e])
    jj = np.asarray(sys_reuse.factor_graph.jj[:e])
    pairs = set(zip(ii.tolist(), jj.tolist()))
    for k in range(1, n_kf):
        assert (k, k - 1) in pairs and (k - 1, k) in pairs, (k, pairs)
    assert rmse_reuse <= 1.2 * rmse_dec + 1e-6, (rmse_dec, rmse_reuse)
