import numpy as np
import pytest

from mast3r_slam_tpu.eval import ate


def _write_tum(path, stamps, t, q=None):
    q = q if q is not None else np.tile([0, 0, 0, 1.0], (len(t), 1))
    with open(path, "w") as f:
        for s, tt, qq in zip(stamps, t, q):
            f.write(f"{s} {tt[0]} {tt[1]} {tt[2]} "
                    f"{qq[0]} {qq[1]} {qq[2]} {qq[3]}\n")


def test_ate_zero_for_similarity_transformed(tmp_path):
    rng = np.random.default_rng(0)
    n = 50
    stamps = np.arange(n) * 0.1
    traj = np.cumsum(rng.standard_normal((n, 3)) * 0.1, axis=0)
    # apply a known similarity: scale 2.3, rotation about z, translation
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    est = (2.3 * (R @ traj.T)).T + np.array([1.0, -2.0, 3.0])
    gt_f = tmp_path / "gt.txt"
    est_f = tmp_path / "est.txt"
    _write_tum(gt_f, stamps, traj)
    _write_tum(est_f, stamps, est)
    res = ate.ate_rmse(gt_f, est_f)
    assert res["rmse"] < 1e-6
    assert abs(res["scale"] - 1 / 2.3) < 1e-6


def test_ate_detects_error(tmp_path):
    rng = np.random.default_rng(1)
    n = 40
    stamps = np.arange(n) * 0.1
    traj = np.cumsum(rng.standard_normal((n, 3)) * 0.1, axis=0)
    est = traj + rng.standard_normal((n, 3)) * 0.05
    gt_f = tmp_path / "gt.txt"
    est_f = tmp_path / "est.txt"
    _write_tum(gt_f, stamps, traj)
    _write_tum(est_f, stamps, est)
    res = ate.ate_rmse(gt_f, est_f)
    assert 0.01 < res["rmse"] < 0.15


def test_associate_offsets():
    a = np.array([0.0, 1.0, 2.0, 3.0])
    b = np.array([0.009, 1.5, 2.005, 2.995])
    ia, ib = ate.associate(a, b, max_diff=0.02)
    assert list(ia) == [0, 2, 3]
    assert list(ib) == [0, 2, 3]


def test_checkpoint_roundtrip(tmp_path):
    import jax

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.models import TINY, init_params
    from mast3r_slam_tpu.slam import checkpoint
    from mast3r_slam_tpu.slam.system import SLAMSystem

    cfg = dict(config_mod.default_config())
    params = init_params(jax.random.PRNGKey(0), TINY)
    h, w = TINY.img_size
    sysA = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=4,
                      edge_capacity=8)
    rng = np.random.default_rng(0)
    img = rng.standard_normal((h, w, 3)).astype(np.float32)
    frame = sysA.make_frame(0, img)
    sysA.process_frame(frame)

    p = checkpoint.save_state(tmp_path / "state.npz", sysA)

    sysB = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=4,
                      edge_capacity=8)
    checkpoint.load_state(p, sysB)
    assert len(sysB.keyframes) == len(sysA.keyframes)
    np.testing.assert_allclose(np.asarray(sysB.keyframes.X),
                               np.asarray(sysA.keyframes.X), atol=1e-6)
    assert sysB.mode == sysA.mode
    assert sysB.backend_queue == sysA.backend_queue
    # resume continues after the last processed frame (main.py --resume)
    assert sysB.resume_frame == 1


def test_viz_smoke(tmp_path):
    import jax

    from mast3r_slam_tpu import viz
    from mast3r_slam_tpu.models import TINY, init_params
    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.slam.system import SLAMSystem

    cfg = dict(config_mod.default_config())
    params = init_params(jax.random.PRNGKey(0), TINY)
    h, w = TINY.img_size
    system = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=4,
                        edge_capacity=8)
    rng = np.random.default_rng(0)
    frame = system.make_frame(0, rng.standard_normal((h, w, 3)).astype(np.float32))
    system.process_frame(frame)

    p1 = viz.plot_trajectory(system.keyframes, tmp_path / "traj.png")
    p2 = viz.render_pointcloud(system.keyframes, tmp_path / "cloud.png",
                               c_conf_threshold=0.0,
                               factor_graph=system.factor_graph)
    p3 = viz.keyframe_mosaic(system.keyframes, tmp_path / "mosaic.png")
    for p in (p1, p2, p3):
        assert p is not None and p.exists() and p.stat().st_size > 1000


def _toy_keyframes(n=3, h=8, w=12):
    import jax.numpy as jnp

    from mast3r_slam_tpu.slam.frame import KeyframeStore

    P = h * w
    kfs = KeyframeStore(4, P, 6, 16, (h, w), donate=False)
    rng = np.random.default_rng(0)
    kfs.n_size = n
    X = rng.standard_normal((n, P, 3)).astype(np.float32) + [0, 0, 3]
    kfs.X = kfs.X.at[:n].set(jnp.asarray(X))
    kfs.C = kfs.C.at[:n].set(5.0)
    kfs.N = kfs.N.at[:n].set(1)
    T = np.tile([0, 0, 0, 0, 0, 0, 1, 1.0], (n, 1)).astype(np.float32)
    T[:, 0] = np.arange(n) * 0.1
    kfs.T_WC = jnp.asarray(np.concatenate(
        [T, np.tile([0, 0, 0, 0, 0, 0, 1, 1.0], (1, 1))], 0
    ).astype(np.float32)) if n == 4 else kfs.T_WC.at[:n].set(jnp.asarray(T))
    kfs.uimg[:n] = rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32)
    return kfs


def test_html_viewer_export(tmp_path):
    """The self-contained WebGL viewer embeds the full reconstruction."""
    import base64

    from mast3r_slam_tpu import viz

    kfs = _toy_keyframes()
    out = viz.export_html_viewer(kfs, tmp_path / "viewer.html",
                                 c_conf_threshold=1.0)
    html = out.read_text()
    assert "<canvas" in html and "webgl" in html
    assert "__PTS__" not in html  # all placeholders substituted
    # decode the embedded point buffer and check the point count line up
    import re as _re

    npts = int(_re.search(r"points: (\d+)", html).group(1))
    assert npts == 3 * 8 * 12
    b64 = _re.search(r'Float32Array\(dec\("([^"]*)"\)', html).group(1)
    pts = np.frombuffer(base64.b64decode(b64), np.float32).reshape(-1, 3)
    assert pts.shape[0] == npts
    assert np.isfinite(pts).all()


def test_realsense_adapter_gated():
    from mast3r_slam_tpu.io.datasets import RealsenseDataset

    with pytest.raises(ImportError, match="pyrealsense2"):
        RealsenseDataset()


def test_rpe_zero_for_rigid_transform_and_detects_drift(tmp_path):
    """RPE is alignment-free: a rigidly transformed copy scores ~0; adding
    per-step noise scores its magnitude; a 10-degree per-step rotation
    offset shows in rot_rmse_deg."""
    rng = np.random.default_rng(1)
    n = 40
    stamps = np.arange(n) * 0.1
    traj = np.cumsum(rng.standard_normal((n, 3)) * 0.1, axis=0)
    th = 0.9
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0],
                  [0, 0, 1.0]])
    est = (R @ traj.T).T + np.array([5.0, 1.0, -2.0])   # rigid, NO scale
    gt_f, est_f = tmp_path / "gt.txt", tmp_path / "est.txt"
    # identity orientations rotated rigidly by R for the estimate
    w = np.cos(th / 2)
    q_est = np.tile([0, 0, np.sin(th / 2), w], (n, 1))
    _write_tum(gt_f, stamps, traj)
    _write_tum(est_f, stamps, est, q_est)
    res = ate.rpe(gt_f, est_f, delta=1)
    assert res["trans_rmse"] < 1e-9 and res["rot_rmse_deg"] < 1e-6

    # translation drift of exactly 0.05 m per step along x
    drift = est + np.outer(np.arange(n), [0.05, 0, 0])
    _write_tum(est_f, stamps, drift, q_est)
    res = ate.rpe(gt_f, est_f, delta=1)
    # per-step relative translation differs by R^T [0.05,0,0]
    assert abs(res["trans_rmse"] - 0.05) < 1e-9
    res4 = ate.rpe(gt_f, est_f, delta=4)
    assert abs(res4["trans_rmse"] - 0.2) < 1e-9
