"""Windowed (micro-batched) frontend vs per-frame stepping equivalence.

``_track_window_fused`` runs W frames in one compiled program with the
keyframe carried on device (batched encode, on-device keyframe switching and
store-row writes). These tests check it against the reference-shaped
per-frame path on the oracle predictor: identical keyframe decisions,
store contents, and trajectories; and the halt-at-skip fallback semantics.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mast3r_slam_tpu import config as config_mod
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import oracle
from mast3r_slam_tpu.models.mast3r import MASt3RConfig
from mast3r_slam_tpu.slam.frame import Mode
from mast3r_slam_tpu.slam.system import SLAMSystem

CFG = MASt3RConfig(img_size=(64, 96), enc_embed_dim=64, desc_dim=8,
                   dtype="float32")


def _traj(n, jump_at=None):
    Ts = [sim3.identity()]
    for i in range(1, n):
        xi = jnp.array([0.18, 0.04 * np.sin(i / 3), 0.04,
                        0.0, 0.06, 0.008, 0.0])
        if jump_at is not None and i == jump_at:
            xi = jnp.array([8.0, 5.0, -3.0, 0.0, 2.5, 0.0, 0.0])
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


def _mk_system(params, window):
    cfg = dict(config_mod.default_config())
    cfg["tracking"] = dict(cfg["tracking"])
    cfg["tracking"]["match_frac_thresh"] = 0.95   # keyframe often
    cfg["single_thread"] = True
    cfg["runtime"] = dict(cfg.get("runtime", {}))
    cfg["runtime"]["tracking_window"] = window
    h, w = CFG.img_size
    return SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                      edge_capacity=64, model_module=oracle)


def _run_frames(system, n_frames, window):
    """Drive frames through the system; backend deliberately NOT run so the
    two paths see identical keyframe poses (BA scheduling differs by
    design between per-frame and windowed stepping)."""
    h, w = CFG.img_size
    i = 0
    while i < n_frames:
        if (window > 1 and system.mode == Mode.TRACKING
                and i + window <= n_frames):
            ids = list(range(i, i + window))
            imgs = [oracle.make_frame_image(t, h, w) for t in ids]
            i += system.process_window(ids, imgs)
        else:
            frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
            system.process_frame(frame)
            i += 1


@pytest.mark.parametrize("window", [2, 4])
def test_window_matches_per_frame(window):
    n_frames = 9
    traj = _traj(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    sys_a = _mk_system(params, 1)
    _run_frames(sys_a, n_frames, 1)
    sys_b = _mk_system(params, window)
    _run_frames(sys_b, n_frames, window)

    assert sys_b.stats["skipped"] == 0
    na, nb = len(sys_a.keyframes), len(sys_b.keyframes)
    assert na == nb and na >= 4
    assert sys_a.backend_queue == sys_b.backend_queue

    ka, kb = sys_a.keyframes, sys_b.keyframes
    np.testing.assert_array_equal(np.asarray(ka.dataset_idx[:na]),
                                  np.asarray(kb.dataset_idx[:nb]))
    np.testing.assert_allclose(np.asarray(ka.T_WC[:na]),
                               np.asarray(kb.T_WC[:nb]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ka.X[:na]),
                               np.asarray(kb.X[:nb]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ka.C[:na]),
                               np.asarray(kb.C[:nb]), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(ka.N[:na]),
                                  np.asarray(kb.N[:nb]))
    # last-frame pose carried identically
    np.testing.assert_allclose(np.asarray(sys_a.current_frame.T_WC),
                               np.asarray(sys_b.current_frame.T_WC),
                               atol=1e-5)


def test_window_halts_at_skip():
    """A mid-window tracking failure commits the prefix, enters RELOC at the
    offending frame, and leaves the remaining frames to the per-frame path
    (same store state as per-frame stepping)."""
    n_frames = 8
    jump_at = 5
    traj = _traj(n_frames, jump_at=jump_at)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    sys_a = _mk_system(params, 1)
    _run_frames(sys_a, n_frames, 1)
    sys_b = _mk_system(params, 4)
    _run_frames(sys_b, n_frames, 4)

    assert sys_a.stats["skipped"] >= 1
    assert sys_b.stats["skipped"] == sys_a.stats["skipped"]
    assert sys_a.mode == sys_b.mode
    na, nb = len(sys_a.keyframes), len(sys_b.keyframes)
    assert na == nb
    np.testing.assert_array_equal(np.asarray(sys_a.keyframes.dataset_idx[:na]),
                                  np.asarray(sys_b.keyframes.dataset_idx[:nb]))
    np.testing.assert_allclose(np.asarray(sys_a.keyframes.T_WC[:na]),
                               np.asarray(sys_b.keyframes.T_WC[:nb]),
                               atol=1e-5)


def test_window_with_dense_backend_matcher():
    """The tpu_fast combination — windowed frontend + dense coarse-to-fine
    matcher for backend/loop-closure edges — runs end-to-end WITH the
    backend drained (local_opt.matcher only affects factor-graph edge
    matching, so the backend must run to exercise it)."""
    n_frames = 8
    traj = _traj(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)
    system = _mk_system(params, window=2)
    system.factor_graph.cfg = system.factor_graph.cfg._replace(
        matcher="dense")
    h, w = CFG.img_size
    i = 0
    while i < n_frames:
        if system.mode == Mode.TRACKING and i + 2 <= n_frames:
            ids = list(range(i, i + 2))
            imgs = [oracle.make_frame_image(t, h, w) for t in ids]
            i += system.process_window(ids, imgs)
        else:
            frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
            system.process_frame(frame)
            i += 1
        while system.backend_step():
            pass
    assert system.mode in (Mode.TRACKING, Mode.RELOC)
    assert len(system.keyframes) >= 4
    assert system.factor_graph.n_edges >= 1   # dense matcher built edges
