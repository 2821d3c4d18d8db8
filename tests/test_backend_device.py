"""Backend-on-a-dedicated-device (parallel/backend_device.py).

With ``runtime.backend_device`` set, the factor graph's programs (edge
decode + match + global GN) execute on a second device while the frontend
owns device 0; the mirror keeps the backend's view of the keyframe store
consistent at every backend step. The oracle end-to-end run must produce
the SAME map and trajectory as the single-device system (same platform,
same programs — only placement differs)."""

import numpy as np

import jax
import jax.numpy as jnp

from mast3r_slam_tpu import config as config_mod
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import oracle
from mast3r_slam_tpu.models.mast3r import MASt3RConfig
from mast3r_slam_tpu.slam.system import SLAMSystem

CFG = MASt3RConfig(img_size=(64, 96), enc_embed_dim=64, desc_dim=8,
                   dtype="float32")


def _traj(n):
    Ts = [sim3.identity()]
    for i in range(1, n):
        xi = jnp.array([0.18, 0.04 * np.sin(i / 3), 0.04,
                        0.0, 0.06, 0.008, 0.0])
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


def _run(params, cfg_over, n_frames, h, w):
    cfg = dict(config_mod.default_config())
    cfg["tracking"] = dict(cfg["tracking"], match_frac_thresh=0.95)
    for k, v in cfg_over.items():
        cfg[k] = dict(cfg.get(k, {}), **v) if isinstance(v, dict) else v
    system = SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                        edge_capacity=64, model_module=oracle)
    for i in range(n_frames):
        frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
        system.process_frame(frame)
        while system.backend_step():
            pass
    return system


def test_backend_device_matches_single_device():
    assert jax.device_count() >= 2, "conftest provides 8 virtual devices"
    n_frames = 8
    h, w = CFG.img_size
    traj = _traj(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    sys_a = _run(params, {}, n_frames, h, w)
    sys_b = _run(params, {"runtime": {"backend_device": 1}}, n_frames, h, w)

    assert sys_b._backend_mirror is not None
    # the factor graph's buffers really live on device 1
    assert list(sys_b.factor_graph.ii.devices())[0] == jax.devices()[1]
    leaf = jax.tree_util.tree_leaves(sys_b.factor_graph.params)[0]
    assert list(leaf.devices())[0] == jax.devices()[1]

    na, nb = len(sys_a.keyframes), len(sys_b.keyframes)
    assert na == nb and na >= 3
    assert sys_a.factor_graph.n_edges == sys_b.factor_graph.n_edges > 0
    np.testing.assert_allclose(np.asarray(sys_a.keyframes.T_WC[:na]),
                               np.asarray(sys_b.keyframes.T_WC[:nb]),
                               atol=1e-5)
    e = sys_a.factor_graph.n_edges
    np.testing.assert_array_equal(np.asarray(sys_a.factor_graph.ii[:e]),
                                  np.asarray(sys_b.factor_graph.ii[:e]))
    np.testing.assert_allclose(np.asarray(sys_a.factor_graph.Q[:e]),
                               np.asarray(sys_b.factor_graph.Q[:e]),
                               atol=1e-5)
    # poses flowed back to the frontend store (device 0 / default)
    d0 = list(sys_b.keyframes.T_WC.devices())[0]
    assert d0 == jax.devices()[0]


def test_backend_device_with_consec_reuse():
    """The consec-edge reuse path must transfer the tracker match to the
    backend device and keep counts consistent."""
    n_frames = 8
    h, w = CFG.img_size
    traj = _traj(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    sys_b = _run(params, {"runtime": {"backend_device": 1},
                          "local_opt": {"reuse_consec_edge": True}},
                 n_frames, h, w)
    n_kf = len(sys_b.keyframes)
    e = sys_b.factor_graph.n_edges
    assert n_kf >= 3 and e >= 2 * (n_kf - 1)
    ii = np.asarray(sys_b.factor_graph.ii[:e])
    jj = np.asarray(sys_b.factor_graph.jj[:e])
    pairs = set(zip(ii.tolist(), jj.tolist()))
    for k in range(1, n_kf):
        assert (k, k - 1) in pairs and (k - 1, k) in pairs


def test_pick_backend_device_spec_semantics():
    """Config-value parsing: off-values, auto, and EXPLICIT indices (the
    integer 1 must not be swallowed by the bool-auto check: 1 == True)."""
    import pytest

    from mast3r_slam_tpu.parallel.backend_device import pick_backend_device

    for off in (None, "none", "None", "", 0, False):
        assert pick_backend_device(off) is None
    assert pick_backend_device("auto") == jax.devices()[1]
    assert pick_backend_device(True) == jax.devices()[1]
    assert pick_backend_device(1) == jax.devices()[1]
    assert pick_backend_device(2) == jax.devices()[2]
    with pytest.raises(ValueError):
        pick_backend_device(len(jax.local_devices()))
    with pytest.raises(ValueError):
        pick_backend_device(-3)
