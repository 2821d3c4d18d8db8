"""Failure-path visibility and robustness (round-3 hardening).

Covers the round-2 bench pathology end to end: a degenerate/untrained
network must not be able to push the system into a silent, unbounded
relocalization storm — (a) the 'exp' head activations stay finite for ANY
weights, (b) a reloc storm is visible in stats/metrics (reloc_failed,
frames_reloc), and (c) the documented ``reloc.reinit_after`` escape hatch
bounds it. Also gates the YAML wiring of BAConfig.solver / point_stride
(VERDICT round-2 items 2 and 5).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mast3r_slam_tpu import config as config_mod
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import oracle
from mast3r_slam_tpu.models.mast3r import MASt3RConfig
from mast3r_slam_tpu.slam import ba
from mast3r_slam_tpu.slam.frame import Mode
from mast3r_slam_tpu.slam.system import SLAMSystem

CFG = MASt3RConfig(img_size=(64, 96), enc_embed_dim=64, desc_dim=8,
                   dtype="float32")


# -- (a) head activations stay finite for any weights -------------------------


def test_exp_postprocess_finite_for_any_input():
    """reg_dense_pts3d/reg_dense_conf must be finite even for the huge raw
    head outputs an untrained network emits (the round-2 root cause:
    unclamped expm1 -> inf pointmaps -> inf normal equations -> permanent
    RELOC), while staying exactly the reference formula in the real-data
    range (postprocess.py:43-56)."""
    from mast3r_slam_tpu.models import dpt

    huge = jnp.asarray([[500.0, -300.0, 1e4]])
    pts = dpt.reg_dense_pts3d(huge)
    assert np.all(np.isfinite(np.asarray(pts)))
    assert np.all(np.isfinite(np.asarray(dpt.reg_dense_conf(huge[..., 0]))))
    # and the squared-magnitude range a GN Hessian accumulates stays finite
    assert np.isfinite(float(jnp.sum(pts * pts) * 196608))

    # no-op in the physical range (depth |xyz| < 20 => 4.9e8 metric units)
    small = jax.random.normal(jax.random.PRNGKey(0), (64, 3)) * 2.0
    d = jnp.linalg.norm(small, axis=-1, keepdims=True)
    ref = small / jnp.maximum(d, 1e-8) * jnp.expm1(d)
    np.testing.assert_allclose(np.asarray(dpt.reg_dense_pts3d(small)),
                               np.asarray(ref), rtol=1e-6)
    x = jax.random.normal(jax.random.PRNGKey(1), (64,)) * 3.0
    np.testing.assert_allclose(np.asarray(dpt.reg_dense_conf(x)),
                               np.asarray(1.0 + jnp.exp(x)), rtol=1e-6)


# -- (b)+(c) reloc storm: visible, bounded -------------------------------------


def _teleport_traj(n_good, n_bad):
    """Smooth motion, then a teleport to a disjoint scene region: tracking
    must fail at the jump (no shared surface points with the keyframe)."""
    Ts = [sim3.identity()]
    for _ in range(1, n_good):
        Ts.append(sim3.mul(Ts[-1], sim3.exp(
            jnp.array([0.15, 0.0, 0.03, 0.0, 0.05, 0.0, 0.0]))))
    far = sim3.exp(jnp.array([60.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]))
    base = sim3.mul(far, Ts[-1])
    Ts.append(base)
    for _ in range(1, n_bad):
        Ts.append(sim3.mul(Ts[-1], sim3.exp(
            jnp.array([0.15, 0.0, 0.03, 0.0, 0.05, 0.0, 0.0]))))
    return jnp.stack(Ts)


def _run_teleport(reinit_after, n_good=4, n_bad=5):
    from mast3r_slam_tpu.slam import retrieval as retrieval_mod
    from mast3r_slam_tpu.utils.metrics import Metrics

    h, w = CFG.img_size
    traj = _teleport_traj(n_good, n_bad)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)
    rparams = retrieval_mod.init_retrieval_params(
        jax.random.PRNGKey(1), backbone_dim=CFG.enc_embed_dim,
        proj_dim=64, codebook_size=256)

    cfg = dict(config_mod.default_config())
    cfg["tracking"] = dict(cfg["tracking"], match_frac_thresh=0.95)
    cfg["reloc"] = dict(cfg["reloc"], reinit_after=reinit_after)
    metrics = Metrics()
    system = SLAMSystem(params, CFG, cfg, (h, w), retrieval_params=rparams,
                        keyframe_capacity=16, edge_capacity=64,
                        model_module=oracle, metrics=metrics)
    for i in range(n_good + n_bad):
        frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
        system.process_frame(frame)
        while system.backend_step():
            pass
    return system, metrics


def test_reloc_storm_is_visible_in_stats():
    """Reference behavior (reinit_after=0): the teleport starts a reloc
    storm — every subsequent frame pays mono-init + retrieval + strict
    decode and fails. The storm must be VISIBLE: reloc_failed and
    frames_reloc count it in stats and the metrics stream (the reference
    only prints to stderr, main.py:62-66)."""
    system, metrics = _run_teleport(reinit_after=0)
    assert system.stats["skipped"] >= 1
    assert system.mode == Mode.RELOC
    assert system.stats["reloc_failed"] >= 2, system.stats
    assert system.stats["frames_reloc"] >= 2, system.stats
    assert system.stats["relocs"] == 0 and system.stats["reinits"] == 0
    events = [r for r in metrics.rows if r.get("event") == "reloc_failed"]
    assert len(events) == system.stats["reloc_failed"]
    assert events[-1]["streak"] == system.stats["reloc_failed"]


def test_reloc_reinit_escape_hatch_bounds_the_storm():
    """reloc.reinit_after=2: after 2 consecutive failed relocalizations the
    system restarts tracking from the current frame's mono pointmap and the
    post-teleport frames track normally again."""
    system, metrics = _run_teleport(reinit_after=2)
    assert system.stats["reinits"] == 1, system.stats
    assert system.stats["reloc_failed"] == 2
    assert system.mode == Mode.TRACKING
    # frames after the re-init tracked (not skipped): the skipped count is
    # the teleport frame plus the frames spent in RELOC, nothing later
    assert system.stats["skipped"] == 1
    assert system.stats["frames_tracking"] >= 2
    assert any(r.get("event") == "reinit" for r in metrics.rows)
    # the re-initialized segment produced a fresh keyframe
    assert len(system.keyframes) >= 3


# -- YAML wiring: solver / point_stride ---------------------------------------


def test_ba_config_yaml_wiring():
    cfg = dict(config_mod.default_config())
    cfg["local_opt"] = dict(cfg["local_opt"], solver="fp64_host",
                            point_stride=4)
    bacfg = config_mod.make_ba_config(cfg)
    assert bacfg.solver == "fp64_host"
    assert bacfg.point_stride == 4
    # defaults unchanged
    base = config_mod.make_ba_config(dict(config_mod.default_config()))
    assert base.solver == "fp32" and base.point_stride == 1


def test_retrieval_config_yaml_wiring():
    """`retrieval:` block must reach RetrievalDatabase's ASMK scoring
    params (VERDICT r3 weak #4: make_retrieval_config ignored its input).
    Spec: reference asmk_params (thirdparty/mast3r/mast3r/retrieval/
    processor.py:91-97)."""
    from mast3r_slam_tpu.models import init_params
    from mast3r_slam_tpu.slam import retrieval as retrieval_mod

    cfg = dict(config_mod.default_config())
    cfg["retrieval"] = dict(cfg["retrieval"], nfeat=123, ma_build=2,
                            ma_query=7, alpha=2.0,
                            similarity_threshold=0.125)
    rcfg = config_mod.make_retrieval_config(cfg)
    assert rcfg.nfeat == 123 and rcfg.ma_build == 2 and rcfg.ma_query == 7
    assert rcfg.alpha == 2.0 and rcfg.similarity_threshold == 0.125
    # absent keys keep the reference defaults
    base = config_mod.make_retrieval_config(dict(config_mod.default_config()))
    assert base == retrieval_mod.RetrievalConfig()

    # and SLAMSystem hands the derived config to the database
    params = init_params(jax.random.PRNGKey(0), CFG)
    rparams = retrieval_mod.init_retrieval_params(
        jax.random.PRNGKey(1), backbone_dim=CFG.enc_embed_dim,
        proj_dim=32, codebook_size=64)
    system = SLAMSystem(params, CFG, cfg, CFG.img_size,
                        retrieval_params=rparams, keyframe_capacity=4,
                        edge_capacity=8)
    assert system.retrieval.cfg == rcfg


def test_solver_fp64_host_reached_from_config(monkeypatch):
    """`local_opt: {solver: fp64_host}` in YAML must actually route the BA
    solve through the host fp64 callback (VERDICT r2 item 5)."""
    calls = {"n": 0}
    orig = ba._host_cholesky_fp64

    def counting(Hd, gd):
        calls["n"] += 1
        return orig(Hd, gd)

    monkeypatch.setattr(ba, "_host_cholesky_fp64", counting)

    cfg = dict(config_mod.default_config())
    cfg["local_opt"] = dict(cfg["local_opt"], solver="fp64_host",
                            max_iters=2)
    bacfg = config_mod.make_ba_config(cfg, point_chunk=64)
    assert bacfg.solver == "fp64_host"

    key = jax.random.PRNGKey(0)
    n_kf, P = 3, 64
    pts_w = jax.random.normal(key, (P, 3)) + jnp.array([0.0, 0.0, 4.0])
    T_true = jnp.stack([sim3.identity(),
                        sim3.exp(0.1 * jnp.ones(7)),
                        sim3.exp(-0.1 * jnp.ones(7))])
    Xs = jax.vmap(lambda T: sim3.act(sim3.inv(T), pts_w))(T_true)
    Cs = jnp.full((n_kf, P), 5.0)
    ii = jnp.array([0, 1, 1, 2], jnp.int32)
    jj = jnp.array([1, 0, 2, 1], jnp.int32)
    idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (4, P))
    valid = jnp.ones((4, P), bool)
    Q = jnp.full((4, P), 4.0)
    mask = jnp.ones((4,), jnp.float32)
    T = ba.gauss_newton_rays(T_true, Xs, Cs, ii, jj, idx, valid, Q, mask,
                             jnp.asarray(n_kf), bacfg)
    jax.block_until_ready(T)
    assert calls["n"] >= 1
