import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu import geometry
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.slam import tracker


def _two_view_fixture(key, n=2000, noise=0.0):
    """Synthetic two-view problem with known relative Sim3."""
    kp, kt = jax.random.split(key)
    # points in frame f's camera, in front of camera
    Xf = jax.random.normal(kp, (n, 3)) * jnp.array([0.5, 0.5, 0.3]) + jnp.array(
        [0.0, 0.0, 2.5]
    )
    xi_true = jnp.array([0.05, -0.03, 0.08, 0.04, -0.02, 0.03, 0.05])
    T_true = sim3.exp(xi_true)
    Xk = sim3.act(T_true, Xf)
    if noise > 0:
        Xk = Xk + noise * jax.random.normal(kt, (n, 3))
    return Xf, Xk, T_true


def test_ray_dist_gn_converges_to_truth():
    key = jax.random.PRNGKey(0)
    Xf, Xk, T_true = _two_view_fixture(key)
    cfg = tracker.TrackerConfig()
    Q = jnp.full((Xf.shape[0], 1), 4.0)
    valid = jnp.ones((Xf.shape[0], 1), dtype=bool)
    res = tracker.opt_pose_ray_dist_sim3(Xf, Xk, sim3.identity(), Q, valid, cfg)
    assert not bool(res.failed)
    err = sim3.log(sim3.mul(sim3.inv(T_true), res.T_CkCf))
    assert float(jnp.linalg.norm(err)) < 1e-3, np.asarray(err)


def test_ray_dist_gn_robust_to_outliers():
    key = jax.random.PRNGKey(1)
    Xf, Xk, T_true = _two_view_fixture(key, noise=1e-3)
    # corrupt 10% of matches
    n = Xf.shape[0]
    k_out = jax.random.PRNGKey(2)
    mask = jax.random.uniform(k_out, (n, 1)) < 0.1
    Xk = jnp.where(mask, Xk + 0.5, Xk)
    cfg = tracker.TrackerConfig()
    Q = jnp.full((n, 1), 4.0)
    valid = jnp.ones((n, 1), dtype=bool)
    res = tracker.opt_pose_ray_dist_sim3(Xf, Xk, sim3.identity(), Q, valid, cfg)
    err = sim3.log(sim3.mul(sim3.inv(T_true), res.T_CkCf))
    assert float(jnp.linalg.norm(err)) < 5e-2, np.asarray(err)


def test_calib_gn_converges_to_truth():
    key = jax.random.PRNGKey(3)
    h, w = 48, 64
    K = jnp.array([[60.0, 0.0, 32.0], [0.0, 60.0, 24.0], [0.0, 0.0, 1.0]])
    # keyframe points on the pixel grid with a smooth depth field
    uv = geometry.pixel_coords((h, w))
    z = 2.0 + 0.2 * jnp.sin(uv[:, 0:1] / 9.0) + 0.1 * jnp.cos(uv[:, 1:2] / 7.0)
    Xk = geometry.backproject(uv, z, K)
    xi_true = jnp.array([0.02, -0.01, 0.03, 0.02, -0.015, 0.01, 0.02])
    T_true = sim3.exp(xi_true)  # T_CkCf
    Xf = sim3.act(sim3.inv(T_true), Xk)

    cfg = tracker.TrackerConfig()
    meas, valid_meas = tracker.calib_measurements(Xk, K, (h, w), cfg.depth_eps)
    Q = jnp.full((Xk.shape[0], 1), 4.0)
    valid = jnp.ones((Xk.shape[0], 1), dtype=bool)
    res = tracker.opt_pose_calib_sim3(
        Xf, Xk, sim3.identity(), Q, valid, meas, valid_meas, K, (h, w), cfg
    )
    assert not bool(res.failed)
    err = sim3.log(sim3.mul(sim3.inv(T_true), res.T_CkCf))
    assert float(jnp.linalg.norm(err)) < 1e-3, np.asarray(err)


def test_gn_failure_flag_on_degenerate_input():
    # all-invalid matches -> singular H -> failed flag, pose unchanged
    n = 100
    Xf = jnp.ones((n, 3))
    Xk = jnp.ones((n, 3))
    Q = jnp.zeros((n, 1))
    valid = jnp.zeros((n, 1), dtype=bool)
    cfg = tracker.TrackerConfig()
    res = tracker.opt_pose_ray_dist_sim3(Xf, Xk, sim3.identity(), Q, valid, cfg)
    assert bool(res.failed)
    np.testing.assert_allclose(
        np.asarray(res.T_CkCf), np.asarray(sim3.identity()), atol=1e-6
    )


def test_transposed_gn_matches_reference_layout():
    """The component-major (TPU fast-path) GN must reproduce the original
    row-major formulation exactly (same iterates, same solution)."""
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = 500
    Xk = jax.random.normal(k1, (n, 3)) + jnp.asarray([0, 0, 3.0])
    T_true = sim3.exp(0.05 * jax.random.normal(k2, (7,)))
    Xf = sim3.act(sim3.inv(T_true), Xk) + 0.01 * jax.random.normal(k3, (n, 3))
    Q = jnp.abs(jax.random.normal(k4, (n, 1))) + 2.0
    valid = jax.random.uniform(key, (n, 1)) > 0.1
    cfg = tracker.TrackerConfig()
    sQ = jnp.sqrt(Q) * valid

    # ray+dist: reference-shaped residual via geometry.py closed forms
    si = jnp.concatenate(
        [jnp.repeat(sQ / cfg.sigma_ray, 3, axis=-1), sQ / cfg.sigma_dist], -1)
    rd_k = geometry.point_to_ray_dist(Xk)

    def res_old(T_):
        Y = geometry.act_Sim3(T_, Xf)
        return si, rd_k - geometry.point_to_ray_dist(Y), \
            -geometry.ray_dist_pose_jacobian(Y)

    r_old = tracker._run_gn(res_old, sim3.identity(), cfg,
                            step_fn=tracker._gn_step)
    r_new = tracker.opt_pose_ray_dist_sim3(Xf, Xk, sim3.identity(), Q, valid,
                                           cfg)
    assert int(r_old.iters) == int(r_new.iters)
    np.testing.assert_allclose(np.asarray(r_old.T_CkCf),
                               np.asarray(r_new.T_CkCf), atol=1e-5)

    # calib: pixel + log-depth
    img_size = (20, 25)
    K = jnp.asarray([[10.0, 0, 12], [0, 10.0, 9], [0, 0, 1]])
    meas_k, valid_meas = tracker.calib_measurements(Xk, K, img_size,
                                                    cfg.depth_eps)
    si_c = jnp.concatenate(
        [jnp.repeat(sQ / cfg.sigma_pixel, 2, axis=-1), sQ / cfg.sigma_depth],
        -1)

    def res_old_c(T_):
        Y = geometry.act_Sim3(T_, Xf)
        pz, vp = geometry.project_calib(Y, K, img_size,
                                        border=cfg.pixel_border,
                                        z_eps=cfg.depth_eps)
        w = (vp & valid_meas) * si_c
        return w, meas_k - pz, -geometry.calib_pose_jacobian(
            Y, K, z_eps=cfg.depth_eps)

    rc_old = tracker._run_gn(res_old_c, sim3.identity(), cfg,
                             step_fn=tracker._gn_step)
    rc_new = tracker.opt_pose_calib_sim3(Xf, Xk, sim3.identity(), Q, valid,
                                         meas_k, valid_meas, K, img_size, cfg)
    assert int(rc_old.iters) == int(rc_new.iters)
    np.testing.assert_allclose(np.asarray(rc_old.T_CkCf),
                               np.asarray(rc_new.T_CkCf), atol=2e-3)
