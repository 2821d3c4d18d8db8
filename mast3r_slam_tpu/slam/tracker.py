"""Frame-to-keyframe Sim(3) tracking via Gauss-Newton (jit-compiled).

TPU-native re-design of /root/reference/mast3r_slam/tracker.py:156-266. The
two residual types are preserved exactly:

* uncalibrated: ray + log-free distance residual [r(3), |X|] with the
  closed-form Jacobians of geometry.point_to_ray_dist / act_Sim3;
* calibrated: pixel + log-depth residual [u, v, log z] via project_calib.

The reference runs a data-dependent python loop with early convergence exit
and a torch Cholesky per step; here the whole optimization is a single
``lax.while_loop`` inside ``jit`` — the normal equations H = AᵀA are one
(N·r, 7)ᵀ(N·r, 7) MXU matmul, the 7x7 Cholesky solve is negligible, and a
failed factorization (non-finite update) terminates the loop and raises a
``failed`` flag instead of throwing (spec: tracker.py:91-93 catches the
torch exception and requests relocalization).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geometry, robust
from ..lie import sim3


class TrackerConfig(NamedTuple):
    """Static tracking hyperparameters (config/base.yaml `tracking`)."""

    max_iters: int = 50
    C_conf: float = 0.0
    Q_conf: float = 1.5
    rel_error: float = 1e-3
    delta_norm: float = 1e-3
    huber: float = 1.345
    min_match_frac: float = 0.05
    match_frac_thresh: float = 0.333
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    pixel_border: int = -10
    depth_eps: float = 1e-6


class TrackResult(NamedTuple):
    T_CkCf: jnp.ndarray  # (8,) refined relative pose
    cost: jnp.ndarray    # final half-SSE
    iters: jnp.ndarray   # iterations executed
    failed: jnp.ndarray  # bool: non-finite Cholesky update encountered


def _gn_step(sqrt_info, r, J, huber_k):
    """Whitened, Huber-robustified normal equations and solve.

    Spec: tracker.py solve() (:156-171). r: (N, d), J: (N, d, 7),
    sqrt_info: (N, d). Returns (tau (7,), cost, ok).
    """
    whitened_r = sqrt_info * r
    robust_sqrt_info = sqrt_info * jnp.sqrt(robust.huber(whitened_r, huber_k))
    A = (robust_sqrt_info[..., None] * J).reshape(-1, 7)
    b = (robust_sqrt_info * r).reshape(-1)
    H = A.T @ A
    g = -A.T @ b
    cost = 0.5 * jnp.dot(b, b)

    L, low = jax.scipy.linalg.cho_factor(H, lower=True)
    tau = jax.scipy.linalg.cho_solve((L, low), g)
    ok = jnp.all(jnp.isfinite(tau))
    tau = jnp.where(ok, tau, jnp.zeros_like(tau))
    return tau, cost, ok


def _run_gn(residual_fn, T_init, cfg: TrackerConfig):
    """Shared GN driver: while_loop with convergence/failure exits."""

    def cond(state):
        T, old_cost, it, done, failed = state
        return (~done) & (it < cfg.max_iters)

    def body(state):
        T, old_cost, it, done, failed = state
        sqrt_info, r, J = residual_fn(T)
        tau, cost, ok = _gn_step(sqrt_info, r, J, cfg.huber)
        T_new = sim3.retr(T, tau)
        T_new = jnp.where(ok, T_new, T)
        conv = robust.converged(cfg.rel_error, cfg.delta_norm, old_cost, cost, tau)
        return (T_new, cost, it + 1, conv | (~ok), failed | (~ok))

    init = (
        T_init,
        jnp.asarray(jnp.inf, dtype=T_init.dtype),
        jnp.asarray(0, dtype=jnp.int32),
        jnp.asarray(False),
        jnp.asarray(False),
    )
    T, cost, it, done, failed = jax.lax.while_loop(cond, body, init)
    return TrackResult(T, cost, it, failed)


@partial(jax.jit, static_argnames=("cfg",))
def opt_pose_ray_dist_sim3(Xf, Xk, T_CkCf_init, Qk, valid, cfg: TrackerConfig):
    """Ray + distance GN (uncalibrated). Spec: tracker.py:173-214.

    Args:
      Xf: (N, 3) frame points gathered at the match indices (frame->kf).
      Xk: (N, 3) keyframe canonical points.
      T_CkCf_init: (8,) initial relative Sim3.
      Qk: (N, 1) match confidences; valid: (N, 1) bool.
    """
    sQ = jnp.sqrt(Qk) * valid
    sqrt_info = jnp.concatenate(
        [jnp.repeat(sQ / cfg.sigma_ray, 3, axis=-1), sQ / cfg.sigma_dist],
        axis=-1,
    )
    rd_k = geometry.point_to_ray_dist(Xk)

    def residual(T):
        Xf_Ck = geometry.act_Sim3(T, Xf)
        rd_f = geometry.point_to_ray_dist(Xf_Ck)
        r = rd_k - rd_f
        J = -geometry.ray_dist_pose_jacobian(Xf_Ck)
        return sqrt_info, r, J

    return _run_gn(residual, T_CkCf_init, cfg)


@partial(jax.jit, static_argnames=("cfg", "img_size"))
def opt_pose_calib_sim3(Xf, Xk, T_CkCf_init, Qk, valid, meas_k, valid_meas_k,
                        K, img_size, cfg: TrackerConfig):
    """Pixel + log-depth GN (calibrated). Spec: tracker.py:216-266."""
    sQ = jnp.sqrt(Qk) * valid
    sqrt_info = jnp.concatenate(
        [jnp.repeat(sQ / cfg.sigma_pixel, 2, axis=-1), sQ / cfg.sigma_depth],
        axis=-1,
    )

    def residual(T):
        Xf_Ck = geometry.act_Sim3(T, Xf)
        pz, valid_proj = geometry.project_calib(
            Xf_Ck, K, img_size, border=cfg.pixel_border, z_eps=cfg.depth_eps,
        )
        w = (valid_proj & valid_meas_k) * sqrt_info
        r = meas_k - pz
        J = -geometry.calib_pose_jacobian(Xf_Ck, K, z_eps=cfg.depth_eps)
        return w, r, J

    return _run_gn(residual, T_CkCf_init, cfg)


@partial(jax.jit, static_argnames=("img_size",))
def calib_measurements(Xk, K, img_size, depth_eps: float):
    """Pixel+log-depth targets for the keyframe (spec: tracker.py:144-152)."""
    uv = geometry.pixel_coords(img_size, dtype=Xk.dtype)
    z = Xk[..., 2:3]
    valid = z > depth_eps
    logz = jnp.where(valid, jnp.log(jnp.where(valid, z, 1.0)), 0.0)
    meas = jnp.concatenate([uv, logz], axis=-1) * valid
    return meas, valid
