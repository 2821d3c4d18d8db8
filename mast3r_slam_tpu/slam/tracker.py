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
    kf_every: int = 0   # > 0: FORCE a keyframe every N frames instead of
                        # the match-fraction decision — fixed-cadence mode
                        # for benchmarking/regression (bench.py e2e)
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


def _gn_step_t(sqrt_info_t, r_t, J_t, huber_k):
    """Transposed-layout normal equations (TPU fast path).

    Same math as ``_gn_step`` but in component-major layout: r_t/sqrt_info_t
    are (d, N) and J_t is (d, 7, N) with the *point* axis minor. On TPU the
    minor-most axis maps to the 128-wide vector lanes, so (N, d, 7) arrays
    (d=3..4, 7 columns) waste ~95% of each vector register and of HBM
    bandwidth; with N minor every elementwise op is fully lane-utilized and
    H = AᵀA is one (7, 4N)x(4N, 7) MXU contraction.
    """
    whitened_r = sqrt_info_t * r_t
    rsi = sqrt_info_t * jnp.sqrt(robust.huber(whitened_r, huber_k))
    A = rsi[:, None, :] * J_t                       # (d, 7, N)
    b = rsi * r_t                                   # (d, N)
    H = jnp.einsum("din,djn->ij", A, A, preferred_element_type=jnp.float32)
    g = -jnp.einsum("din,dn->i", A, b, preferred_element_type=jnp.float32)
    cost = 0.5 * jnp.sum(b * b)
    tau, ok = _solve7(H, g)
    return tau, cost, ok


def _solve7(H, g):
    """Jacobi-equilibrated fp32 Cholesky of the 7x7 GN system (the same
    fp64-Eigen replacement recipe as ba._solve). The raw fp32 factorization
    failed on marginally-conditioned Sim(3) systems (mixed ray/dist/scale
    row scales; the round-3/4 'frame-34' e2e tracking failures — identical
    data succeeded through differently-fused programs, i.e. the raw solve
    sat at the edge of fp32). Equilibration buys ~cond(D)^2 headroom at
    negligible cost; the failure flag remains for genuinely singular
    systems."""
    d = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-12))
    d_inv = 1.0 / d
    Hs = H * d_inv[:, None] * d_inv[None, :] + 1e-8 * jnp.eye(7)
    L, low = jax.scipy.linalg.cho_factor(Hs, lower=True)
    tau = jax.scipy.linalg.cho_solve((L, low), g * d_inv) * d_inv
    # the ridge makes an all-zero H (no valid matches) factorize "fine";
    # that case must still raise the failed flag (-> reloc), so require a
    # live system on top of a finite update
    ok = jnp.all(jnp.isfinite(tau)) & (jnp.max(jnp.diagonal(H)) > 0.0)
    return jnp.where(ok, tau, jnp.zeros_like(tau)), ok


def _act_t(T, Xt):
    """Sim3 action on column points Xt (3, N): s R Xt + t."""
    t, q, s = sim3.parts(T)
    R = sim3.quat_to_matrix(q)
    return s * (R @ Xt) + t[:, None]


def _ray_dist_t(Yt):
    """[ray(3), dist(1)] of column points (3, N) -> ((4, N), d, r)."""
    d = jnp.sqrt(jnp.sum(Yt * Yt, axis=0))
    r = Yt / d
    return jnp.concatenate([r, d[None]], axis=0), d, r


def _ray_dist_pose_jacobian_t(d, rt):
    """Transposed closed-form d[ray,dist]/d(left Sim3 perturbation): (4,7,N).

    Same entries as geometry.ray_dist_pose_jacobian, component-major.
    """
    di = 1.0 / d
    rx, ry, rz = rt[0], rt[1], rt[2]
    z = jnp.zeros_like(d)
    row0 = [(1.0 - rx * rx) * di, -rx * ry * di, -rx * rz * di, z, rz, -ry, z]
    row1 = [-rx * ry * di, (1.0 - ry * ry) * di, -ry * rz * di, -rz, z, rx, z]
    row2 = [-rx * rz * di, -ry * rz * di, (1.0 - rz * rz) * di, ry, -rx, z, z]
    row3 = [rx, ry, rz, z, z, z, d]
    return jnp.stack([jnp.stack(r) for r in (row0, row1, row2, row3)])


def _calib_pose_jacobian_t(Yt, K, z_eps):
    """Transposed closed-form d[u,v,logz]/d(left Sim3 perturbation): (3,7,N).

    Same entries as geometry.calib_pose_jacobian, component-major.
    """
    from .. import geometry

    fx, fy, cx, cy = geometry.decompose_K(K)
    x, y, zc = Yt[0], Yt[1], Yt[2]
    valid = zc > z_eps
    zi = jnp.where(valid, 1.0 / jnp.where(valid, zc, 1.0), 0.0)
    xz = x * zi
    yz = y * zi
    z = jnp.zeros_like(zi)
    one = jnp.where(valid, jnp.ones_like(zi), 0.0)
    row_u = [fx * zi, z, -fx * xz * zi,
             -fx * xz * yz, fx * (one + xz * xz), -fx * yz, z]
    row_v = [z, fy * zi, -fy * yz * zi,
             -fy * (one + yz * yz), fy * xz * yz, fy * xz, z]
    row_z = [z, z, zi, yz, -xz, z, one]
    return jnp.stack([jnp.stack(r) for r in (row_u, row_v, row_z)])


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
    tau, ok = _solve7(H, g)
    return tau, cost, ok


def _run_gn(residual_fn, T_init, cfg: TrackerConfig, step_fn=_gn_step):
    """Shared GN driver: while_loop with convergence/failure exits."""

    def cond(state):
        T, old_cost, it, done, failed = state
        return (~done) & (it < cfg.max_iters)

    def body(state):
        T, old_cost, it, done, failed = state
        sqrt_info, r, J = residual_fn(T)
        tau, cost, ok = step_fn(sqrt_info, r, J, cfg.huber)
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
    sQ = (jnp.sqrt(Qk) * valid)[:, 0]               # (N,)
    si_t = jnp.stack([sQ / cfg.sigma_ray] * 3 + [sQ / cfg.sigma_dist])
    Xk_t = Xk.T
    rd_k_t, _, _ = _ray_dist_t(Xk_t)
    Xf_t = Xf.T

    def residual(T):
        Yt = _act_t(T, Xf_t)
        rd_f_t, d, rt = _ray_dist_t(Yt)
        r_t = rd_k_t - rd_f_t
        J_t = -_ray_dist_pose_jacobian_t(d, rt)
        return si_t, r_t, J_t

    return _run_gn(residual, T_CkCf_init, cfg, step_fn=_gn_step_t)


@partial(jax.jit, static_argnames=("cfg", "img_size"))
def opt_pose_calib_sim3(Xf, Xk, T_CkCf_init, Qk, valid, meas_k, valid_meas_k,
                        K, img_size, cfg: TrackerConfig):
    """Pixel + log-depth GN (calibrated). Spec: tracker.py:216-266."""
    sQ = (jnp.sqrt(Qk) * valid)[:, 0]               # (N,)
    si_t = jnp.stack([sQ / cfg.sigma_pixel] * 2 + [sQ / cfg.sigma_depth])
    Xf_t = Xf.T
    meas_k_t = meas_k.T                              # (3, N)
    valid_meas = valid_meas_k[:, 0]                  # (N,)
    h, w = img_size
    fx, fy, cx, cy = geometry.decompose_K(K)
    border, z_eps = cfg.pixel_border, cfg.depth_eps

    def residual(T):
        Yt = _act_t(T, Xf_t)
        x, y, zc = Yt[0], Yt[1], Yt[2]
        valid_z = zc > z_eps
        z_safe = jnp.where(valid_z, zc, 1.0)
        zi = 1.0 / z_safe
        u = fx * x * zi + cx
        v = fy * y * zi + cy
        valid_proj = (
            (u > border) & (u < w - 1 - border)
            & (v > border) & (v < h - 1 - border) & valid_z
        )
        logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
        pz_t = jnp.stack([u, v, logz])
        w_t = (valid_proj & valid_meas)[None] * si_t
        r_t = meas_k_t - pz_t
        J_t = -_calib_pose_jacobian_t(Yt, K, z_eps)
        return w_t, r_t, J_t

    return _run_gn(residual, T_CkCf_init, cfg, step_fn=_gn_step_t)


@partial(jax.jit, static_argnames=("img_size",))
def calib_measurements(Xk, K, img_size, depth_eps: float):
    """Pixel+log-depth targets for the keyframe (spec: tracker.py:144-152)."""
    uv = geometry.pixel_coords(img_size, dtype=Xk.dtype)
    z = Xk[..., 2:3]
    valid = z > depth_eps
    logz = jnp.where(valid, jnp.log(jnp.where(valid, z, 1.0)), 0.0)
    meas = jnp.concatenate([uv, logz], axis=-1) * valid
    return meas, valid
