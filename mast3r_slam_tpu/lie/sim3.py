"""Pure-JAX Sim(3) Lie group.

TPU-native replacement for the external ``lietorch`` CUDA library used by the
reference SLAM (see /root/reference/mast3r_slam/frame.py:239 for the embedded
layout and /root/reference/mast3r_slam/backend/src/gn_kernels.cu:182-453 for
the executable spec of quaternion composition, ``expSim3`` W-coefficients and
the left-multiplicative retraction).

Storage layout (embedded dim 8, matching lietorch so that trajectories and
checkpoints interop): ``[tx, ty, tz, qx, qy, qz, qw, s]``.

Tangent layout (dim 7): ``[tau(3), omega(3), sigma(1)]`` (translation,
rotation, log-scale) — matches the ordering used by the reference GN kernels.

All functions are shape-polymorphic over leading batch dimensions and are
safe under ``jit``/``vmap``/``grad`` (series expansions switch via
``jnp.where`` with Taylor fallbacks, no data-dependent control flow).

Differentiation design note: lietorch ships hand-written CUDA
forward/backward kernels; here autodiff correctness at the theta->0 /
sigma->0 singularities is achieved with sentinel-guarded branches
(the double-``where`` pattern) instead of ``jax.custom_jvp`` overrides —
the derivative XLA builds is then both exact and fusable, and the hot
solvers bypass autodiff entirely via the closed-form Jacobians in
``geometry.py``/``slam/ba.py``. Gradient finiteness at the singular
points is regression-tested (tests/test_sim3.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EMBEDDED_DIM = 8
TANGENT_DIM = 7
_EPS = 1e-6


# ---------------------------------------------------------------------------
# quaternion helpers (xyzw convention, scalar last — lietorch compatible)
# ---------------------------------------------------------------------------


def quat_mul(qi: jnp.ndarray, qj: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product qi * qj, xyzw layout."""
    xi, yi, zi, wi = jnp.split(qi, 4, axis=-1)
    xj, yj, zj, wj = jnp.split(qj, 4, axis=-1)
    return jnp.concatenate(
        [
            wi * xj + xi * wj + yi * zj - zi * yj,
            wi * yj - xi * zj + yi * wj + zi * xj,
            wi * zj + xi * yj - yi * xj + zi * wj,
            wi * wj - xi * xj - yi * yj - zi * zj,
        ],
        axis=-1,
    )


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (assumes unit quaternion)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_act(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) v by unit quaternion q: R(q) v."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + qw * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = jnp.split(q, 4, axis=-1)
    x2, y2, z2 = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    rows = [
        jnp.concatenate([1 - 2 * (y2 + z2), 2 * (xy - wz), 2 * (xz + wy)], -1),
        jnp.concatenate([2 * (xy + wz), 1 - 2 * (x2 + z2), 2 * (yz - wx)], -1),
        jnp.concatenate([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (x2 + y2)], -1),
    ]
    return jnp.stack(rows, axis=-2)


def exp_so3_quat(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential as a quaternion; Taylor fallback near zero."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta_p4 = theta_sq * theta_sq
    # series: sin(t/2)/t and cos(t/2)
    small = theta_sq < _EPS
    theta = jnp.sqrt(jnp.where(small, 1.0, theta_sq))
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_p4 / 3840.0,
        jnp.sin(0.5 * theta) / jnp.where(small, 1.0, theta),
    )
    real = jnp.where(
        small,
        1.0 - theta_sq / 8.0 + theta_p4 / 384.0,
        jnp.cos(0.5 * theta),
    )
    return jnp.concatenate([imag * phi, real], axis=-1)


def log_so3_quat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> rotation vector (inverse of exp_so3_quat)."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # force positive hemisphere for a principal log
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign
    qw = qw * sign
    nv_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    small = nv_sq < _EPS * _EPS
    nv = jnp.sqrt(jnp.where(small, 1.0, nv_sq))
    angle = 2.0 * jnp.arctan2(nv, qw)
    # phi = angle * qv / nv, with Taylor 2/qw for small angles
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), angle / jnp.where(small, 1.0, nv))
    return scale * qv


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------


def identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    base = jnp.array([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(batch_shape) + (EMBEDDED_DIM,))


def from_parts(t, q, s):
    s = jnp.asarray(s)
    if s.ndim < t.ndim:
        s = s[..., None]
    return jnp.concatenate([t, q, s], axis=-1)


def parts(T):
    """Split embedded vector into (t, q, s); s keeps a trailing singleton dim."""
    return T[..., 0:3], T[..., 3:7], T[..., 7:8]


def act(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply Sim3 to point(s): Y = s R X + t.

    T broadcasts against X over leading dims: T (..., 8), X (..., N, 3) works
    with T (..., 1, 8) style broadcasting handled by the caller; here we only
    require the trailing dims to line up after standard numpy broadcasting.
    """
    t, q, s = parts(T)
    return s * quat_act(q, X) + t


def inv(T: jnp.ndarray) -> jnp.ndarray:
    t, q, s = parts(T)
    q_inv = quat_inv(q)
    s_inv = 1.0 / s
    t_inv = -s_inv * quat_act(q_inv, t)
    return from_parts(t_inv, q_inv, s_inv)


def mul(Ta: jnp.ndarray, Tb: jnp.ndarray) -> jnp.ndarray:
    """Compose: Ta * Tb (apply Tb first).

    The quaternion is RE-NORMALIZED: fp32 rounding leaves |q| = 1 + e
    after each compose, and the SLAM pose chain composes ~200x per
    keyframe (50 GN retractions x 4 frames) — un-renormalized, the
    deviation compounds exponentially (~1.7x/frame measured) and blows up
    the stored keyframe poses after ~30-35 frames (|q|: 1.0001 -> 1.0008
    -> 1.007 -> 1.065 -> 1.76 across keyframes 4-8, scripts/replay_ba.py
    round-4 dumps). This was the e2e 'frame-34 corruption' previously
    misattributed to the relayed backend: fusing the real network into
    the programs only changes the fp32 rounding SEED (pure-oracle
    programs drifted too, just later). lietorch keeps unit quaternions
    the same way (normalized storage)."""
    ta, qa, sa = parts(Ta)
    tb, qb, sb = parts(Tb)
    q = quat_mul(qa, qb)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = sa * quat_act(qa, tb) + ta
    s = sa * sb
    return from_parts(t, q, s)


def rel(Ti: jnp.ndarray, Tj: jnp.ndarray) -> jnp.ndarray:
    """Relative transform Ti^{-1} * Tj (spec: gn_kernels.cu relSim3, :252-272)."""
    return mul(inv(Ti), Tj)


def _w_coefficients(theta_sq, theta, sigma, scale):
    """A, B, C coefficients of W = C I + A Phi + B Phi^2 in the Sim3 exp.

    Semantics follow gn_kernels.cu:323-390 (lietorch rxso3), but the branch
    structure is reworked for fp32: the reference's closed forms suffer
    catastrophic cancellation for |sigma| or theta in [1e-6, 1e-2] (e.g.
    (scale-1)/sigma as exp(s)-1 at s=1e-5 loses ~3 digits), so we use
    expm1-based forms and Taylor series (from A = int_0^1 t e^{s t} dt,
    B = int_0^1 t^2/2 e^{s t} dt at theta->0) with wide thresholds.
    """
    one = 1.0
    s_tiny = jnp.abs(sigma) < 1e-20
    s_small = jnp.abs(sigma) < 0.1
    t_small = theta < 1e-2

    safe_theta_sq = jnp.where(t_small, 1.0, theta_sq)
    safe_theta = jnp.where(t_small, 1.0, theta)
    safe_sigma = jnp.where(s_tiny, 1.0, sigma)
    sigma_sq = sigma * sigma

    # C = expm1(s)/s is cancellation-free for any s != 0
    C = jnp.where(s_tiny, 1.0 + 0.5 * sigma, jnp.expm1(sigma) / safe_sigma)

    # --- theta small ------------------------------------------------------
    # series in sigma (valid |s| < 0.1), with theta^2 correction at s~0
    A_ts = (0.5 - theta_sq / 24.0) + sigma * (1.0 / 3.0) \
        + sigma_sq * (1.0 / 8.0) + sigma * sigma_sq * (1.0 / 30.0)
    B_ts = (1.0 / 6.0 - theta_sq / 120.0) + sigma * (1.0 / 8.0) \
        + sigma_sq * (1.0 / 20.0) + sigma * sigma_sq * (1.0 / 72.0)
    # exact small-theta forms for large |s|
    safe_sigma_sq = jnp.where(s_small, 1.0, sigma_sq)
    A_tl = (sigma * scale - jnp.expm1(sigma)) / safe_sigma_sq
    B_tl = (0.5 * sigma_sq * scale + jnp.expm1(sigma) - sigma * scale) / (
        safe_sigma_sq * safe_sigma
    )
    A_t = jnp.where(s_small, A_ts, A_tl)
    B_t = jnp.where(s_small, B_ts, B_tl)

    # --- theta large ------------------------------------------------------
    a = scale * jnp.sin(theta)
    b = scale * jnp.cos(theta)
    c = theta_sq + sigma_sq
    safe_c = jnp.where(t_small, 1.0, c)
    A_g = (a * sigma + (one - b) * theta) / (safe_theta * safe_c)
    B_g = (C - ((b - one) * sigma + a * theta) / safe_c) / safe_theta_sq

    A = jnp.where(t_small, A_t, A_g)
    B = jnp.where(t_small, B_t, B_g)
    return A, B, C


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) exponential map. xi = [tau(3), omega(3), sigma(1)] -> embedded."""
    tau = xi[..., 0:3]
    phi = xi[..., 3:6]
    sigma = xi[..., 6:7]

    scale = jnp.exp(sigma)
    q = exp_so3_quat(phi)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS * _EPS
    # sentinel-inside-sqrt keeps reverse-mode gradients finite at theta=0
    theta = jnp.where(small, 0.0, jnp.sqrt(jnp.where(small, 1.0, theta_sq)))

    A, B, C = _w_coefficients(theta_sq, theta, sigma, scale)

    phi_x_tau = jnp.cross(phi, tau)
    phi_x2_tau = jnp.cross(phi, phi_x_tau)
    t = C * tau + A * phi_x_tau + B * phi_x2_tau
    return from_parts(t, q, scale)


def log(T: jnp.ndarray) -> jnp.ndarray:
    """Sim(3) logarithm (inverse of exp); W inverted with a 3x3 solve."""
    t, q, s = parts(T)
    phi = log_so3_quat(q)
    sigma = jnp.log(s)

    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = theta_sq < _EPS * _EPS
    theta = jnp.where(small, 0.0, jnp.sqrt(jnp.where(small, 1.0, theta_sq)))
    A, B, C = _w_coefficients(theta_sq, theta, sigma, jnp.exp(sigma))

    Phi = skew(phi)
    I = jnp.eye(3, dtype=T.dtype)
    W = C[..., None] * I + A[..., None] * Phi + B[..., None] * (Phi @ Phi)
    tau = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([tau, phi, sigma], axis=-1)


def retr(T: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left-multiplicative retraction: exp(xi) * T.

    Matches lietorch ``Sim3.retr`` and the CUDA ``pose_retr_kernel``
    (gn_kernels.cu:415-453) used by both the tracker and global BA.
    """
    return mul(exp(xi), T)


def normalize(T: jnp.ndarray) -> jnp.ndarray:
    """Re-normalize the quaternion part (guards against fp drift)."""
    t, q, s = parts(T)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return from_parts(t, q, s)


def matrix(T: jnp.ndarray) -> jnp.ndarray:
    """Embedded -> 4x4 homogeneous matrix (scale folded into rotation)."""
    t, q, s = parts(T)
    R = quat_to_matrix(q) * s[..., None]
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), t.shape[:-1] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of v (spec: geometry.py:5-9)."""
    x, y, z = jnp.split(v, 3, axis=-1)
    o = jnp.zeros_like(x)
    rows = [
        jnp.concatenate([o, -z, y], -1),
        jnp.concatenate([z, o, -x], -1),
        jnp.concatenate([-y, x, o], -1),
    ]
    return jnp.stack(rows, axis=-2)


def apply_adj_inv_T(T: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Apply Adj(T)^{-T} to tangent row-covector(s) v (dim 7).

    This converts a Jacobian w.r.t. the *relative* pose perturbation into a
    Jacobian w.r.t. pose j's own left perturbation.
    Executable spec: gn_kernels.cu apply_Sim3_adj_inv (:277-297).
    v layout [a(3), b(3), c(1)] -> output [s^-1 R a, s^-1 [t]x R a + R b,
    s^-1 t.R a + c].
    """
    t, q, s = parts(T)
    a = v[..., 0:3]
    b = v[..., 3:6]
    c = v[..., 6:7]
    s_inv = 1.0 / s
    Ra = quat_act(q, a)
    Rb = quat_act(q, b)
    y0 = s_inv * Ra
    y1 = Rb + s_inv * jnp.cross(t, Ra)
    y2 = c + s_inv * jnp.sum(t * Ra, axis=-1, keepdims=True)
    return jnp.concatenate([y0, y1, y2], axis=-1)


def to_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Drop the scale: Sim3 -> SE3 embedded [t, q] (dim 7).

    Spec: lietorch_utils.as_SE3 (/root/reference/mast3r_slam/lietorch_utils.py:6-13).
    """
    return T[..., :7]
