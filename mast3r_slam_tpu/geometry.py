"""Camera/point geometry with closed-form Jacobians (pure JAX).

TPU-native re-implementation of the math in
/root/reference/mast3r_slam/geometry.py (ray+distance residuals, pinhole
projection with log-depth, backprojection) used by both the frame tracker and
global bundle adjustment. All functions are batch-polymorphic and jit-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .lie import sim3


def point_to_dist(X):
    return jnp.linalg.norm(X, axis=-1, keepdims=True)


def point_to_ray_dist(X, jacobian: bool = False):
    """[ray(3), dist(1)] of 3D points; optional (…,4,3) Jacobian.

    Spec: geometry.py:17-34.
    """
    d = point_to_dist(X)
    d_inv = 1.0 / d
    r = d_inv * X
    rd = jnp.concatenate([r, d], axis=-1)
    if not jacobian:
        return rd
    d_inv_2 = d_inv * d_inv
    I = jnp.eye(3, dtype=X.dtype)
    outer = X[..., :, None] * X[..., None, :]
    dr_dX = d_inv[..., None] * (I - d_inv_2[..., None] * outer)
    dd_dX = r[..., None, :]
    drd_dX = jnp.concatenate([dr_dX, dd_dX], axis=-2)
    return rd, drd_dX


def act_Sim3(T, X, jacobian: bool = False):
    """Apply Sim3 and optionally the (…,3,7) Jacobian w.r.t. a left
    perturbation [tau, omega, sigma] of T.

    Spec: geometry.py:45-52 — J = [I | -skew(TX) | TX].
    """
    Y = sim3.act(T, X)
    if not jacobian:
        return Y
    I = jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), Y.shape[:-1] + (3, 3))
    J = jnp.concatenate([I, -sim3.skew(Y), Y[..., :, None]], axis=-1)
    return Y, J


def decompose_K(K):
    return K[..., 0, 0], K[..., 1, 1], K[..., 0, 2], K[..., 1, 2]


def project_calib(P, K, img_size, jacobian: bool = False, border: int = 0,
                  z_eps: float = 0.0):
    """Pinhole projection producing [u, v, log z] with validity mask.

    Spec: geometry.py:63-104. ``img_size`` is (h, w); ``border`` may be
    negative (allow projections slightly outside the image).
    """
    h, w = img_size
    fx, fy, cx, cy = decompose_K(K)
    x = P[..., 0:1]
    y = P[..., 1:2]
    z = P[..., 2:3]
    valid_z = z > z_eps
    z_safe = jnp.where(valid_z, z, 1.0)
    z_inv = 1.0 / z_safe
    u = fx * x * z_inv + cx
    v = fy * y * z_inv + cy

    valid_u = (u > border) & (u < w - 1 - border)
    valid_v = (v > border) & (v < h - 1 - border)
    valid = valid_u & valid_v & valid_z

    logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
    pz = jnp.concatenate([u, v, logz], axis=-1)
    if not jacobian:
        return pz, valid

    zi = jnp.where(valid_z[..., 0], z_inv[..., 0], 0.0)
    xz = x[..., 0] * zi
    yz = y[..., 0] * zi
    zero = jnp.zeros_like(zi)
    # rows: d[u,v,logz]/d[x,y,z]
    row_u = jnp.stack([fx * zi, zero, -fx * xz * zi], axis=-1)
    row_v = jnp.stack([zero, fy * zi, -fy * yz * zi], axis=-1)
    row_z = jnp.stack([zero, zero, zi], axis=-1)
    dpz_dP = jnp.stack([row_u, row_v, row_z], axis=-2)
    return pz, dpz_dP, valid


def backproject(p, z, K):
    """Pixels + depth -> 3D points (spec: geometry.py:107-115)."""
    x = (p[..., 0:1] - K[..., 0, 2]) / K[..., 0, 0]
    y = (p[..., 1:2] - K[..., 1, 2]) / K[..., 1, 1]
    ones = jnp.ones_like(x)
    ray = jnp.concatenate([x, y, ones], axis=-1)
    return z * ray


def estimate_focal(X, img_size, pp=None, conf=None, iters: int = 10,
                   z_eps: float = 1e-6):
    """Robust focal-length estimate from a canonical pointmap.

    No reference counterpart in the SLAM (the reference either gets K from
    the dataset or runs the ray-residual mode; its
    ``refine_pose_with_calibration`` at evaluate.py:42 is referenced but
    never defined). This enables the calibrated pipeline on unknown-camera
    video (e.g. the fork's MP4/bodycam workflow, README.md:165-177): with a
    pinhole model, pixel offsets from the principal point satisfy
    (u - cx, v - cy) = f * (x/z, y/z), so f is a 1-D robust regression.
    Solved by Weiszfeld IRLS on the L2 residual of the 2-vector (the
    geometric-median analog; equivalent to minimizing sum_i w_i
    |q_i - f r_i| with w_i re-estimated as inverse residual norms).

    Args:
      X: (n, 3) pointmap in the camera frame (row-major pixel order).
      img_size: (h, w) of the pixel grid.
      pp: (2,) principal point; defaults to the image center.
      conf: optional (n,) nonnegative weights (e.g. pointmap confidence).
    Returns: scalar focal length in pixels (fx = fy model).
    """
    h, w = img_size
    if pp is None:
        pp = jnp.asarray([w / 2.0, h / 2.0], X.dtype)
    q = pixel_coords(img_size, X.dtype) - pp                    # (n, 2)
    z = jnp.maximum(jnp.abs(X[:, 2:3]), z_eps) * jnp.sign(
        jnp.where(X[:, 2:3] == 0, 1.0, X[:, 2:3]))
    r = X[:, :2] / z                                            # (n, 2)
    base_w = jnp.ones(X.shape[0], X.dtype) if conf is None else conf
    rr = jnp.sum(r * r, axis=-1)
    qr = jnp.sum(q * r, axis=-1)

    def ls(wts):
        return jnp.sum(wts * qr) / jnp.maximum(jnp.sum(wts * rr), 1e-12)

    f0 = ls(base_w)

    def body(_, f):
        res = jnp.linalg.norm(q - f * r, axis=-1)
        wts = base_w / jnp.maximum(res, 1e-6)
        return ls(wts)

    return jax.lax.fori_loop(0, iters, body, f0)


def pixel_coords(img_size, dtype=jnp.float32):
    """(h*w, 2) [u, v] pixel grid in row-major pixel order."""
    h, w = img_size
    v, u = jnp.meshgrid(jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype),
                        indexing="ij")
    return jnp.stack([u, v], axis=-1).reshape(h * w, 2)


def ray_dist_pose_jacobian(Y):
    """Closed-form d[ray, dist]/d(left Sim3 perturbation) at transformed
    points Y: (..., 4, 7), fusing point_to_ray_dist's Jacobian with
    act_Sim3's [I, -skew(Y), Y] analytically (the structure the CUDA kernel
    hand-codes, gn_kernels.cu:972-1085):

        ray rows:  [ (I - r r^T)/d | -skew(r) | 0 ]
        dist row:  [      r^T      |    0     | d ]
    """
    d = jnp.linalg.norm(Y, axis=-1, keepdims=True)
    d_inv = 1.0 / d
    r = Y * d_inv
    I = jnp.eye(3, dtype=Y.dtype)
    dr_dP = d_inv[..., None] * (I - r[..., :, None] * r[..., None, :])
    ray_rows = jnp.concatenate(
        [dr_dP, -sim3.skew(r), jnp.zeros_like(r)[..., :, None]], axis=-1
    )
    zeros3 = jnp.zeros_like(r)
    dist_row = jnp.concatenate([r, zeros3, d], axis=-1)[..., None, :]
    return jnp.concatenate([ray_rows, dist_row], axis=-2)


def calib_pose_jacobian(P, K, z_eps: float = 0.0):
    """Closed-form d[u, v, log z]/d(left Sim3 perturbation) at camera points
    P: (..., 3, 7). Matches calib_proj_kernel's hand-coded rows
    (gn_kernels.cu:1420-1470); invalid depths produce zero rows.
    """
    fx, fy, cx, cy = decompose_K(K)
    x = P[..., 0]
    y = P[..., 1]
    z = P[..., 2]
    valid = z > z_eps
    zi = jnp.where(valid, 1.0 / jnp.where(valid, z, 1.0), 0.0)
    xz = x * zi
    yz = y * zi
    zero = jnp.zeros_like(zi)
    one = jnp.where(valid, jnp.ones_like(zi), 0.0)
    row_u = jnp.stack([fx * zi, zero, -fx * xz * zi,
                       -fx * xz * yz, fx * (one + xz * xz), -fx * yz,
                       zero], axis=-1)
    row_v = jnp.stack([zero, fy * zi, -fy * yz * zi,
                       -fy * (one + yz * yz), fy * xz * yz, fy * xz,
                       zero], axis=-1)
    row_z = jnp.stack([zero, zero, zi, yz, -xz, zero, one], axis=-1)
    return jnp.stack([row_u, row_v, row_z], axis=-2)


def constrain_points_to_ray(img_size, Xs, K):
    """Replace x,y with the calibrated ray through each pixel, keeping z.

    Spec: geometry.py:37-42. ``Xs`` is (..., h*w, 3) in pixel order.
    """
    uv = pixel_coords(img_size, dtype=Xs.dtype)
    uv = jnp.broadcast_to(uv, Xs.shape[:-1] + (2,))
    return backproject(uv, Xs[..., 2:3], K)
