"""Global pose-graph Gauss-Newton over keyframe Sim(3) poses (pure JAX).

TPU-native re-design of the reference backend solver
(/root/reference/mast3r_slam/backend/src/gn_kernels.cu):

* ``ray_align_kernel`` (:813-1138) / ``calib_proj_kernel`` (:1231-1543):
  one CUDA block per edge accumulates a 14x14 edge Hessian over h*w matched
  points. Here the same math is a batched einsum: per point-chunk we build
  the (E, C, r, 14) Jacobian (residual rows r = 4 ray+dist or 3 pixel+logz)
  and contract it to (E, 14, 14) blocks with one MXU matmul, scanning over
  chunks to bound memory. Jacobians come from the same closed forms as the
  tracker (geometry.py) composed with the inverse-adjoint map
  (sim3.apply_adj_inv_T == gn_kernels.cu apply_Sim3_adj_inv:277-297).

* ``SparseBlock`` + Eigen fp64 CPU Cholesky (:57-159): replaced by a dense
  block matrix (K <= a few hundred keyframes => 7K <= ~3.6k, trivially
  dense on one chip) assembled with scatter-adds and factored with an fp32
  Cholesky after Jacobi (diagonal) equilibration — the equilibration
  recovers the conditioning headroom the reference bought with fp64.

* ``pose_retr_kernel`` (:415-453): sim3.retr over the active pose slice.

Everything is capacity-padded and masked: edges beyond ``n_edges`` and
keyframes beyond ``n_kf`` contribute nothing, so one compiled program
serves the whole run (XLA-friendly static shapes).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import geometry, robust
from ..lie import sim3


class BAConfig(NamedTuple):
    """Static global-opt hyperparameters (config/base.yaml `local_opt`)."""

    pin: int = 1
    max_iters: int = 10
    C_conf: float = 0.0
    Q_conf: float = 1.5
    sigma_ray: float = 0.003
    sigma_dist: float = 10.0
    sigma_pixel: float = 1.0
    sigma_depth: float = 10.0
    sigma_point: float = 0.05
    delta_norm: float = 1e-8
    pixel_border: int = -10
    depth_eps: float = 1e-6
    point_chunk: int = 8192
    solver: str = "fp32"   # "fp32": equilibrated on-device Cholesky (the
                           # production path); "fp64_host": fp64 Cholesky in
                           # a host callback — the debugging fallback that
                           # reproduces the reference's Eigen fp64 CPU solve
                           # (gn_kernels.cu:57-159) bit-for-bit in precision
    point_stride: int = 1  # use every s-th measurement pixel per edge in
                           # the Hessian accumulation. The CUDA kernel
                           # integrates all h*w matched points
                           # (gn_kernels.cu:913-961) but the normal
                           # equations are a massively redundant sum of
                           # ~196k rank-4 terms per edge; a stride-s
                           # subsample keeps the estimate (oracle e2e
                           # rel-ATE regression-gated) at ~1/s the BA
                           # device time. 1 = reference parity.


def _gather_points(Xs, Cs, ii, idx):
    """Xi[e, p] = Xs[ii[e], idx[e, p]] as one flat take (E, P, 3)/(E, P).

    One fused 4-wide row gather (X and C together). This runs ONCE per
    solve — the match indices are loop-invariant, so the gather (the only
    random-access op in BA) is hoisted out of the GN while_loop; the CUDA
    kernel re-gathers every iteration (gn_kernels.cu:930-961) because
    GPU gathers are cheap, TPU ones are not.
    """
    K, P, _ = Xs.shape
    XC = jnp.concatenate([Xs, Cs[..., None]], axis=-1).reshape(K * P, 4)
    flat_idx = (ii[:, None] * P + idx).reshape(-1)
    g = jnp.take(XC, flat_idx, axis=0).reshape(*idx.shape, 4)
    return g[..., 0:3], g[..., 3]


def _act_t_b(T, Xt):
    """Batched Sim3 action on column points: T (E, 8), Xt (E, 3, C)."""
    t, q, s = sim3.parts(T)
    R = sim3.quat_to_matrix(q)
    return s[..., None] * jnp.einsum("eij,ejc->eic", R, Xt) + t[..., None]


def _ray_dist_t_b(Yt):
    """[ray, dist] of batched column points (E, 3, C) -> ((E,4,C), d, r)."""
    d = jnp.sqrt(jnp.sum(Yt * Yt, axis=1))
    r = Yt / d[:, None]
    return jnp.concatenate([r, d[:, None]], axis=1), d, r


def _stack_rows(rows):
    """[[comp (E,C)] * 7] * r -> (E, r, 7, C)."""
    return jnp.stack([jnp.stack(row, axis=1) for row in rows], axis=1)


def _ray_jac_t_b(d, r):
    """Component-major ray+dist pose Jacobian: (E, 4, 7, C).

    Same entries as geometry.ray_dist_pose_jacobian; the point axis is
    minor so every elementwise op rides full vector lanes.
    """
    di = 1.0 / d
    rx, ry, rz = r[:, 0], r[:, 1], r[:, 2]
    z = jnp.zeros_like(d)
    return _stack_rows([
        [(1.0 - rx * rx) * di, -rx * ry * di, -rx * rz * di, z, rz, -ry, z],
        [-rx * ry * di, (1.0 - ry * ry) * di, -ry * rz * di, -rz, z, rx, z],
        [-rx * rz * di, -ry * rz * di, (1.0 - rz * rz) * di, ry, -rx, z, z],
        [rx, ry, rz, z, z, z, d],
    ])


def _point_jac_t_b(Yt):
    """Component-major 3D point-difference pose Jacobian: (E, 3, 7, C)."""
    x, y, zc = Yt[:, 0], Yt[:, 1], Yt[:, 2]
    z = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    return _stack_rows([
        [one, z, z, z, zc, -y, x],
        [z, one, z, -zc, z, x, y],
        [z, z, one, y, -x, z, zc],
    ])


def _calib_jac_t_b(Yt, K_mat, z_eps):
    """Component-major pixel+log-depth pose Jacobian: (E, 3, 7, C)."""
    fx, fy, cx, cy = geometry.decompose_K(K_mat)
    x, y, zc = Yt[:, 0], Yt[:, 1], Yt[:, 2]
    valid = zc > z_eps
    zi = jnp.where(valid, 1.0 / jnp.where(valid, zc, 1.0), 0.0)
    xz = x * zi
    yz = y * zi
    z = jnp.zeros_like(zi)
    one = jnp.where(valid, jnp.ones_like(zi), 0.0)
    return _stack_rows([
        [fx * zi, z, -fx * xz * zi,
         -fx * xz * yz, fx * (one + xz * xz), -fx * yz, z],
        [z, fy * zi, -fy * yz * zi,
         -fy * (one + yz * yz), fy * xz * yz, fy * xz, z],
        [z, z, zi, yz, -xz, z, one],
    ])


def _apply_adj_inv_T_t(T, J):
    """Batched component-major Adj(T)^{-T}: T (E, 8), J (E, r, 7, C).

    Same map as sim3.apply_adj_inv_T (spec gn_kernels.cu:277-297):
    [a, b, c] -> [s^-1 R a, R b + s^-1 t x (R a), c + s^-1 t . (R a)].
    """
    t, q, s = sim3.parts(T)
    R = sim3.quat_to_matrix(q)
    a = J[:, :, 0:3, :]
    b = J[:, :, 3:6, :]
    c = J[:, :, 6:7, :]
    Ra = jnp.einsum("eij,erjc->eric", R, a)
    Rb = jnp.einsum("eij,erjc->eric", R, b)
    s_inv = (1.0 / s)[:, :, None, None]
    tx = t[:, None, :, None]
    t_x_Ra = jnp.stack([
        tx[:, :, 1, :] * Ra[:, :, 2] - tx[:, :, 2, :] * Ra[:, :, 1],
        tx[:, :, 2, :] * Ra[:, :, 0] - tx[:, :, 0, :] * Ra[:, :, 2],
        tx[:, :, 0, :] * Ra[:, :, 1] - tx[:, :, 1, :] * Ra[:, :, 0],
    ], axis=2)
    t_dot_Ra = jnp.sum(tx * Ra, axis=2, keepdims=True)
    return jnp.concatenate(
        [s_inv * Ra, Rb + s_inv * t_x_Ra, c + s_inv * t_dot_Ra], axis=2)


def _adj_inv_matrix(T):
    """The 7x7 matrix M with M v == apply_adj_inv_T(T, v): T (E, 8).

    The inverse-adjoint map is PER-EDGE linear in the Jacobian rows, so the
    per-point Hessian accumulation can run on the raw relative-pose
    Jacobian and be conjugated once per edge: S = M S0 M^T, g = M g0
    (the CUDA kernel applies the map per point, gn_kernels.cu:1040-1085 —
    h*w times more work for the same result).
    """
    t, q, s = sim3.parts(T)
    R = sim3.quat_to_matrix(q)
    s_inv = (1.0 / s)[..., None]
    E = T.shape[0]
    Z3 = jnp.zeros_like(R)
    top = jnp.concatenate([s_inv * R, Z3, jnp.zeros((E, 3, 1))], axis=-1)
    mid = jnp.concatenate([s_inv * (sim3.skew(t) @ R), R,
                           jnp.zeros((E, 3, 1))], axis=-1)
    bot = jnp.concatenate([s_inv * jnp.einsum("ei,eij->ej", t, R)[:, None],
                           jnp.zeros((E, 1, 3)), jnp.ones((E, 1, 1))],
                          axis=-1)
    return jnp.concatenate([top, mid, bot], axis=-2)


def _edge_terms(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                cfg: BAConfig, residual_fn, n_rows: int,
                pre=None):
    """Shared per-edge Hessian/gradient driver (component-major).

    Scans point chunks; per chunk ``residual_fn(Tij, Xj_t, Xi_t, safe_idx)``
    (column-point layouts (E, 3, C)) returns (err (E, r, C), J_theta
    (E, r, 7, C) w.r.t. the relative-pose perturbation, sqrt_w_rows
    broadcastable to (E, r, C), extra_valid (E, C)). The driver applies the
    confidence gates, the inverse-adjoint map (gn_kernels.cu
    apply_Sim3_adj_inv) and Huber IRLS weights, and contracts to
    (E, 14, 14) blocks + (E, 14) gradients with MXU matmuls over the
    point axis. ``pre`` carries the loop-invariant gathered points
    (from _edge_prep) so the while_loop body stays gather-free.
    """
    Ti = T_WCs[ii]
    Tj = T_WCs[jj]
    Tij = sim3.rel(Ti, Tj)

    if pre is None:
        pre = _edge_prep(Xs, Cs, ii, jj, idx, valid_match,
                         stride=cfg.point_stride)
    Xi_all, Ci_all, Xj_all, Cj_all, safe_idx_all = pre
    if cfg.point_stride > 1:   # pre is already strided; match the gates
        valid_match = valid_match[:, ::cfg.point_stride]
        Q = Q[:, ::cfg.point_stride]
    E, P = safe_idx_all.shape

    C = min(cfg.point_chunk, P)
    n_chunks = -(-P // C)
    pad = n_chunks * C - P

    def pad_pts(x, fill=0):
        if pad == 0:
            return x
        cfgpad = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, cfgpad, constant_values=fill)

    def to_chunks(x):
        x = pad_pts(x)
        x = x.reshape((E, n_chunks, C) + x.shape[2:])
        return jnp.moveaxis(x, 1, 0)

    inputs = (
        to_chunks(safe_idx_all), to_chunks(valid_match), to_chunks(Q),
        to_chunks(Xi_all), to_chunks(Ci_all),
        to_chunks(Xj_all), to_chunks(Cj_all),
    )

    def chunk(carry, chunk_in):
        S_acc, g_acc = carry
        idx_c, vm_c, Q_c, Xi_c, Ci_c, Xj_c, Cj_c = chunk_in

        err, J_theta, sqrt_w_rows, extra_valid = residual_fn(
            Tij, Xj_c.transpose(0, 2, 1), Xi_c.transpose(0, 2, 1), idx_c)

        valid = (
            vm_c
            & (Q_c > cfg.Q_conf)
            & (Ci_c > cfg.C_conf)
            & (Cj_c > cfg.C_conf)
            & extra_valid
        )
        sqrt_w = jnp.where(valid[:, None, :],
                           sqrt_w_rows * jnp.sqrt(Q_c)[:, None, :], 0.0)
        w = robust.huber(sqrt_w * err) * sqrt_w * sqrt_w
        w = w * edge_mask[:, None, None]

        # per-point work contracts only the RAW 7-dim theta-Jacobian; the
        # per-edge inverse-adjoint and the [[S,-S],[-S,S]] block structure
        # of the 14x14 edge Hessian are applied once per edge below. The
        # single sqrt-weighted operand A halves the materialized Jacobian
        # traffic (S0 = A A^T instead of (wJ) J^T).
        rw = jnp.sqrt(w)
        A = rw[:, :, None, :] * J_theta
        S_acc = S_acc + jnp.einsum(
            "erik,erjk->eij", A, A, preferred_element_type=jnp.float32
        )
        g_acc = g_acc + jnp.einsum(
            "erk,erik->ei", rw * err, A,
            preferred_element_type=jnp.float32
        )
        return (S_acc, g_acc), None

    init = (jnp.zeros((E, 7, 7)), jnp.zeros((E, 7)))
    (S0, g0), _ = jax.lax.scan(chunk, init, inputs)

    M = _adj_inv_matrix(Ti)
    S = M @ S0 @ M.transpose(0, 2, 1)                    # (E, 7, 7)
    gj = jnp.einsum("eij,ej->ei", M, g0)                 # (E, 7)
    H = jnp.concatenate([
        jnp.concatenate([S, -S], axis=-1),
        jnp.concatenate([-S, S], axis=-1),
    ], axis=-2)
    g = jnp.concatenate([-gj, gj], axis=-1)
    return H, g


def _edge_prep(Xs, Cs, ii, jj, idx, valid_match, stride: int = 1):
    """Loop-invariant per-edge data: gathered matched points + confs.

    ``stride`` > 1 subsamples the measurement pixels (the j-side point axis;
    see BAConfig.point_stride) — the i-side gather indices stay full-map
    indices. Callers that pass a prebuilt ``pre`` into ``_edge_terms*`` must
    build it with stride == cfg.point_stride.
    """
    if stride > 1:
        idx = idx[:, ::stride]
        valid_match = valid_match[:, ::stride]
        Xs_j, Cs_j = Xs[:, ::stride], Cs[:, ::stride]
    else:
        Xs_j, Cs_j = Xs, Cs
    safe_idx = jnp.where(valid_match, idx, 0)
    Xi, Ci = _gather_points(Xs, Cs, ii, safe_idx)
    return (Xi, Ci, Xs_j[jj], Cs_j[jj], safe_idx)


def _edge_terms_rays(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                     cfg: BAConfig, pre=None):
    """Ray+dist residual (spec: ray_align_kernel). H layout: rows/cols
    0:7 = pose i, 7:14 = pose j."""
    sigma = jnp.array([1.0 / cfg.sigma_ray] * 3 +
                      [1.0 / cfg.sigma_dist])[None, :, None]

    def residual(Tij, Xj_t, Xi_t, safe_idx):
        rd_i, _, _ = _ray_dist_t_b(Xi_t)
        Y = _act_t_b(Tij, Xj_t)
        rd_j, d, r = _ray_dist_t_b(Y)
        err = rd_j - rd_i
        J_theta = _ray_jac_t_b(d, r)
        ones = jnp.ones(safe_idx.shape, bool)
        return err, J_theta, sigma, ones

    return _edge_terms(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                       cfg, residual, n_rows=4, pre=pre)


def _edge_terms_points(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                       cfg: BAConfig, pre=None):
    """3D point-difference residual (spec: point_align_kernel,
    gn_kernels.cu:455-723 — exported by the reference backend though unused
    by its driver)."""
    sigma = jnp.full((3,), 1.0 / cfg.sigma_point)[None, :, None]

    def residual(Tij, Xj_t, Xi_t, safe_idx):
        Y = _act_t_b(Tij, Xj_t)
        err = Y - Xi_t
        J_theta = _point_jac_t_b(Y)
        ones = jnp.ones(safe_idx.shape, bool)
        return err, J_theta, sigma, ones

    return _edge_terms(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                       cfg, residual, n_rows=3, pre=pre)


def _edge_terms_calib(T_WCs, Xs, Cs, K_mat, ii, jj, idx, valid_match, Q,
                      edge_mask, img_size, cfg: BAConfig, pre=None):
    """Pixel + log-depth residual (spec: calib_proj_kernel)."""
    h, w = img_size
    fx, fy, cx, cy = geometry.decompose_K(K_mat)
    sigma = jnp.array([1.0 / cfg.sigma_pixel] * 2 +
                      [1.0 / cfg.sigma_depth])[None, :, None]
    border, z_eps = cfg.pixel_border, cfg.depth_eps

    def residual(Tij, Xj_t, Xi_t, safe_idx):
        u_t = (safe_idx % w).astype(Xj_t.dtype)
        v_t = (safe_idx // w).astype(Xj_t.dtype)
        Y = _act_t_b(Tij, Xj_t)
        x, y, zc = Y[:, 0], Y[:, 1], Y[:, 2]
        valid_z = zc > z_eps
        z_safe = jnp.where(valid_z, zc, 1.0)
        z_inv = 1.0 / z_safe
        u = fx * x * z_inv + cx
        v = fy * y * z_inv + cy
        valid_proj = (
            (u > border) & (u < w - 1 - border)
            & (v > border) & (v < h - 1 - border) & valid_z
        )
        logz = jnp.where(valid_z, jnp.log(z_safe), 0.0)
        zi = Xi_t[:, 2]
        valid_zi = zi > z_eps
        log_zi = jnp.where(valid_zi,
                           jnp.log(jnp.where(valid_zi, zi, 1.0)), 0.0)
        err = jnp.stack([u - u_t, v - v_t, logz - log_zi], axis=1)
        J_theta = _calib_jac_t_b(Y, K_mat, z_eps)
        return err, J_theta, sigma, valid_proj & valid_zi

    return _edge_terms(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                       cfg, residual, n_rows=3, pre=pre)


def _assemble(H_edges, g_edges, ii, jj, n_kf, K_cap, pin):
    """Scatter edge blocks into the dense 7K x 7K normal-equation system.

    Pinned poses (index < pin) and inactive slots (>= n_kf) get zero rows
    (identity diagonals are added in ``_solve``). Separated from the solve so
    the multi-chip path can all-reduce partial systems between the two
    (parallel/dist_ba.py).
    """
    D = 7
    Hii = H_edges[:, 0:7, 0:7]
    Hij = H_edges[:, 0:7, 7:14]
    Hji = H_edges[:, 7:14, 0:7]
    Hjj = H_edges[:, 7:14, 7:14]
    gi = g_edges[:, 0:7]
    gj = g_edges[:, 7:14]

    active_i = (ii >= pin) & (ii < n_kf)
    active_j = (jj >= pin) & (jj < n_kf)
    # sentinel slot K_cap collects all pinned/inactive contributions
    si = jnp.where(active_i, ii, K_cap)
    sj = jnp.where(active_j, jj, K_cap)

    Hb = jnp.zeros((K_cap + 1, K_cap + 1, D, D))
    Hb = Hb.at[si, si].add(Hii)
    Hb = Hb.at[si, sj].add(Hij)
    Hb = Hb.at[sj, si].add(Hji)
    Hb = Hb.at[sj, sj].add(Hjj)
    gb = jnp.zeros((K_cap + 1, D))
    gb = gb.at[si].add(gi)
    gb = gb.at[sj].add(gj)

    Hb = Hb[:K_cap, :K_cap]
    gb = gb[:K_cap]
    Hd = Hb.transpose(0, 2, 1, 3).reshape(K_cap * D, K_cap * D)
    gd = gb.reshape(K_cap * D)
    return Hd, gd


def _host_cholesky_fp64(Hd, gd):
    """Host-side fp64 Cholesky solve (the Eigen-equivalent debug fallback,
    gn_kernels.cu:73,139). Returns dx fp32; zeros on factorization failure
    (cu:147-149)."""
    import numpy as np

    H = np.asarray(Hd, np.float64)
    g = np.asarray(gd, np.float64)
    try:
        import scipy.linalg as sla

        c = sla.cho_factor(H, lower=True)
        dx = sla.cho_solve(c, g)
    except Exception:
        return np.zeros_like(g, dtype=np.float32)
    if not np.all(np.isfinite(dx)):
        return np.zeros_like(g, dtype=np.float32)
    return dx.astype(np.float32)


def _solve(Hd, gd, n_kf, K_cap, pin, solver: str = "fp32"):
    """Cholesky solve of the assembled system.

    Identity diagonals for pinned/inactive rows (spec: num_fix handling in
    gn_kernels.cu:1157); Eigen-failure fallback dx = 0 (cu:147-149).
    ``solver`` is static: "fp32" = Jacobi-equilibrated on-device fp32
    (production), "fp64_host" = fp64 in a host callback (the reference's
    Eigen-precision debug fallback; SURVEY §7 hard-parts list).
    """
    D = 7
    kf_ids = jnp.arange(K_cap)
    free = (kf_ids >= pin) & (kf_ids < n_kf)
    free_rows = jnp.repeat(free, D)
    Hd = Hd + jnp.diag(jnp.where(free_rows, 0.0, 1.0))
    gd = jnp.where(free_rows, gd, 0.0)

    if solver == "fp64_host":
        dx = jax.pure_callback(
            _host_cholesky_fp64,
            jax.ShapeDtypeStruct(gd.shape, jnp.float32), Hd, gd)
        return -dx.reshape(K_cap, D), free

    # Jacobi equilibration + fp32 Cholesky (fp64 Eigen replacement)
    d = jnp.sqrt(jnp.maximum(jnp.diag(Hd), 1e-12))
    d_inv = 1.0 / d
    Hs = Hd * d_inv[:, None] * d_inv[None, :]
    Hs = Hs + 1e-8 * jnp.eye(K_cap * D)
    L, low = jax.scipy.linalg.cho_factor(Hs, lower=True)
    dx = jax.scipy.linalg.cho_solve((L, low), gd * d_inv) * d_inv
    dx = -dx.reshape(K_cap, D)
    ok = jnp.all(jnp.isfinite(dx))
    dx = jnp.where(ok, dx, 0.0)
    return dx, free


def _assemble_and_solve(H_edges, g_edges, ii, jj, n_kf, K_cap, pin,
                        solver: str = "fp32"):
    Hd, gd = _assemble(H_edges, g_edges, ii, jj, n_kf, K_cap, pin)
    return _solve(Hd, gd, n_kf, K_cap, pin, solver)


@partial(jax.jit, static_argnames=("cfg",))
def gauss_newton_rays(T_WCs, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q,
                      edge_mask, n_kf, cfg: BAConfig):
    """Global GN on ray+dist residuals (spec: gauss_newton_rays_cuda).

    Args (capacity-padded, static shapes):
      T_WCs: (K_cap, 8) Sim3 poses.  Xs: (K_cap, P, 3).  Cs: (K_cap, P).
      ii, jj: (E_cap,) two-way edge endpoints.  idx_ii2jj: (E_cap, P) int32.
      valid_match: (E_cap, P) bool.  Q: (E_cap, P).  edge_mask: (E_cap,).
      n_kf: traced active keyframe count.
    Returns updated (K_cap, 8) poses.
    """
    K_cap = T_WCs.shape[0]
    pre = _edge_prep(Xs, Cs, ii, jj, idx_ii2jj, valid_match,
                     stride=cfg.point_stride)

    def body(state):
        T, it, done = state
        H, g = _edge_terms_rays(T, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q,
                                edge_mask, cfg, pre=pre)
        dx, free = _assemble_and_solve(H, g, ii, jj, n_kf, K_cap, cfg.pin,
                                       cfg.solver)
        T_new = sim3.retr(T, dx)
        T = jnp.where(free[:, None], T_new, T)
        delta_norm = jnp.linalg.norm(jnp.where(free[:, None], dx, 0.0))
        return T, it + 1, delta_norm < cfg.delta_norm

    def cond(state):
        _, it, done = state
        return (~done) & (it < cfg.max_iters)

    T, _, _ = jax.lax.while_loop(
        cond, body, (T_WCs, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    return T


@partial(jax.jit, static_argnames=("cfg",))
def gauss_newton_points(T_WCs, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q,
                        edge_mask, n_kf, cfg: BAConfig):
    """Global GN on 3D point-difference residuals (spec:
    gauss_newton_points_cuda, gn_kernels.cu:725-811)."""
    K_cap = T_WCs.shape[0]
    pre = _edge_prep(Xs, Cs, ii, jj, idx_ii2jj, valid_match,
                     stride=cfg.point_stride)

    def body(state):
        T, it, done = state
        H, g = _edge_terms_points(T, Xs, Cs, ii, jj, idx_ii2jj, valid_match,
                                  Q, edge_mask, cfg, pre=pre)
        dx, free = _assemble_and_solve(H, g, ii, jj, n_kf, K_cap, cfg.pin,
                                       cfg.solver)
        T_new = sim3.retr(T, dx)
        T = jnp.where(free[:, None], T_new, T)
        delta_norm = jnp.linalg.norm(jnp.where(free[:, None], dx, 0.0))
        return T, it + 1, delta_norm < cfg.delta_norm

    def cond(state):
        _, it, done = state
        return (~done) & (it < cfg.max_iters)

    T, _, _ = jax.lax.while_loop(
        cond, body, (T_WCs, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    return T


@partial(jax.jit, static_argnames=("cfg", "img_size"))
def gauss_newton_calib(T_WCs, Xs, Cs, K_mat, ii, jj, idx_ii2jj, valid_match,
                       Q, edge_mask, n_kf, img_size, cfg: BAConfig):
    """Global GN on pixel+log-depth residuals (spec: gauss_newton_calib_cuda).

    ``Xs`` must already be constrained to calibrated rays
    (geometry.constrain_points_to_ray), as in global_opt.py:168-170.
    """
    K_cap = T_WCs.shape[0]
    pre = _edge_prep(Xs, Cs, ii, jj, idx_ii2jj, valid_match,
                     stride=cfg.point_stride)

    def body(state):
        T, it, done = state
        H, g = _edge_terms_calib(T, Xs, Cs, K_mat, ii, jj, idx_ii2jj,
                                 valid_match, Q, edge_mask, img_size, cfg,
                                 pre=pre)
        dx, free = _assemble_and_solve(H, g, ii, jj, n_kf, K_cap, cfg.pin,
                                       cfg.solver)
        T_new = sim3.retr(T, dx)
        T = jnp.where(free[:, None], T_new, T)
        delta_norm = jnp.linalg.norm(jnp.where(free[:, None], dx, 0.0))
        return T, it + 1, delta_norm < cfg.delta_norm

    def cond(state):
        _, it, done = state
        return (~done) & (it < cfg.max_iters)

    T, _, _ = jax.lax.while_loop(
        cond, body, (T_WCs, jnp.asarray(0, jnp.int32), jnp.asarray(False))
    )
    return T
