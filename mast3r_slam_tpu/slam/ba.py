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


def _gather_points(Xs, Cs, ii, idx):
    """Xi[e, p] = Xs[ii[e], idx[e, p]] as one flat take (E, P, 3)/(E, P)."""
    K, P, _ = Xs.shape
    flat_idx = ii[:, None] * P + idx
    Xi = jnp.take(Xs.reshape(K * P, 3), flat_idx, axis=0)
    Ci = jnp.take(Cs.reshape(K * P), flat_idx, axis=0)
    return Xi, Ci


def _edge_terms(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                cfg: BAConfig, residual_fn, n_rows: int):
    """Shared per-edge Hessian/gradient driver.

    Scans point chunks; per chunk ``residual_fn(Tij, Xj_c, Xi_c, safe_idx)``
    returns (err (E, C, r), J_theta (E, C, r, 7) w.r.t. the relative-pose
    perturbation, sqrt_w_rows (E, C, r) per-row 1/sigma weights, extra_valid
    (E, C)). The driver applies the confidence gates, the inverse-adjoint
    map to per-pose Jacobians (gn_kernels.cu apply_Sim3_adj_inv) and the
    Huber IRLS weights, and contracts to (E, 14, 14) blocks + (E, 14)
    gradients with MXU matmuls.
    """
    E, P = idx.shape
    Ti = T_WCs[ii]
    Tj = T_WCs[jj]
    Tij = sim3.rel(Ti, Tj)
    Cj_all = Cs[jj]
    Xj_all = Xs[jj]

    C = min(cfg.point_chunk, P)
    n_chunks = -(-P // C)
    pad = n_chunks * C - P

    def pad_pts(x, fill=0):
        if pad == 0:
            return x
        cfgpad = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, cfgpad, constant_values=fill)

    idx_p = pad_pts(idx).reshape(E, n_chunks, C)
    vm_p = pad_pts(valid_match).reshape(E, n_chunks, C)
    Q_p = pad_pts(Q).reshape(E, n_chunks, C)
    Xj_p = pad_pts(Xj_all).reshape(E, n_chunks, C, 3)
    Cj_p = pad_pts(Cj_all).reshape(E, n_chunks, C)

    def chunk(carry, inputs):
        H_acc, g_acc = carry
        idx_c, vm_c, Q_c, Xj_c, Cj_c = inputs
        safe_idx = jnp.where(vm_c, idx_c, 0)
        Xi_c, Ci_c = _gather_points(Xs, Cs, ii, safe_idx)

        err, J_theta, sqrt_w_rows, extra_valid = residual_fn(
            Tij, Xj_c, Xi_c, safe_idx)

        Jj = sim3.apply_adj_inv_T(Ti[:, None, None, :], J_theta)
        J = jnp.concatenate([-Jj, Jj], axis=-1)          # (E, C, r, 14)

        valid = (
            vm_c
            & (Q_c > cfg.Q_conf)
            & (Ci_c > cfg.C_conf)
            & (Cj_c > cfg.C_conf)
            & extra_valid
        )
        sqrt_w = jnp.where(valid[..., None],
                           sqrt_w_rows * jnp.sqrt(Q_c)[..., None], 0.0)
        w = robust.huber(sqrt_w * err) * sqrt_w * sqrt_w
        w = w * edge_mask[:, None, None]

        wJ = (w[..., None] * J).reshape(E, C * n_rows, 14)
        Jf = J.reshape(E, C * n_rows, 14)
        H_acc = H_acc + jnp.einsum(
            "eck,ecl->ekl", wJ, Jf, preferred_element_type=jnp.float32
        )
        g_acc = g_acc + jnp.einsum(
            "ecr,ecr,ecrk->ek", w, err, J, preferred_element_type=jnp.float32
        )
        return (H_acc, g_acc), None

    init = (jnp.zeros((E, 14, 14)), jnp.zeros((E, 14)))
    inputs = (
        idx_p.transpose(1, 0, 2),
        vm_p.transpose(1, 0, 2),
        Q_p.transpose(1, 0, 2),
        Xj_p.transpose(1, 0, 2, 3),
        Cj_p.transpose(1, 0, 2),
    )
    (H, g), _ = jax.lax.scan(chunk, init, inputs)
    return H, g


def _edge_terms_rays(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                     cfg: BAConfig):
    """Ray+dist residual (spec: ray_align_kernel). H layout: rows/cols
    0:7 = pose i, 7:14 = pose j."""
    sigma = jnp.array([1.0 / cfg.sigma_ray] * 3 + [1.0 / cfg.sigma_dist])

    def residual(Tij, Xj_c, Xi_c, safe_idx):
        rd_i = geometry.point_to_ray_dist(Xi_c)
        Xj_Ci = geometry.act_Sim3(Tij[:, None, :], Xj_c)
        rd_j = geometry.point_to_ray_dist(Xj_Ci)
        err = rd_j - rd_i
        J_theta = geometry.ray_dist_pose_jacobian(Xj_Ci)
        ones = jnp.ones(Xj_c.shape[:-1], bool)
        return err, J_theta, sigma, ones

    return _edge_terms(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                       cfg, residual, n_rows=4)


def _edge_terms_points(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                       cfg: BAConfig):
    """3D point-difference residual (spec: point_align_kernel,
    gn_kernels.cu:455-723 — exported by the reference backend though unused
    by its driver)."""
    sigma = jnp.full((3,), 1.0 / cfg.sigma_point)

    def residual(Tij, Xj_c, Xi_c, safe_idx):
        Xj_Ci = geometry.act_Sim3(Tij[:, None, :], Xj_c)
        err = Xj_Ci - Xi_c
        I = jnp.broadcast_to(jnp.eye(3), Xj_Ci.shape[:-1] + (3, 3))
        J_theta = jnp.concatenate(
            [I, -sim3.skew(Xj_Ci), Xj_Ci[..., :, None]], axis=-1)
        ones = jnp.ones(Xj_c.shape[:-1], bool)
        return err, J_theta, sigma, ones

    return _edge_terms(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                       cfg, residual, n_rows=3)


def _edge_terms_calib(T_WCs, Xs, Cs, K_mat, ii, jj, idx, valid_match, Q,
                      edge_mask, img_size, cfg: BAConfig):
    """Pixel + log-depth residual (spec: calib_proj_kernel)."""
    h, w = img_size
    sigma = jnp.array([1.0 / cfg.sigma_pixel] * 2 + [1.0 / cfg.sigma_depth])

    def residual(Tij, Xj_c, Xi_c, safe_idx):
        u_t = (safe_idx % w).astype(Xj_c.dtype)
        v_t = (safe_idx // w).astype(Xj_c.dtype)
        Xj_Ci = geometry.act_Sim3(Tij[:, None, :], Xj_c)
        pz, valid_proj = geometry.project_calib(
            Xj_Ci, K_mat, img_size, border=cfg.pixel_border,
            z_eps=cfg.depth_eps,
        )
        zi = Xi_c[..., 2]
        valid_zi = zi > cfg.depth_eps
        log_zi = jnp.where(valid_zi,
                           jnp.log(jnp.where(valid_zi, zi, 1.0)), 0.0)
        err = pz - jnp.stack([u_t, v_t, log_zi], axis=-1)
        J_theta = geometry.calib_pose_jacobian(Xj_Ci, K_mat,
                                               z_eps=cfg.depth_eps)
        return err, J_theta, sigma, valid_proj[..., 0] & valid_zi

    return _edge_terms(T_WCs, Xs, Cs, ii, jj, idx, valid_match, Q, edge_mask,
                       cfg, residual, n_rows=3)


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


def _solve(Hd, gd, n_kf, K_cap, pin):
    """Equilibrated fp32 Cholesky solve of the assembled system.

    Identity diagonals for pinned/inactive rows (spec: num_fix handling in
    gn_kernels.cu:1157); Eigen-failure fallback dx = 0 (cu:147-149).
    """
    D = 7
    kf_ids = jnp.arange(K_cap)
    free = (kf_ids >= pin) & (kf_ids < n_kf)
    free_rows = jnp.repeat(free, D)
    Hd = Hd + jnp.diag(jnp.where(free_rows, 0.0, 1.0))
    gd = jnp.where(free_rows, gd, 0.0)

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


def _assemble_and_solve(H_edges, g_edges, ii, jj, n_kf, K_cap, pin):
    Hd, gd = _assemble(H_edges, g_edges, ii, jj, n_kf, K_cap, pin)
    return _solve(Hd, gd, n_kf, K_cap, pin)


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

    def body(state):
        T, it, done = state
        H, g = _edge_terms_rays(T, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q,
                                edge_mask, cfg)
        dx, free = _assemble_and_solve(H, g, ii, jj, n_kf, K_cap, cfg.pin)
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

    def body(state):
        T, it, done = state
        H, g = _edge_terms_points(T, Xs, Cs, ii, jj, idx_ii2jj, valid_match,
                                  Q, edge_mask, cfg)
        dx, free = _assemble_and_solve(H, g, ii, jj, n_kf, K_cap, cfg.pin)
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

    def body(state):
        T, it, done = state
        H, g = _edge_terms_calib(T, Xs, Cs, K_mat, ii, jj, idx_ii2jj,
                                 valid_match, Q, edge_mask, img_size, cfg)
        dx, free = _assemble_and_solve(H, g, ii, jj, n_kf, K_cap, cfg.pin)
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
