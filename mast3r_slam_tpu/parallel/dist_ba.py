"""Distributed global bundle adjustment over a device mesh.

Scale-out design (no reference counterpart — the reference is single-GPU;
see SURVEY.md §5.7/§7.10): the edge set is sharded across devices, each
device accumulates the dense normal-equation contribution of its local
edges (the per-edge einsum of slam/ba.py), the partial 7Kx7K systems are
combined with one ``psum`` over ICI, and every device runs the (small)
Cholesky solve redundantly — cheaper than a distributed solve at K <= 512
and keeps poses replicated for the next iteration without an all-gather.

Communication per GN iteration: one all-reduce of (7K)^2 + 7K floats
(K = keyframe capacity), independent of edge count and points per edge —
the heavy O(E * h * w) Jacobian work is fully parallel.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..lie import sim3
from ..slam import ba


def _shard_axis_size(mesh: Mesh, axis: str):
    return mesh.shape[axis]


def shard_keyframe_store(mesh: Mesh, Xs, Cs, axis: str = "edge"):
    """Shard keyframe pointmaps/confidences over the mesh (map sharding).

    SURVEY.md §5.7: the scaling axis of this workload is the keyframe set —
    at capacity 512 the fp32 pointmaps alone are ~1.2 GB, so multi-host
    runs keep each host's HBM holding only its keyframe block. Poses stay
    replicated (tiny).
    """
    sh = NamedSharding(mesh, P(axis))
    return jax.device_put(Xs, sh), jax.device_put(Cs, sh)


def prep_edges_kf_sharded(mesh: Mesh, Xs_sh, Cs_sh, ii, jj, idx, valid_match,
                          axis: str = "edge", stride: int = 1):
    """Cross-shard endpoint gather: keyframe-sharded maps -> edge-sharded
    per-edge data (Xi, Ci, Xj, Cj, safe_idx).

    The match indices are loop-invariant, so the only communication a
    keyframe-sharded BA needs is this ONE resharding before the GN loop —
    GSPMD inserts the all-to-all; the solve itself then runs on local edge
    data with a single psum per iteration (gauss_newton_rays_dist_pre).
    """
    from ..slam import ba

    out_sh = NamedSharding(mesh, P(axis))
    f = jax.jit(partial(ba._edge_prep, stride=stride),
                out_shardings=(out_sh,) * 5)
    return f(Xs_sh, Cs_sh, ii, jj, idx, valid_match)


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis"))
def gauss_newton_rays_dist_pre(T_WCs, pre, ii, jj, valid_match, Q, edge_mask,
                               n_kf, mesh: Mesh, cfg: ba.BAConfig,
                               axis: str = "edge"):
    """Edge-sharded ray/dist GN over pre-gathered edge data.

    Companion to ``prep_edges_kf_sharded``: with the endpoint maps already
    routed edge-locally, every GN iteration is pure local compute + one
    psum of the assembled (7K)^2 system — no keyframe-store access at all,
    so the keyframe maps may live sharded (or on another host) entirely.
    """
    K_cap = T_WCs.shape[0]

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), jax.tree_util.tree_map(lambda _: P(axis), pre),
                  P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def run(T0, pre_l, ii_l, jj_l, vm_l, Q_l, mask_l):
        safe_idx_l = pre_l[4]

        def body(state):
            T, it, done = state
            H, g = ba._edge_terms_rays(T, None, None, ii_l, jj_l, safe_idx_l,
                                       vm_l, Q_l, mask_l, cfg, pre=pre_l)
            Hd, gd = ba._assemble(H, g, ii_l, jj_l, n_kf, K_cap, cfg.pin)
            Hd = jax.lax.psum(Hd, axis)
            gd = jax.lax.psum(gd, axis)
            dx, free = ba._solve(Hd, gd, n_kf, K_cap, cfg.pin)
            T_new = sim3.retr(T, dx)
            T = jnp.where(free[:, None], T_new, T)
            delta = jnp.linalg.norm(jnp.where(free[:, None], dx, 0.0))
            return T, it + 1, delta < cfg.delta_norm

        def cond(state):
            _, it, done = state
            return (~done) & (it < cfg.max_iters)

        T, _, _ = jax.lax.while_loop(
            cond, body, (T0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
        )
        return T

    return run(T_WCs, pre, ii, jj, valid_match, Q, edge_mask)


def gauss_newton_rays_dist(T_WCs, Xs, Cs, ii, jj, idx_ii2jj, valid_match, Q,
                           edge_mask, n_kf, mesh: Mesh, cfg: ba.BAConfig,
                           axis: str = "edge"):
    """Ray/dist variant of ``gauss_newton_dist``."""
    return gauss_newton_dist(T_WCs, Xs, Cs, None, ii, jj, idx_ii2jj,
                             valid_match, Q, edge_mask, n_kf, mesh=mesh,
                             cfg=cfg, axis=axis, residual="rays")


def gauss_newton_calib_dist(T_WCs, Xs, Cs, K_mat, ii, jj, idx_ii2jj,
                            valid_match, Q, edge_mask, n_kf, img_size,
                            mesh: Mesh, cfg: ba.BAConfig,
                            axis: str = "edge"):
    """Pixel+log-depth variant of ``gauss_newton_dist`` (Xs must already be
    ray-constrained, as for slam.ba.gauss_newton_calib)."""
    return gauss_newton_dist(T_WCs, Xs, Cs, K_mat, ii, jj, idx_ii2jj,
                             valid_match, Q, edge_mask, n_kf, mesh=mesh,
                             cfg=cfg, axis=axis, residual="calib",
                             img_size=img_size)


@partial(jax.jit, static_argnames=("cfg", "mesh", "axis", "residual",
                                   "img_size"))
def gauss_newton_dist(T_WCs, Xs, Cs, K_mat, ii, jj, idx_ii2jj, valid_match,
                      Q, edge_mask, n_kf, mesh: Mesh, cfg: ba.BAConfig,
                      axis: str = "edge", residual: str = "rays",
                      img_size=None):
    """Edge-sharded global GN. Same contract as the slam.ba solvers; edge
    arrays must have their leading dim divisible by the mesh size (pad
    with masked edges). ``residual``: "rays", "calib" (needs K_mat +
    img_size) or "points"."""
    K_cap = T_WCs.shape[0]

    if residual == "rays":
        terms = lambda *a, pre: ba._edge_terms_rays(*a, cfg, pre=pre)
    elif residual == "calib":
        terms = lambda T, Xs_, Cs_, *a, pre: ba._edge_terms_calib(
            T, Xs_, Cs_, K_mat, *a, img_size, cfg, pre=pre)
    elif residual == "points":
        terms = lambda *a, pre: ba._edge_terms_points(*a, cfg, pre=pre)
    else:
        raise ValueError(f"unknown residual {residual!r}")

    def local_iteration(T, ii_l, jj_l, idx_l, vm_l, Q_l, mask_l, pre):
        H, g = terms(T, Xs, Cs, ii_l, jj_l, idx_l, vm_l, Q_l,
                     mask_l, pre=pre)
        Hd, gd = ba._assemble(H, g, ii_l, jj_l, n_kf, K_cap, cfg.pin)
        Hd = jax.lax.psum(Hd, axis)
        gd = jax.lax.psum(gd, axis)
        dx, free = ba._solve(Hd, gd, n_kf, K_cap, cfg.pin)
        return dx, free

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def run(T0, ii_l, jj_l, idx_l, vm_l, Q_l, mask_l):
        # loop-invariant gathered points, hoisted out of the GN loop
        pre = ba._edge_prep(Xs, Cs, ii_l, jj_l, idx_l, vm_l,
                            stride=cfg.point_stride)

        def body(state):
            T, it, done = state
            dx, free = local_iteration(T, ii_l, jj_l, idx_l, vm_l, Q_l,
                                       mask_l, pre)
            T_new = sim3.retr(T, dx)
            T = jnp.where(free[:, None], T_new, T)
            delta = jnp.linalg.norm(jnp.where(free[:, None], dx, 0.0))
            return T, it + 1, delta < cfg.delta_norm

        def cond(state):
            _, it, done = state
            return (~done) & (it < cfg.max_iters)

        T, _, _ = jax.lax.while_loop(
            cond, body, (T0, jnp.asarray(0, jnp.int32), jnp.asarray(False))
        )
        return T

    return run(T_WCs, ii, jj, idx_ii2jj, valid_match, Q, edge_mask)
