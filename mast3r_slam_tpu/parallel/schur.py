"""Schur-complement distributed global bundle adjustment.

The plain distributed solver (dist_ba.py) all-reduces the full dense
(7K)^2 normal-equation system every GN iteration and factors it
redundantly on every device. This module implements the scalable
alternative from the design brief (BASELINE.json north star; no reference
counterpart — the reference's Eigen solve at gn_kernels.cu:57-159 is
single-CPU): a domain-decomposition Schur reduction of the keyframe-pose
system.

Keyframes are partitioned into contiguous blocks, one per device.
Keyframes touched by a cross-block edge (loop closures, block-boundary
consecutive edges) form the global *separator* S; the rest are block
*interiors* I_p. Because an interior keyframe's edges are all owned by
its block, the interior rows of the Hessian are fully local, and the
exact block elimination

    S_red = H_SS - sum_p H_SI_p H_II_p^{-1} H_IS_p
    dx_S  = S_red^{-1} (g_S - sum_p H_SI_p H_II_p^{-1} g_I_p)
    dx_Ip = H_II_p^{-1} (g_I_p - H_IS_p dx_S)

needs only a psum of the (7*S)^2 reduced separator system per iteration
(plus a 7K-float psum to re-replicate the interior updates) instead of
the (7K)^2 dense system — and each device factors only its own
(7*K/P)^2 interior block plus the small separator system, instead of the
full (7K)^2 Cholesky. Exact (up to fp and ridge placement): same normal
equations as slam.ba._solve.

Partitioning is host-side numpy (edges change only when the backend adds
keyframes; the reference's backend likewise rebuilds edge lists on the
host, global_opt.py:89-96).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..lie import sim3
from ..slam import ba


class SchurPartition(NamedTuple):
    """Host-built keyframe partition. Arrays are over keyframe ids.

    owner[k]     — device/block owning keyframe k (contiguous blocks).
    int_slot[k]  — interior slot of k within its owner block (-1 if k is
                   a separator keyframe).
    sep_slot[k]  — separator slot of k (-1 if interior).
    I_cap, S_cap — static block-interior / separator capacities.
    """

    owner: np.ndarray
    int_slot: np.ndarray
    sep_slot: np.ndarray
    I_cap: int
    S_cap: int


def _greedy_owner(ii, jj, em, K_cap: int, n_shards: int, B: int):
    """Connectivity-aware block assignment (VERDICT r4 directive #6).

    The contiguous split assigns keyframes by id, so EVERY loop-closure
    edge (which connects temporally distant ids) is cut and both its
    endpoints become separators — on loop-heavy graphs the Schur
    reduction then eliminates almost nothing (``separator_dominated``).
    SLAM loop closures connect *intervals* of the trajectory (a revisit),
    so the right blocks pair the revisited segment with its partner:

      1. union-find over active keyframes; merge LOOP edges first (they
         are the expensive cuts), then chain edges in id order, always
         capped at block capacity ``B`` — this grows temporally
         contiguous runs fused with their loop partners;
      2. first-fit-decreasing bin packing of the clusters into
         ``n_shards`` blocks of capacity ``B`` (a cluster that fits
         nowhere is split across the emptiest bins — its members just
         become separators, no worse than the contiguous split);
      3. inactive / untouched ids fill remaining capacity in id order.
    """
    parent = np.arange(K_cap)

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    size = np.ones(K_cap, np.int64)

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra == rb or size[ra] + size[rb] > B:
            return
        if size[ra] < size[rb]:
            ra, rb = rb, ra
        parent[rb] = ra
        size[ra] += size[rb]

    ai, aj = ii[em], jj[em]
    dist = np.abs(ai.astype(np.int64) - aj.astype(np.int64))
    loops = dist > 1
    # loop edges: widest span first (the strongest "pair these intervals"
    # signal); dedup (i<j) to keep the pass cheap
    for a, b in sorted({(min(a, b), max(a, b))
                        for a, b in zip(ai[loops], aj[loops])},
                       key=lambda p: p[0] - p[1]):
        union(a, b)
    for a, b in sorted({(min(a, b), max(a, b))
                        for a, b in zip(ai[~loops], aj[~loops])}):
        union(a, b)

    touched = np.zeros(K_cap, bool)
    touched[ai] = True
    touched[aj] = True
    clusters = {}
    for k in np.nonzero(touched)[0]:
        clusters.setdefault(find(k), []).append(int(k))

    owner = np.full(K_cap, -1, np.int32)
    load = np.zeros(n_shards, np.int64)
    for members in sorted(clusters.values(), key=len, reverse=True):
        p = int(np.argmin(load))
        if load[p] + len(members) <= B:
            owner[members] = p
            load[p] += len(members)
        else:   # split across emptiest bins (members become separators)
            for k in members:
                p = int(np.argmin(load))
                owner[k] = p
                load[p] += 1
    # untouched ids (inactive rows, isolated keyframes) fill remaining
    # capacity in id order — keeps every block within I_cap
    for k in np.nonzero(owner < 0)[0]:
        p = int(np.argmin(load))
        owner[k] = p
        load[p] += 1
    return owner


def schur_partition(ii, jj, edge_mask, K_cap: int, n_shards: int,
                    sep_bucket: int = 8, method: str = "greedy"):
    """Partition keyframes and compute an edge permutation so device p's
    contiguous edge chunk contains exactly the edges its block owns.

    An edge is owned by the block of its ``ii`` endpoint; a cross-block
    edge has both endpoints marked separator, so every local edge touches
    only local interiors and separators. Returns ``(part, order, keep)``:
    apply them to the (possibly large) edge payloads with
    ``reorder_edges`` — the permutation itself needs only the small
    host-side ii/jj/mask arrays. The permuted edge count is
    ``n_shards * E_loc`` with E_loc the largest per-block edge count;
    ``keep`` is False on pad slots. ``S_cap`` is rounded up to
    ``sep_bucket`` to bound recompiles as the separator grows.

    ``method``: "greedy" (default) = connectivity-aware blocks that keep
    loop-closure pairs together (``_greedy_owner``); "contiguous" = the
    id-range split (separator-heavy under loop closures; kept for
    comparison and as the zero-edge degenerate case).
    """
    ii = np.asarray(ii)
    jj = np.asarray(jj)
    em = np.asarray(edge_mask).astype(bool)

    I_cap = -(-K_cap // n_shards)
    if method == "greedy" and em.any():
        owner = _greedy_owner(ii, jj, em, K_cap, n_shards, I_cap)
    else:
        owner = np.minimum(np.arange(K_cap) // I_cap, n_shards - 1).astype(
            np.int32)

    cross = em & (owner[ii] != owner[jj])
    is_sep = np.zeros(K_cap, bool)
    is_sep[ii[cross]] = True
    is_sep[jj[cross]] = True

    sep_ids = np.nonzero(is_sep)[0]
    S_cap = min(K_cap,
                max(sep_bucket, sep_bucket * -(-len(sep_ids) // sep_bucket)))
    sep_slot = np.full(K_cap, -1, np.int32)
    sep_slot[sep_ids] = np.arange(len(sep_ids), dtype=np.int32)
    int_slot = np.full(K_cap, -1, np.int32)
    for p in range(n_shards):
        blk = np.nonzero((owner == p) & ~is_sep)[0]
        int_slot[blk] = np.arange(len(blk), dtype=np.int32)

    edge_owner = owner[ii]
    counts = np.bincount(edge_owner[em], minlength=n_shards)
    # bucket the per-shard chunk to the next power of two: the solver is
    # compiled per edge-array shape, so raw max-counts would trigger a
    # recompile on nearly every new edge
    E_loc = max(8, int(counts.max()))
    E_loc = 1 << (E_loc - 1).bit_length()
    order = np.zeros(n_shards * E_loc, dtype=np.int32)   # pad -> edge 0
    keep = np.zeros(n_shards * E_loc, dtype=bool)
    for p in range(n_shards):
        mine = np.nonzero(em & (edge_owner == p))[0]
        order[p * E_loc:p * E_loc + len(mine)] = mine
        keep[p * E_loc:p * E_loc + len(mine)] = True

    part = SchurPartition(owner=owner, int_slot=int_slot, sep_slot=sep_slot,
                          I_cap=int(I_cap), S_cap=int(S_cap))
    return part, order, keep


def separator_dominated(part: SchurPartition, n_active: int,
                        frac: float = 0.5) -> bool:
    """True when >= ``frac`` of the active keyframes are separators.

    In that regime the Schur reduction eliminates almost nothing: the
    separator system is ~the full system, but the per-shard interior
    elimination overhead is still paid (e.g. a short chain spread over
    many shards, where every block boundary makes both endpoints
    separators). Callers should fall back to the edge-sharded dense
    solver (dist_ba), which psums the full 7K system directly.
    """
    n_active = int(n_active)
    if n_active <= 0:
        return False
    n_sep = int((np.asarray(part.sep_slot[:n_active]) >= 0).sum())
    return n_sep >= frac * n_active


def reorder_edges(order, keep, ii, jj, idx, valid_match, Q, edge_mask):
    """Apply a schur_partition edge permutation to the edge payloads
    on-device (the (E, P) match arrays are too large to round-trip to
    host). Pad slots get edge_mask zero."""
    take = lambda a: jnp.take(jnp.asarray(a), jnp.asarray(order), axis=0)
    mask_r = take(edge_mask) * jnp.asarray(keep, take(edge_mask).dtype)
    return (take(ii), take(jj), take(idx), take(valid_match), take(Q),
            mask_r)


def _chol(Hs):
    return jax.scipy.linalg.cho_factor(Hs, lower=True)


def _equilibrate(Hd, gd, free_rows):
    """Identity rows for unused slots + Jacobi scaling (mirrors
    slam.ba._solve so the Schur path matches the dense path's
    conditioning)."""
    Hd = Hd + jnp.diag(jnp.where(free_rows, 0.0, 1.0))
    gd = jnp.where(free_rows, gd, 0.0)
    d = jnp.sqrt(jnp.maximum(jnp.diag(Hd), 1e-12))
    d_inv = 1.0 / d
    Hs = Hd * d_inv[:, None] * d_inv[None, :]
    Hs = Hs + 1e-8 * jnp.eye(Hd.shape[0])
    return Hs, gd, d_inv


def gauss_newton_rays_schur(T_WCs, Xs, Cs, owner, int_slot, sep_slot,
                            ii, jj, idx_ii2jj, valid_match, Q, edge_mask,
                            n_kf, I_cap: int, S_cap: int, mesh: Mesh,
                            cfg: ba.BAConfig, axis: str = "edge"):
    """Ray/dist variant of ``gauss_newton_schur``."""
    return gauss_newton_schur(
        T_WCs, Xs, Cs, None, owner, int_slot, sep_slot, ii, jj, idx_ii2jj,
        valid_match, Q, edge_mask, n_kf, I_cap=I_cap, S_cap=S_cap, mesh=mesh,
        cfg=cfg, axis=axis, residual="rays")


def gauss_newton_calib_schur(T_WCs, Xs, Cs, K_mat, owner, int_slot, sep_slot,
                             ii, jj, idx_ii2jj, valid_match, Q, edge_mask,
                             n_kf, I_cap: int, S_cap: int, img_size,
                             mesh: Mesh, cfg: ba.BAConfig,
                             axis: str = "edge"):
    """Pixel+log-depth variant of ``gauss_newton_schur`` (Xs must already
    be ray-constrained, as for slam.ba.gauss_newton_calib)."""
    return gauss_newton_schur(
        T_WCs, Xs, Cs, K_mat, owner, int_slot, sep_slot, ii, jj, idx_ii2jj,
        valid_match, Q, edge_mask, n_kf, I_cap=I_cap, S_cap=S_cap, mesh=mesh,
        cfg=cfg, axis=axis, residual="calib", img_size=img_size)


@partial(jax.jit,
         static_argnames=("I_cap", "S_cap", "cfg", "mesh", "axis",
                          "residual", "img_size"))
def gauss_newton_schur(T_WCs, Xs, Cs, K_mat, owner, int_slot, sep_slot,
                       ii, jj, idx_ii2jj, valid_match, Q, edge_mask,
                       n_kf, I_cap: int, S_cap: int, mesh: Mesh,
                       cfg: ba.BAConfig, axis: str = "edge",
                       residual: str = "rays", img_size=None):
    """Global GN with per-block Schur elimination.

    Same contract as the slam.ba solvers over edge arrays reordered by
    ``schur_partition`` (device p's chunk = its block's edges). Xs/Cs
    replicated; per-iteration communication is one psum of the
    (7*S_cap)^2 reduced system + one 7K psum of interior updates.
    ``residual``: "rays", "calib" (needs K_mat + img_size) or "points".
    """
    if residual == "rays":
        terms = lambda T, ii_l, jj_l, idx_l, vm_l, Q_l, mask_l, pre: \
            ba._edge_terms_rays(T, None, None, ii_l, jj_l, idx_l, vm_l,
                                Q_l, mask_l, cfg, pre=pre)
    elif residual == "calib":
        terms = lambda T, ii_l, jj_l, idx_l, vm_l, Q_l, mask_l, pre: \
            ba._edge_terms_calib(T, None, None, K_mat, ii_l, jj_l, idx_l,
                                 vm_l, Q_l, mask_l, img_size, cfg, pre=pre)
    elif residual == "points":
        terms = lambda T, ii_l, jj_l, idx_l, vm_l, Q_l, mask_l, pre: \
            ba._edge_terms_points(T, None, None, ii_l, jj_l, idx_l, vm_l,
                                  Q_l, mask_l, cfg, pre=pre)
    else:
        raise ValueError(f"unknown residual {residual!r}")
    K_cap = T_WCs.shape[0]
    D = 7
    nI, nS = D * I_cap, D * S_cap
    SENT = I_cap + S_cap                     # sentinel block row

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    def run(T0, ii_l, jj_l, idx_l, vm_l, Q_l, mask_l):
        p = jax.lax.axis_index(axis)
        pre = ba._edge_prep(Xs, Cs, ii_l, jj_l, idx_l, vm_l,
                            stride=cfg.point_stride)
        safe_idx_l = pre[4]

        kf_ids = jnp.arange(K_cap)
        kf_act = (kf_ids >= cfg.pin) & (kf_ids < n_kf)

        # endpoint -> local block row: interiors first, then separators
        def slot(k):
            act = (k >= cfg.pin) & (k < n_kf)
            s = jnp.where(sep_slot[k] >= 0, I_cap + sep_slot[k], int_slot[k])
            local = (sep_slot[k] >= 0) | (owner[k] == p)
            return jnp.where(act & local & (s >= 0), s, SENT)

        si, sj = slot(ii_l), slot(jj_l)

        # used-slot masks (identity diagonals for the rest)
        mine = (owner == p) & (sep_slot < 0) & kf_act & (int_slot >= 0)
        used_I = jnp.zeros(I_cap + 1, bool).at[
            jnp.where(mine, int_slot, I_cap)].set(True)[:I_cap]
        free_I = jnp.repeat(used_I, D)
        used_S = jnp.zeros(S_cap + 1, bool).at[
            jnp.where((sep_slot >= 0) & kf_act, sep_slot, S_cap)
        ].set(True)[:S_cap]
        free_S = jnp.repeat(used_S, D)

        def solve(H, g):
            # local [I|S] x [I|S] block assembly (cf. ba._assemble)
            L = I_cap + S_cap
            Hb = jnp.zeros((L + 1, L + 1, D, D))
            Hb = Hb.at[si, si].add(H[:, 0:7, 0:7])
            Hb = Hb.at[si, sj].add(H[:, 0:7, 7:14])
            Hb = Hb.at[sj, si].add(H[:, 7:14, 0:7])
            Hb = Hb.at[sj, sj].add(H[:, 7:14, 7:14])
            gb = jnp.zeros((L + 1, D))
            gb = gb.at[si].add(g[:, 0:7])
            gb = gb.at[sj].add(g[:, 7:14])
            Hd = Hb[:L, :L].transpose(0, 2, 1, 3).reshape(L * D, L * D)
            gd = gb[:L].reshape(L * D)

            H_II, H_IS = Hd[:nI, :nI], Hd[:nI, nI:]
            H_SS, g_I, g_S = Hd[nI:, nI:], gd[:nI], gd[nI:]

            # local interior factor (interior rows are complete locally)
            Hs_II, g_I, dIinv = _equilibrate(H_II, g_I, free_I)
            LII = _chol(Hs_II)
            B = H_IS * dIinv[:, None]                    # D^-1/2 H_IS
            W = jax.scipy.linalg.cho_solve(LII, B)
            gt = jax.scipy.linalg.cho_solve(LII, g_I * dIinv)
            S_red = H_SS - B.T @ W
            g_red = g_S - B.T @ gt

            # reduced separator system: the only O(S^2) communication
            S_red = jax.lax.psum(S_red, axis)
            g_red = jax.lax.psum(g_red, axis)
            Hs_S, g_red, dSinv = _equilibrate(S_red, g_red, free_S)
            LSS = _chol(Hs_S)
            x_S = dSinv * jax.scipy.linalg.cho_solve(LSS, g_red * dSinv)

            # local back-substitution
            x_I = dIinv * jax.scipy.linalg.cho_solve(
                LII, dIinv * (g_I - H_IS @ x_S))

            ok = jnp.all(jnp.isfinite(x_I)) & jnp.all(jnp.isfinite(x_S))
            x_I = jnp.where(ok, x_I, 0.0)
            x_S = jnp.where(ok, x_S, 0.0)

            # scatter to global (K_cap, 7); interiors are disjoint by shard
            xIb = x_I.reshape(I_cap, D)
            xSb = x_S.reshape(S_cap, D)
            dx_int = jnp.where(mine[:, None],
                               xIb[jnp.clip(int_slot, 0)], 0.0)
            dx_int = jax.lax.psum(dx_int, axis)
            dx_sep = jnp.where(((sep_slot >= 0) & kf_act)[:, None],
                               xSb[jnp.clip(sep_slot, 0)], 0.0)
            return -(dx_int + dx_sep), kf_act

        def body(state):
            T, it, done = state
            H, g = terms(T, ii_l, jj_l, safe_idx_l, vm_l, Q_l, mask_l, pre)
            dx, free = solve(H, g)
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
