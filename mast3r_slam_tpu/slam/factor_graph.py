"""Keyframe factor graph: edge proposal, gating and global-GN dispatch.

TPU-native re-design of /root/reference/mast3r_slam/global_opt.py. The
reference grows torch tensors per edge (global_opt.py:89-96) and calls CUDA
solvers; here edges live in capacity-padded device buffers (so the BA
kernels compile once) and candidate edges are decoded **batched** through
the two-view model (mast3r.inference_symmetric) instead of the reference's
per-edge python loop (mast3r_utils.py:83-115).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import geometry
from ..models import mast3r
from ..ops import dense_matcher, matching
from . import ba, frame
from .frame import KeyframeStore


class FactorGraphConfig(NamedTuple):
    edge_capacity: int = 256    # INITIAL buffer size; buffers double on
                                # demand (reference edges grow unboundedly,
                                # global_opt.py:89-96)
    max_edge_capacity: int = 0  # hard cap (0 = unbounded). When hit, new
                                # edges are DROPPED and counted in
                                # FactorGraph.edges_dropped
    edge_bucket_floor: int = 8  # smallest padded edge count a BA solve
                                # compiles for; raise to bound the number
                                # of compiled (E, K) shape buckets (each
                                # bucket is a fresh — slow — compile on a
                                # remote-compile backend; DEVELOPMENT.md)
    kf_bucket_floor: int = 8    # same for the keyframe-count axis
    pad_edge_batch: bool = True  # pad candidate-edge batches in add_factors
                                # to power-of-2 buckets so the symmetric
                                # decode+match program compiles per bucket,
                                # not per candidate count
    Q_conf: float = 1.5
    min_match_frac: float = 0.1
    matcher: str = "iter_proj"  # "iter_proj" (reference parity) or "dense"
                                # (TPU-native coarse-to-fine correlation;
                                # more robust without a warm start, ~2x
                                # faster per edge)
    ba_backend: str = "dense"   # "dense" (single device), "edge_sharded"
                                # (parallel/dist_ba.py) or "schur"
                                # (parallel/schur.py); the latter two need
                                # a mesh passed to FactorGraph and cover
                                # both the ray and calib solvers


@partial(jax.jit, static_argnames=("cfg", "mcfg", "ds", "matcher",
                                   "model_mod", "query_stride"))
def _match_edges_symmetric(params, cfg, mcfg, feat_i, pos_i, feat_j, pos_j,
                           ds: int = 1, matcher: str = "iter_proj",
                           model_mod=mast3r, query_stride: int = 1):
    """Decode + match both directions of a batch of candidate edges.

    Returns per-edge match arrays mirroring mast3r_match_symmetric
    (mast3r_utils.py:142-180): idx_i2j, idx_j2i (b, P) int32; valid_match_j,
    valid_match_i (b, P, 1); Qii/Qjj/Qji/Qij (b, P).
    """
    out = model_mod.inference_symmetric(params, feat_i, pos_i, feat_j,
                                        pos_j, cfg)
    if ds > 1:
        out = {k: mast3r.downsample_maps(v, ds=ds)[0] for k, v in out.items()}
    b = feat_i.shape[0]
    X11 = jnp.concatenate([out["Xii"], out["Xjj"]], axis=0)
    X21 = jnp.concatenate([out["Xji"], out["Xij"]], axis=0)
    D11 = jnp.concatenate([out["Dii"], out["Djj"]], axis=0)
    D21 = jnp.concatenate([out["Dji"], out["Dij"]], axis=0)
    if matcher == "dense":
        idx, valid = dense_matcher.match_dense(
            X11, X21, D11, D21, dist_thresh=mcfg.dist_thresh,
            fine_radius=mcfg.radius,
            # the preset's dilation budget IS the fine-search depth
            # (tpu_fast: 1 level — 340 -> 213 ms at the b=8 edge batch,
            # probe_dense_stages --variants; oracle-ATE-gated). Respected
            # as configured; presets pairing the dense edge matcher with
            # deep dilation pay the corresponding unfold-build cost.
            fine_dilation=max(int(mcfg.dilation_max), 1),
            lambda_init=mcfg.lambda_init,
            convergence_thresh=mcfg.convergence_thresh,
            # match only the points BA will read (point_stride columns);
            # FactorGraph validates divisibility and passes 1 otherwise
            query_stride=query_stride)
    else:
        kw = mcfg._asdict()
        kw["subpixel"] = False   # BA gathers by index (reference semantics)
        # edge matches are COLD-started (no warm-start index): keep the
        # reference's full LM budget even when the tracking preset trims
        # max_iter for warm-started frames (e.g. tpu_fast max_iter=1)
        kw["max_iter"] = max(int(kw["max_iter"]), 10)
        idx, valid = matching.match(X11, X21, D11, D21, **kw)
    hw = X11.shape[1] * X11.shape[2]
    flat = lambda a: a.reshape(b, hw)
    return {
        "idx_i2j": idx[:b],
        "idx_j2i": idx[b:],
        "valid_match_j": valid[:b],
        "valid_match_i": valid[b:],
        "Qii": flat(out["Qii"]),
        "Qjj": flat(out["Qjj"]),
        "Qji": flat(out["Qji"]),
        "Qij": flat(out["Qij"]),
    }


@jax.jit
def _gate_edges(m, Q_conf, query_stride=1):
    """Paired desc-confidences + bidirectional match fractions in ONE
    dispatch (global_opt.py:55-77 math). The eager formulation cost ~6
    relay round-trips per keyframe (~40 ms dispatch floor each,
    DEVELOPMENT.md quirk 5) — the backend step is dispatch-floor-bound
    through the tunnel, not device-bound (round-3 e2e finding).

    With query-strided edge matching only every qs-th point CAN be valid;
    the fractions are normalized to the matched subset so the
    min_match_frac thresholds keep their reference meaning."""
    Qj = jnp.sqrt(
        jnp.take_along_axis(m["Qii"], m["idx_i2j"], axis=1) * m["Qji"])
    Qi = jnp.sqrt(
        jnp.take_along_axis(m["Qjj"], m["idx_j2i"], axis=1) * m["Qij"])
    valid_j = m["valid_match_j"][..., 0] & (Qj > Q_conf)
    valid_i = m["valid_match_i"][..., 0] & (Qi > Q_conf)
    return (Qj, Qi, valid_j.mean(axis=1) * query_stride,
            valid_i.mean(axis=1) * query_stride)


def _add_factors_body(ii_buf, jj_buf, idx_buf, vm_buf, Q_buf,
                       params, feat, pos, ii_arr, jj_arr, valid_b, consec,
                       e0, min_match_frac, strict, Q_conf,
                       cfg, mcfg, ds, matcher, model_mod,
                       query_stride: int = 1):
    """The WHOLE add_factors pipeline in ONE dispatch: pair-feature gather
    -> symmetric decode -> match -> confidence gate -> masked two-way
    append, with the keep decision taken ON DEVICE.

    Replaces the 4-dispatch + mid-pipeline-readback formulation (gather /
    decode+match / gate readback / append): the host needed the match
    fractions only to pick scatter rows, which a cumsum computes in-program
    — the single frac readback now happens AFTER the append is queued, so
    the backend step costs one program dispatch and one sync. Also fixes
    the per-keep-count append recompiles (ADVICE r3): the scatter is fixed
    (2*bucket)-shaped, masked rows routed out of bounds (dropped by XLA's
    scatter OOB semantics — also what clamps at a hard max_edge_capacity).

    Spec: global_opt.py:30-110 (gating math, two-way append order).
    """
    feat_i = jnp.take(feat, ii_arr, axis=0)
    feat_j = jnp.take(feat, jj_arr, axis=0)
    pos_i = jnp.take(pos, ii_arr, axis=0)
    pos_j = jnp.take(pos, jj_arr, axis=0)
    m = _match_edges_symmetric(params, cfg, mcfg, feat_i, pos_i, feat_j,
                               pos_j, ds, matcher, model_mod, query_stride)
    Qj, Qi, frac_j, frac_i = _gate_edges(m, Q_conf, query_stride)

    invalid = jnp.minimum(frac_j, frac_i) < min_match_frac
    invalid = invalid & ~consec & valid_b
    abort = strict & invalid.any()
    keep = valid_b & ~invalid & ~abort                 # (b,)

    b, P = m["idx_i2j"].shape
    E_cap = ii_buf.shape[0]
    kprefix = jnp.cumsum(keep) - keep                  # rank among kept
    rows_fwd = e0 + 2 * kprefix.astype(jnp.int32)
    # masked rows -> E_cap (out of bounds, dropped); capacity overflow rows
    # land out of bounds naturally
    rows_fwd = jnp.where(keep, rows_fwd, E_cap)
    rows = jnp.stack([rows_fwd, rows_fwd + 1], 1).reshape(2 * b)

    def pairs(a, bwd):
        return jnp.stack([a, bwd], axis=1).reshape(2 * b, *a.shape[1:])

    vmj = m["valid_match_j"][..., 0]
    vmi = m["valid_match_i"][..., 0]
    # post-append edge count, ON DEVICE (the deferred-readback backend
    # path feeds this straight into the next solve's edge mask without a
    # host round-trip; mirrors the host's fits-clamp arithmetic)
    fits = jnp.maximum((E_cap - e0) // 2, 0)
    n_new = e0 + 2 * jnp.minimum(keep.sum(), fits).astype(jnp.int32)
    return (ii_buf.at[rows].set(pairs(ii_arr, jj_arr), mode="drop"),
            jj_buf.at[rows].set(pairs(jj_arr, ii_arr), mode="drop"),
            idx_buf.at[rows].set(pairs(m["idx_i2j"], m["idx_j2i"]),
                                 mode="drop"),
            vm_buf.at[rows].set(pairs(vmj, vmi), mode="drop"),
            Q_buf.at[rows].set(pairs(Qj, Qi), mode="drop"),
            jnp.stack([frac_j, frac_i]),
            n_new)


# donated (in-place) variant for single-threaded runs; a copying variant
# for the concurrent backend-thread mode — donation would delete edge
# buffers still referenced by viewer/exporter snapshots taken on another
# thread (the KeyframeStore makes the same donate-iff-single-thread choice,
# frame.py; cf. the reference's RLock'd shared tensors)
_AF_STATIC = ("cfg", "mcfg", "ds", "matcher", "model_mod", "query_stride")
_add_factors_fused = partial(
    jax.jit, static_argnames=_AF_STATIC,
    donate_argnums=frame.donate_argnums(0, 1, 2, 3, 4))(_add_factors_body)
_add_factors_fused_copy = partial(
    jax.jit, static_argnames=_AF_STATIC)(_add_factors_body)


def _add_tracked_edge_body(ii_buf, jj_buf, idx_buf, vm_buf, Q_buf,
                            i, j, idx_j_per_i, valid_i, Q_i, e0):
    """Append the two-way consecutive edge (i, j) from an EXISTING
    frame->keyframe tracker match — no decode, no matching.

    ``idx_j_per_i``: (P,) int32, for each pixel of keyframe i's grid the
    matched pixel in keyframe j's grid (the tracker's idx_f2k at the moment
    frame j was promoted). Edge row (ii=j, jj=i) consumes it directly (the
    BA gathers Xs[ii] at idx per jj-pixel, ba.py _gather_points); row
    (ii=i, jj=j) gets the scatter-inverse (deterministic: the smallest
    i-pixel wins a collision). The reference decides every edge with a
    fresh symmetric decode (mast3r_utils.py:142-180) — for the consecutive
    pair the frontend already computed an equivalent correspondence set,
    so this re-derivation is redundant device work; the deviation is
    oracle-ATE-gated (tests/test_e2e_oracle.py) and opt-in per preset
    (local_opt.reuse_consec_edge). Consecutive edges are exempt from the
    min_match_frac gate (global_opt.py:72-74 consec exemption), so the
    append is unconditional and needs NO readback at all.
    """
    P = idx_j_per_i.shape[0]
    E_cap = ii_buf.shape[0]
    ar = jnp.arange(P, dtype=jnp.int32)
    src = jnp.where(valid_i, idx_j_per_i, P)         # invalid -> dropped
    inv = jnp.full((P,), P, jnp.int32).at[src].min(ar, mode="drop")
    valid_inv = inv < P
    inv_safe = jnp.where(valid_inv, inv, 0)
    Q_inv = jnp.where(valid_inv, jnp.take(Q_i, inv_safe), 0.0)

    # the PAIR is atomic: if both rows don't fit, neither is written and
    # the count stays put (mirrors the host gate's drop-both arithmetic —
    # a half-written pair at odd capacity would desync host/device counts)
    fits = (e0 + 2) <= E_cap
    rows = jnp.where(fits, jnp.stack([e0, e0 + 1]), E_cap)  # OOB -> drop
    return (ii_buf.at[rows].set(jnp.stack([j, i]), mode="drop"),
            jj_buf.at[rows].set(jnp.stack([i, j]), mode="drop"),
            idx_buf.at[rows].set(jnp.stack([idx_j_per_i, inv_safe]),
                                 mode="drop"),
            vm_buf.at[rows].set(jnp.stack([valid_i, valid_inv]),
                                mode="drop"),
            Q_buf.at[rows].set(jnp.stack([Q_i, Q_inv]), mode="drop"),
            jnp.where(fits, e0 + 2, e0))


_add_tracked_edge_fused = jax.jit(
    _add_tracked_edge_body,
    donate_argnums=frame.donate_argnums(0, 1, 2, 3, 4))
_add_tracked_edge_fused_copy = jax.jit(_add_tracked_edge_body)


class MatchingConfig(NamedTuple):
    max_iter: int = 10
    lambda_init: float = 1e-8
    convergence_thresh: float = 1e-6
    dist_thresh: float = 0.1
    radius: int = 3
    dilation_max: int = 5
    subpixel: bool = False   # float-position correspondences (beyond the
                             # reference's integer matching; tracker
                             # interpolates the pointmap at the match)
    coarse_iter: int = 0     # > 0: pyramidal LM — coarse_iter iterations on
                             # a stride-2 query subgrid before max_iter
                             # full-resolution iterations (4x fewer gathers
                             # in the coarse stage; see ops.matching.match)
    separable_refine: bool = False   # axis-by-axis window search: 2 row
                             # gathers per point per level instead of 2r+1
                             # (approximate; ops.window_gather)
    refine_dtype: str = "bfloat16"   # descriptor dtype inside the window
                             # search: "int8" halves the gathered row bytes
                             # at a small accuracy cost (oracle rel-ATE
                             # +4-5%; sweep in DEVELOPMENT.md)


class FactorGraph:
    """Host-side edge bookkeeping over device buffers.

    Edge arrays are (E_cap, ...) with ``n_edges`` active; ``add_factors``
    mirrors global_opt.py:30-99 (bidirectional match-fraction gating,
    consecutive-edge exemption, strict reloc mode).
    """

    def __init__(self, params, model_cfg, keyframes: KeyframeStore,
                 cfg: FactorGraphConfig, ba_cfg: ba.BAConfig,
                 mcfg: MatchingConfig, K=None, downsample: int = 1,
                 model_module=mast3r, mesh=None, device=None,
                 donate: bool = True):
        # ``device``: commit the edge buffers (and everything the graph's
        # programs consume — params and keyframe fields must already live
        # there; see parallel/backend_device.py) to a dedicated backend
        # device, so decode+match+BA execute off the frontend chip
        self.device = device
        # donated in-place edge-buffer updates are only safe when nothing
        # else can hold references to the buffers (single-controller mode);
        # the concurrent backend-thread mode copies instead
        self._af_fused = (_add_factors_fused if donate
                          else _add_factors_fused_copy)
        self._ate_fused = (_add_tracked_edge_fused if donate
                           else _add_tracked_edge_fused_copy)
        self.mesh = mesh
        self.downsample = downsample
        self.model_mod = model_module
        self.params = params
        self.model_cfg = model_cfg
        self.frames = keyframes
        self.cfg = cfg
        self.ba_cfg = ba_cfg
        self.mcfg = mcfg
        self.K = K

        E, P = cfg.edge_capacity, keyframes.X.shape[1]
        # match only the points BA reads: at BAConfig.point_stride == s the
        # solvers consume idx/valid/Q[:, ::s] only (ba.py _edge_prep), and a
        # row-major flat stride is a column stride — so the dense edge
        # matcher can skip the other columns entirely. Valid only when the
        # strided query grid stays an even image (pyramid constraint).
        qs = int(getattr(ba_cfg, "point_stride", 1))
        w = keyframes.w
        self.query_stride = (
            qs if (cfg.matcher == "dense" and qs > 1 and w % qs == 0
                   and (w // qs) % 2 == 0 and keyframes.h % 2 == 0)
            else 1)
        self.capacity = E           # grows by doubling; see ensure_capacity
        self.edges_dropped = 0      # only ever non-zero with a hard
                                    # max_edge_capacity (metrics-visible —
                                    # no silent drops)
        self.n_edges = 0
        # deferred-gate machinery: the device keeps its own post-append
        # edge count (n_edges_dev) so the backend can dispatch
        # add_factors AND the following BA solve without reading the
        # match fractions back first; the host applies the same gate
        # arithmetic later (flush) to reconcile n_edges/edges_dropped.
        self.n_edges_dev = jnp.zeros((), jnp.int32)
        self.n_edges_ub = 0          # host upper bound (capacity/bucketing)
        self._pending: list = []     # deferred gate readbacks, FIFO
        # FG_STAGE_TIMERS=1: wall-clock each add_factors sub-stage with a
        # forced device sync (locates time INSIDE the backend whale —
        # VERDICT r3 weak #1: ~0.6 s/keyframe was unattributed)
        self._stage_t = ({} if os.environ.get("FG_STAGE_TIMERS") else None)
        put = ((lambda a: jax.device_put(a, device)) if device is not None
               else (lambda a: a))
        self.n_edges_dev = put(self.n_edges_dev)
        self.ii = put(jnp.zeros((E,), jnp.int32))
        self.jj = put(jnp.zeros((E,), jnp.int32))
        self.idx_ii2jj = put(jnp.zeros((E, P), jnp.int32))
        self.valid_match = put(jnp.zeros((E, P), bool))
        self.Q = put(jnp.zeros((E, P), jnp.float32))

    def ensure_capacity(self, n_edges: int) -> bool:
        """Grow the edge buffers (doubling) until they hold ``n_edges``.

        Returns False if a configured ``max_edge_capacity`` prevents it.
        Growth replaces the reference's unbounded torch.cat edge growth
        (global_opt.py:89-96); the BA solvers are bucketed (``_buckets``) so
        a grow only adds one compile per new power-of-two bucket actually
        reached.
        """
        mx = self.cfg.max_edge_capacity
        while self.capacity < n_edges:
            new_cap = self.capacity * 2
            if mx and new_cap > mx:
                return False
            grow = lambda a: jnp.concatenate(
                [a, jnp.zeros_like(a)], axis=0)
            self.ii = grow(self.ii)
            self.jj = grow(self.jj)
            self.idx_ii2jj = grow(self.idx_ii2jj)
            self.valid_match = grow(self.valid_match)
            self.Q = grow(self.Q)
            self.capacity = new_cap
        return True

    # -- edge construction ---------------------------------------------------

    def _mark(self, name, t0, sync_arr=None):
        """Stage-timer helper: device-sync then record elapsed; returns a
        fresh t0. No-op (zero dispatches) unless FG_STAGE_TIMERS=1."""
        if self._stage_t is None:
            return 0.0
        if sync_arr is not None:
            from ..utils.timing import device_sync

            device_sync(sync_arr)
        dt = time.perf_counter() - t0
        self._stage_t[name] = self._stage_t.get(name, 0.0) + dt
        print(f"FGSTAGE {name} {dt:.3f}s", flush=True)
        return time.perf_counter()

    def add_factors(self, ii, jj, min_match_frac, is_reloc=False,
                    defer=False):
        """Propose edges (i, j); returns True if any edge was accepted.

        One device dispatch (``_add_factors_fused``) + one small frac
        readback. Capacity is pre-grown for the worst case (all candidates
        kept) BEFORE the dispatch — the keep count only exists on device;
        at a hard ``max_edge_capacity`` the program clamps by dropping
        out-of-bounds scatter rows and the host mirrors that arithmetic
        for the ``edges_dropped`` counter.

        ``defer=True`` (global-opt path): skip the readback entirely —
        the program's on-device ``n_edges_dev`` feeds the next solve's
        edge mask directly, and the frac readback is queued for a later
        ``flush()`` (host bookkeeping lags by <= one backend step).
        Returns True meaning "dispatched" in that mode. Relocalization
        always runs synchronously (its caller branches on the result).
        """
        if not ii:
            return False
        if is_reloc:
            defer = False
        if not defer:
            self.flush()
        t0 = time.perf_counter() if self._stage_t is not None else 0.0
        nb = len(ii)
        ii_arr = np.asarray(ii, dtype=np.int32)
        jj_arr = np.asarray(jj, dtype=np.int32)
        if self.cfg.pad_edge_batch:
            # pad the candidate batch to a power-of-2 bucket (repeat the
            # last pair; masked by valid_b) so the decode+match program
            # compiles once per bucket instead of once per count
            bb = 1
            while bb < nb:
                bb *= 2
            if bb > nb:
                ii_arr = np.concatenate(
                    [ii_arr, np.full(bb - nb, ii_arr[-1], np.int32)])
                jj_arr = np.concatenate(
                    [jj_arr, np.full(bb - nb, jj_arr[-1], np.int32)])
        bb = ii_arr.shape[0]
        valid_b = np.arange(bb) < nb
        consec = (ii_arr == jj_arr - 1) & valid_b

        # worst case over everything in flight; False = capped, the
        # program clamps via OOB drops
        self.ensure_capacity(self.n_edges_ub + 2 * nb)
        (self.ii, self.jj, self.idx_ii2jj, self.valid_match, self.Q,
         fracs, self.n_edges_dev) = self._af_fused(
            self.ii, self.jj, self.idx_ii2jj, self.valid_match, self.Q,
            self.params, self.frames.feat, self.frames.pos,
            jnp.asarray(ii_arr), jnp.asarray(jj_arr),
            jnp.asarray(valid_b), jnp.asarray(consec),
            self.n_edges_dev,
            jnp.asarray(min_match_frac, jnp.float32),
            jnp.asarray(bool(is_reloc)),
            jnp.asarray(self.cfg.Q_conf, jnp.float32),
            self.model_cfg, self.mcfg, self.downsample, self.cfg.matcher,
            self.model_mod, self.query_stride)
        t0 = self._mark("af.dispatch", t0)

        rec = (fracs, nb, consec[:nb].copy(), float(min_match_frac),
               self.capacity, bool(is_reloc))
        if defer:
            self._pending.append(rec)
            self.n_edges_ub = min(self.n_edges_ub + 2 * nb, self.capacity)
            return True
        ok = self._apply_gate(rec)
        t0 = self._mark("af.readback", t0)
        self.n_edges_ub = self.n_edges
        return ok

    def add_tracked_edge(self, i, j, idx_j_per_i, valid, Q):
        """Append the consecutive edge (i, j) from the tracker's existing
        match (see _add_tracked_edge_fused). Dispatch-only: consecutive
        edges are gate-exempt, so the host count advances without any
        readback; the record still rides the FIFO so deferred gates from
        earlier add_factors dispatches reconcile in order."""
        self.ensure_capacity(self.n_edges_ub + 2)
        if self.device is not None:   # tracker match arrives from the
            idx_j_per_i = jax.device_put(idx_j_per_i, self.device)
            valid = jax.device_put(valid, self.device)   # frontend chip
            Q = jax.device_put(Q, self.device)
        t0 = time.perf_counter() if self._stage_t is not None else 0.0
        (self.ii, self.jj, self.idx_ii2jj, self.valid_match, self.Q,
         self.n_edges_dev) = self._ate_fused(
            self.ii, self.jj, self.idx_ii2jj, self.valid_match, self.Q,
            jnp.asarray(i, jnp.int32), jnp.asarray(j, jnp.int32),
            idx_j_per_i,
            valid if valid.dtype == jnp.bool_ else valid.astype(bool),
            Q.astype(jnp.float32), self.n_edges_dev)
        self._mark("af.tracked_edge", t0)
        rec = ("fixed", self.capacity)
        if self._pending:
            self._pending.append(rec)
        else:
            self._apply_gate(rec)
        self.n_edges_ub = min(self.n_edges_ub + 2, self.capacity)
        return True

    def _apply_gate(self, rec):
        """Host mirror of the device gate (identical f32 arithmetic) —
        reconciles n_edges / edges_dropped with the rows the program
        wrote. Applied in dispatch order (FIFO)."""
        if rec[0] == "fixed":       # unconditional pair (add_tracked_edge)
            cap_at_dispatch = rec[1]
            if cap_at_dispatch - self.n_edges < 2:
                self.edges_dropped += 2
                print("FactorGraph: max_edge_capacity reached; dropping "
                      f"a tracked consecutive edge (total dropped "
                      f"{self.edges_dropped})")
                return False
            self.n_edges += 2
            return True
        fracs, nb, consec, min_match_frac, cap_at_dispatch, is_reloc = rec
        fr = np.asarray(fracs)              # the ONE sync of the pipeline
        frac_j, frac_i = fr[0, :nb], fr[1, :nb]
        invalid = np.minimum(frac_j, frac_i) < np.float32(min_match_frac)
        invalid = (~consec) & invalid
        if invalid.any() and is_reloc:
            return False
        keep = int((~invalid).sum())
        if keep == 0:
            return False
        fits = max((cap_at_dispatch - self.n_edges) // 2, 0)
        if keep > fits:
            # mirrors the device's out-of-bounds row drops exactly
            self.edges_dropped += 2 * (keep - fits)
            print("FactorGraph: max_edge_capacity "
                  f"{self.cfg.max_edge_capacity} reached; dropping "
                  f"{2 * (keep - fits)} edges "
                  f"(total dropped {self.edges_dropped})")
            keep = fits
            if keep == 0:
                return False
        self.n_edges += 2 * keep
        return True

    def flush(self):
        """Apply all deferred edge-gate readbacks (host bookkeeping catches
        up with the device edge count)."""
        while self._pending:
            self._apply_gate(self._pending.pop(0))
        self.n_edges_ub = self.n_edges

    def _append_edge(self, i, j, idx, valid, Q):
        e = self.n_edges
        assert e < self.capacity, "edge buffer full"
        # donated (in-place when safe) row writes: eager .at[].set would copy
        # the whole (E_cap, P) buffers per append
        sr = self.frames._set_row
        self.ii = sr(self.ii, e, jnp.asarray(i, jnp.int32))
        self.jj = sr(self.jj, e, jnp.asarray(j, jnp.int32))
        self.idx_ii2jj = sr(self.idx_ii2jj, e, idx)
        self.valid_match = sr(self.valid_match, e, valid)
        self.Q = sr(self.Q, e, Q)
        self.n_edges = e + 1
        # keep the device count in lockstep (the dense solve path masks
        # by n_edges_dev; see add_factors defer docs)
        self.n_edges_dev = jnp.asarray(self.n_edges, jnp.int32)
        self.n_edges_ub = self.n_edges

    @property
    def edge_mask(self):
        self.flush()
        return (jnp.arange(self.capacity) < self.n_edges).astype(
            jnp.float32
        )

    def unique_kf_idx(self):
        self.flush()
        e = self.n_edges
        return np.unique(np.concatenate([
            np.asarray(self.ii[:e]), np.asarray(self.jj[:e])
        ])) if e else np.array([], dtype=np.int64)

    # -- solvers -------------------------------------------------------------

    def _buckets(self):
        """Power-of-two capacity buckets for the active edge/keyframe counts.

        The BA kernels are compiled per (E, K) shape; padding the ACTIVE
        counts to the next power of two (instead of always running at full
        capacity) makes a typical small solve ~capacity/E_active times
        cheaper while compiling each bucket only once.
        """
        def bucket(n, cap, floor):
            b = floor
            while b < n:
                b *= 2
            return min(b, cap)

        Eb = bucket(max(self.n_edges, self.n_edges_ub), self.capacity,
                    self.cfg.edge_bucket_floor)
        Kb = bucket(len(self.frames), self.frames.capacity,
                    self.cfg.kf_bucket_floor)
        return Eb, Kb

    def _adopt_poses(self, T, Kb):
        self.frames.update_T_WCs(_merge_rows(self.frames.T_WC, T)
                                 if Kb < self.frames.capacity else T)

    def solve_GN_rays(self):
        if ((self.n_edges == 0 and self.n_edges_ub == 0)
                or len(self.frames) <= self.ba_cfg.pin):
            return
        backend = (self.cfg.ba_backend
                   if self.mesh is not None and self.mesh.size > 1
                   else "dense")
        if backend != "dense":
            self.flush()     # multi-device partitioning needs exact counts
            if self.n_edges == 0:
                return
        Eb, Kb = self._buckets()
        # with deferred add_factors in flight, the DEVICE edge count is
        # the authoritative one (no readback between decode and solve);
        # otherwise the host count is (covers tests/tools that assign
        # n_edges directly)
        mask = (_active_mask(self.n_edges_dev, Eb) if self._pending
                else self.edge_mask[:Eb])
        args = (self.frames.T_WC[:Kb], self.frames.X[:Kb],
                self.frames.average_confs()[:Kb],
                self.ii[:Eb], self.jj[:Eb], self.idx_ii2jj[:Eb],
                self.valid_match[:Eb], self.Q[:Eb], mask,
                jnp.asarray(len(self.frames)))
        if backend == "schur":
            from ..parallel import schur

            part, order, keep = schur.schur_partition(
                np.asarray(self.ii[:Eb]), np.asarray(self.jj[:Eb]),
                np.asarray(self.edge_mask[:Eb]), K_cap=Kb,
                n_shards=self.mesh.size)
            if schur.separator_dominated(part, len(self.frames)):
                backend = "edge_sharded"
        if backend == "schur":
            ii_r, jj_r, idx_r, vm_r, Q_r, mask_r = schur.reorder_edges(
                order, keep, *args[3:9])
            T = schur.gauss_newton_rays_schur(
                args[0], args[1], args[2], jnp.asarray(part.owner),
                jnp.asarray(part.int_slot), jnp.asarray(part.sep_slot),
                ii_r, jj_r, idx_r, vm_r, Q_r, mask_r, args[9],
                part.I_cap, part.S_cap, self.mesh, self.ba_cfg)
        elif backend == "edge_sharded":
            from ..parallel import dist_ba, mesh as mesh_mod

            nd = self.mesh.size
            pad = lambda a, fill=0: mesh_mod.pad_to_multiple(a, nd, 0, fill)
            T = dist_ba.gauss_newton_rays_dist(
                args[0], args[1], args[2], pad(args[3]), pad(args[4]),
                pad(args[5]), pad(args[6], False), pad(args[7]),
                pad(args[8]), args[9], self.mesh, self.ba_cfg)
        else:
            T = ba.gauss_newton_rays(*args, self.ba_cfg)
        self._adopt_poses(T, Kb)

    def solve_GN_calib(self):
        if ((self.n_edges == 0 and self.n_edges_ub == 0)
                or len(self.frames) <= self.ba_cfg.pin):
            return
        img_size = (self.frames.h, self.frames.w)
        backend = (self.cfg.ba_backend
                   if self.mesh is not None and self.mesh.size > 1
                   else "dense")
        if backend != "dense":
            self.flush()     # multi-device partitioning needs exact counts
            if self.n_edges == 0:
                return
        Eb, Kb = self._buckets()
        mask = (_active_mask(self.n_edges_dev, Eb) if self._pending
                else self.edge_mask[:Eb])
        Xs = constrain_all(self.frames.X[:Kb], self.K, img_size)
        args = (self.frames.T_WC[:Kb], Xs,
                self.frames.average_confs()[:Kb],
                self.ii[:Eb], self.jj[:Eb], self.idx_ii2jj[:Eb],
                self.valid_match[:Eb], self.Q[:Eb], mask,
                jnp.asarray(len(self.frames)))
        if backend == "schur":
            from ..parallel import schur

            part, order, keep = schur.schur_partition(
                np.asarray(self.ii[:Eb]), np.asarray(self.jj[:Eb]),
                np.asarray(self.edge_mask[:Eb]), K_cap=Kb,
                n_shards=self.mesh.size)
            if schur.separator_dominated(part, len(self.frames)):
                backend = "edge_sharded"
        if backend == "schur":
            ii_r, jj_r, idx_r, vm_r, Q_r, mask_r = schur.reorder_edges(
                order, keep, *args[3:9])
            T = schur.gauss_newton_calib_schur(
                args[0], args[1], args[2], self.K, jnp.asarray(part.owner),
                jnp.asarray(part.int_slot), jnp.asarray(part.sep_slot),
                ii_r, jj_r, idx_r, vm_r, Q_r, mask_r, args[9],
                part.I_cap, part.S_cap, img_size, self.mesh, self.ba_cfg)
        elif backend == "edge_sharded":
            from ..parallel import dist_ba, mesh as mesh_mod

            nd = self.mesh.size
            pad = lambda a, fill=0: mesh_mod.pad_to_multiple(a, nd, 0, fill)
            T = dist_ba.gauss_newton_calib_dist(
                args[0], args[1], args[2], self.K, pad(args[3]),
                pad(args[4]), pad(args[5]), pad(args[6], False),
                pad(args[7]), pad(args[8]), args[9], img_size, self.mesh,
                self.ba_cfg)
        else:
            T = ba.gauss_newton_calib(
                args[0], args[1], args[2], self.K, *args[3:], img_size,
                self.ba_cfg)
        self._adopt_poses(T, Kb)


@jax.jit
def _merge_rows(buf, rows):
    """Write the leading rows of ``buf`` (bucketed BA result adoption)."""
    return jax.lax.dynamic_update_slice_in_dim(buf, rows, 0, axis=0)


@partial(jax.jit, static_argnames=("Eb",))
def _active_mask(n_dev, Eb: int):
    """Edge mask from the DEVICE edge count (deferred-gate solve path)."""
    return (jnp.arange(Eb) < n_dev).astype(jnp.float32)


@partial(jax.jit, static_argnames=("img_size",))
def constrain_all(Xs, K, img_size):
    return jax.vmap(lambda X: geometry.constrain_points_to_ray(img_size, X, K))(Xs)
