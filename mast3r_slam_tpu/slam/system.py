"""SLAM system orchestration: frontend tracking, backend optimization, modes.

TPU-native re-design of the reference driver (/root/reference/main.py) and
FrameTracker (/root/reference/mast3r_slam/tracker.py:28-127). The reference
runs three processes over shared CUDA tensors; here a single controller
drives jit-compiled stages — frontend tracking and backend global
optimization interleave on the device queue (async dispatch gives the
overlap the reference got from processes), and ``single_thread`` semantics
(deterministic eval) are the default execution order.

The per-frame hot path is three compiled programs:
  1. ``encode``             (ViT-L, new frame only — keyframe feat cached)
  2. ``_track_match``       (dual decoder + heads + projective matcher)
  3. ``opt_pose_*_sim3``    (GN on the matched points)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import mast3r
from ..ops import matching
from . import ba, frame as frame_mod, tracker as tracker_mod
from .factor_graph import FactorGraph, FactorGraphConfig, MatchingConfig
from .frame import Frame, KeyframeStore, Mode, _get_row_jit
from .retrieval import RetrievalConfig, RetrievalDatabase


@partial(jax.jit, static_argnames=("cfg", "mcfg", "ds", "model_mod"))
def _track_match(params, cfg, mcfg, feat_f, pos_f, feat_k, pos_k, idx_init,
                 ds: int = 1, model_mod=mast3r):
    """Asymmetric two-view inference + frame->keyframe matching.

    Spec: mast3r_match_asymmetric (mast3r_utils.py:209-231); predictions are
    subsampled by ``ds`` before matching (img_downsample config). Returns
    flat (n, ...) arrays: idx_f2k, valid, Xff, Cff, Qff, Xkf, Ckf, Qkf.
    """
    X, C, D, Q = model_mod.inference_asymmetric(params, feat_f, pos_f,
                                                feat_k, pos_k, cfg)
    X, C, D, Q = mast3r.downsample_maps(X, C, D, Q, ds=ds)
    Xff, Xkf = X[0:1], X[1:2]
    Dff, Dkf = D[0:1], D[1:2]
    out = matching.match(Xff, Xkf, Dff, Dkf, idx_1_to_2_init=idx_init,
                         **mcfg._asdict())
    if mcfg.subpixel:
        idx, valid, p_sub = out
    else:
        idx, valid = out
        p_sub = matching.lin_to_pixel(idx, Xff.shape[2]).astype(Xff.dtype)
    hw = X.shape[1] * X.shape[2]
    flat = lambda a: a.reshape(hw, -1)
    return (idx[0], valid[0],
            flat(Xff), flat(C[0:1]), flat(Q[0:1]),
            flat(Xkf), flat(C[1:2]), flat(Q[1:2]), p_sub[0])


@jax.jit
def _track_gate(idx_f2k, valid_match_k, Qff, Qkf, Cf_avg, Ck_avg, C_conf,
                Q_conf):
    """Confidence gating + keyframe-decision statistics, fused on device.

    Returns (Qk (n,1), valid_opt (n,1), stats (3,)) where stats =
    [match_frac, match_frac_k, unique_frac] — one scalar transfer per frame
    instead of several eager reductions (tracker.py:59-110 semantics; the
    unique count is a scatter of ones instead of host-side np.unique).
    """
    Qff_at = Qff[idx_f2k, 0:1]
    Cf_at = Cf_avg[idx_f2k]
    return _track_gate_pre(idx_f2k, valid_match_k, Qff_at, Qkf, Cf_at,
                           Ck_avg, C_conf, Q_conf)


def _track_gate_pre(idx_f2k, valid_match_k, Qff_at, Qkf, Cf_at, Ck_avg,
                    C_conf, Q_conf):
    """Gate with the frame-side values already gathered at the match
    indices (the fused path folds that into one multi-column gather)."""
    n = idx_f2k.shape[0]
    Qk = jnp.sqrt(Qff_at * Qkf)
    valid_opt = (
        valid_match_k
        & (Cf_at > C_conf)
        & (Ck_avg > C_conf)
        & (Qk > Q_conf)
    )
    valid_kf = valid_match_k & (Qk > Q_conf)
    match_frac = valid_opt.mean()
    match_frac_k = valid_kf.mean()
    hit = jnp.zeros((n,), jnp.float32).at[
        jnp.where(valid_match_k[:, 0], idx_f2k, n)
    ].max(1.0, mode="drop")
    unique_frac = hit.sum() / n
    stats = jnp.stack([match_frac, match_frac_k, unique_frac])
    return Qk, valid_opt, stats


def _track_frame_body(params, cfg, mcfg, tcfg, feat_f, pos_f, feat_k, pos_k,
                      idx_init, kf_X, kf_C, kf_N, kf_N_updates, kf_score,
                      kf_T_WC, frame_T_WC, K, ds: int, fuse_mode: str,
                      score_fn: str, use_calib: bool, img_size,
                      model_mod=mast3r):
    """Whole tracking step as ONE compiled program.

    Inference + matching + gating + Sim(3) GN + masked pointmap fusion and
    pose update, with the skip/failure decisions returned as a 5-scalar
    vector — the host does a single dispatch and a single tiny readback per
    frame instead of one per stage (each call through a relayed backend
    costs ~30-40 ms; see DEVELOPMENT.md). Semantics match the step-by-step
    path (TrackerRunner.track); a fresh frame's canonical pointmap is its
    own prediction (first update_pointmap with N=0).
    """
    from .. import geometry
    from ..lie import sim3
    from .frame import fuse_pointmap

    # NOTE: folding the at-match gathers into the refine's window rows via
    # matching.match(payload=...) was measured SLOWER end-to-end (19.9 ->
    # 17.1 FPS): the narrow per-row gathers below are latency-cheap while
    # widening the refine rows 1200 -> 1700 B is not (DEVELOPMENT.md).
    (idx_f2k, valid_match_k, Xff, Cff, Qff, Xkf, Ckf, Qkf,
     p_sub) = _track_match(
        params, cfg, mcfg, feat_f, pos_f, feat_k, pos_k, idx_init, ds,
        model_mod)

    kf_Cavg = (kf_C / jnp.maximum(kf_N.astype(kf_C.dtype), 1.0))[:, None]

    Xf = Xff
    Xk = kf_X
    if use_calib:
        Xf = geometry.constrain_points_to_ray(img_size, Xf, K)
        Xk = geometry.constrain_points_to_ray(img_size, Xk, K)

    if mcfg.subpixel:
        # interpolate the frame pointmap at the float match positions
        # (removes the reference's half-pixel correspondence quantization);
        # img_size is already the working (post-downsample) resolution
        hh, ww = img_size
        Xf_img = Xf.reshape(1, hh, ww, 3)
        unf = matching._unfold_pairs(Xf_img)
        u = jnp.clip(p_sub[None, :, 0], 0.0, ww - 1.001)
        v = jnp.clip(p_sub[None, :, 1], 0.0, hh - 1.001)
        Xf_at = matching._bilinear_gather(unf, u, v, ww, hh, 3)[0]
        qc = jnp.take(jnp.concatenate([Qff, Cff], -1), idx_f2k, axis=0)
        Qff_at, Cf_at = qc[:, 0:1], qc[:, 1:2]
    else:
        # ONE multi-column gather at the match indices instead of three
        # (frame points + desc-conf + conf; gathers are priced per row)
        g = jnp.take(jnp.concatenate([Xf, Qff, Cff], -1), idx_f2k, axis=0)
        Xf_at, Qff_at, Cf_at = g[:, 0:3], g[:, 3:4], g[:, 4:5]

    Qk, valid_opt, stats3 = _track_gate_pre(
        idx_f2k, valid_match_k, Qff_at, Qkf, Cf_at, kf_Cavg,
        tcfg.C_conf, tcfg.Q_conf)

    T_init = sim3.rel(kf_T_WC, frame_T_WC)
    if not use_calib:
        res = tracker_mod.opt_pose_ray_dist_sim3(
            Xf_at, Xk, T_init, Qk, valid_opt, tcfg)
    else:
        meas_k, valid_meas_k = tracker_mod.calib_measurements(
            Xk, K, img_size, tcfg.depth_eps)
        res = tracker_mod.opt_pose_calib_sim3(
            Xf_at, Xk, T_init, Qk, valid_opt,
            meas_k, valid_meas_k, K, img_size, tcfg)

    skip = stats3[0] < tcfg.min_match_frac
    ok = (~skip) & (~res.failed)

    T_CkCf = res.T_CkCf
    T_WCf = jnp.where(ok, sim3.mul(kf_T_WC, T_CkCf), frame_T_WC)

    # keyframe pointmap fusion, masked by ok (tracker.py:98-101)
    Xkk = sim3.act(T_CkCf, Xkf)
    if fuse_mode == "best_score":
        Xn, Cn, Nn, score_n = fuse_pointmap(
            fuse_mode, kf_X, kf_C[:, None], kf_N, Xkk, Ckf, kf_score,
            score_fn)
    else:
        Xn, Cn, Nn = fuse_pointmap(fuse_mode, kf_X, kf_C[:, None], kf_N,
                                   Xkk, Ckf, n_updates=kf_N_updates)
        score_n = kf_score
    kf_X_new = jnp.where(ok, Xn, kf_X)
    kf_C_new = jnp.where(ok, Cn[:, 0], kf_C)
    kf_N_new = jnp.where(ok, Nn, kf_N)
    kf_NU_new = jnp.where(ok, kf_N_updates + 1, kf_N_updates)
    kf_score_new = jnp.where(ok, score_n, kf_score)

    # best_score state for the fresh frame (promoted on keyframing)
    if fuse_mode == "best_score":
        frame_score = (jnp.median(Cff) if score_fn == "median"
                       else jnp.mean(Cff))
    else:
        frame_score = jnp.zeros(())

    stats = jnp.stack([stats3[0], stats3[1], stats3[2],
                       skip.astype(jnp.float32),
                       res.failed.astype(jnp.float32)])
    return (idx_f2k, T_WCf, Xff, Cff, kf_X_new, kf_C_new, kf_N_new,
            kf_NU_new, kf_score_new, frame_score, stats,
            valid_match_k[:, 0], Qk[:, 0])


_track_frame_fused = partial(jax.jit, static_argnames=(
    "cfg", "mcfg", "tcfg", "ds", "fuse_mode", "score_fn", "use_calib",
    "img_size", "model_mod"))(_track_frame_body)


class WindowOut(NamedTuple):
    """Outputs of ``_track_window_fused`` (all device-resident; only
    ``hoststats`` is fetched to the host each window)."""

    hoststats: jnp.ndarray   # (W, 8): match_frac, match_frac_k, unique_frac,
    #                                   skip, failed, new_kf, frame_score,
    #                                   active
    T_WCf: jnp.ndarray       # (W, 8) per-frame world poses
    feats: jnp.ndarray       # (W, n_patch, d) encoder features
    poss: jnp.ndarray        # (W, n_patch, 2)
    Xff: jnp.ndarray         # (W, n, 3) per-frame canonical pointmaps
    Cff: jnp.ndarray         # (W, n, 1)
    idx_last: jnp.ndarray    # (n,) match-index warm start for the next window
    # per-frame tracker match vs its carry keyframe (consumed by the
    # consecutive-edge reuse path, local_opt.reuse_consec_edge):
    idxs: jnp.ndarray        # (W, n) int32: per-kf-pixel -> frame pixel
    valids: jnp.ndarray      # (W, n) bool matcher validity
    Qks: jnp.ndarray         # (W, n) paired desc confidence
    prev_T_WC: jnp.ndarray   # (8,) last active frame pose
    feat_last: jnp.ndarray   # (n_patch, d) last active frame's features
    pos_last: jnp.ndarray    # (n_patch, 2)
    # donated keyframe-store buffers (reassign on the host store):
    kX: jnp.ndarray
    kC: jnp.ndarray
    kN: jnp.ndarray
    kNU: jnp.ndarray
    kscore: jnp.ndarray
    kT: jnp.ndarray
    kfeat: jnp.ndarray
    kpos: jnp.ndarray
    kdix: jnp.ndarray


def _track_window_body(params, cfg, mcfg, tcfg, imgs, frame_ids, idx_init,
                       prev_T_WC, K, last_idx,
                       kX, kC, kN, kNU, kscore, kT, kfeat, kpos, kdix,
                       ds: int, fuse_mode: str, score_fn: str,
                       use_calib: bool, img_size, window: int,
                       model_mod=mast3r, capture_matches: bool = True):
    """Micro-batched streaming frontend: ``window`` frames in ONE dispatch.

    TPU-native beyond the reference (which steps frame-by-frame on the
    host, main.py:236-313): the W new frames are encoded as one batch, then
    tracked sequentially on device with the keyframe CARRIED through the
    unrolled chain — keyframe selection (tracker.py:104-110) happens on
    device, so a mid-window keyframe switch re-targets the remaining frames
    without host involvement, and the keyframe-store rows (outgoing fused
    state + freshly appended keyframes) are written in-place into the
    donated store buffers with masked ``mode="drop"`` scatters. The host
    reads back one tiny (W, 8) stats array per window.

    Failure semantics: at the first skipped/failed frame the chain HALTS —
    all later writes are masked and their ``active`` stat is 0; the host
    replays those frames through the per-frame path (which handles the
    RELOC transition). Identical trajectories to the per-frame path
    (equivalence-tested); only backend scheduling differs (global BA runs
    between windows instead of between frames).
    """
    W = window
    cap = kX.shape[0]
    n = img_size[0] * img_size[1]
    ident = jnp.arange(n, dtype=jnp.int32)

    feats_all, poss_all = model_mod.encode(params, imgs, cfg)

    row = lambda buf, i: jax.lax.dynamic_index_in_dim(buf, i, keepdims=False)
    cur = last_idx
    feat_k = row(kfeat, cur)[None].astype(feats_all.dtype)
    pos_k = row(kpos, cur)[None]
    kf_X, kf_C = row(kX, cur), row(kC, cur)
    kf_N, kf_NU = row(kN, cur), row(kNU, cur)
    kf_sc, kf_T = row(kscore, cur), row(kT, cur)
    idx = idx_init
    halted = jnp.asarray(False)
    feat_last = feats_all[0]
    pos_last = poss_all[0]

    o_stats, o_T, o_Xff, o_Cff = [], [], [], []
    o_idx, o_valid, o_Qk = [], [], []
    for t in range(W):
        feat_f = feats_all[t:t + 1]
        pos_f = poss_all[t:t + 1]
        (idx_f2k, T_WCf, Xff, Cff, kf_Xn, kf_Cn, kf_Nn, kf_NUn, kf_scn,
         frame_score, stats, vmk, Qk) = _track_frame_body(
            params, cfg, mcfg, tcfg, feat_f, pos_f, feat_k, pos_k,
            idx[None], kf_X, kf_C, kf_N, kf_NU, kf_sc, kf_T, prev_T_WC, K,
            ds, fuse_mode, score_fn, use_calib, img_size, model_mod)

        ok = (stats[3] < 0.5) & (stats[4] < 0.5)
        active = ~halted
        if tcfg.kf_every:   # fixed-cadence mode (bench/regression)
            want_kf = (frame_ids[t] % tcfg.kf_every) == 0
        else:
            want_kf = (jnp.minimum(stats[1], stats[2])
                       < tcfg.match_frac_thresh)
        new_kf = active & ok & want_kf

        # commit the frame's effect on the current keyframe (body already
        # gates the fusion by ok; gate the whole frame by active)
        sel = lambda a, b: jnp.where(active, a, b)
        kf_X, kf_C = sel(kf_Xn, kf_X), sel(kf_Cn, kf_C)
        kf_N, kf_NU = sel(kf_Nn, kf_N), sel(kf_NUn, kf_NU)
        kf_sc = sel(kf_scn, kf_sc)
        T_WCf = jnp.where(active & ok, T_WCf, prev_T_WC)

        # keyframe switch: flush the outgoing keyframe's fused state, then
        # append the fresh frame as the new keyframe (masked drop-scatters)
        drop = jnp.asarray(cap, jnp.int32)
        widx = jnp.where(new_kf, cur, drop)
        kX = kX.at[widx].set(kf_X, mode="drop")
        kC = kC.at[widx].set(kf_C, mode="drop")
        kN = kN.at[widx].set(kf_N, mode="drop")
        kNU = kNU.at[widx].set(kf_NU, mode="drop")
        kscore = kscore.at[widx].set(kf_sc, mode="drop")

        aidx = jnp.where(new_kf, cur + 1, drop)
        one_i = jnp.ones((), kN.dtype)
        kX = kX.at[aidx].set(Xff, mode="drop")
        kC = kC.at[aidx].set(Cff[:, 0], mode="drop")
        kN = kN.at[aidx].set(one_i, mode="drop")
        kNU = kNU.at[aidx].set(one_i, mode="drop")
        kscore = kscore.at[aidx].set(frame_score.astype(kscore.dtype),
                                     mode="drop")
        kT = kT.at[aidx].set(T_WCf, mode="drop")
        kfeat = kfeat.at[aidx].set(feat_f[0].astype(kfeat.dtype),
                                   mode="drop")
        kpos = kpos.at[aidx].set(pos_f[0], mode="drop")
        kdix = kdix.at[aidx].set(frame_ids[t], mode="drop")

        # carry switch to the new keyframe (feat round-trips through the
        # store dtype so the chain matches the per-frame path bit-for-bit)
        feat_store = feat_f.astype(kfeat.dtype).astype(feats_all.dtype)
        feat_k = jnp.where(new_kf, feat_store, feat_k)
        pos_k = jnp.where(new_kf, pos_f, pos_k)
        kf_X = jnp.where(new_kf, Xff, kf_X)
        kf_C = jnp.where(new_kf, Cff[:, 0], kf_C)
        kf_N = jnp.where(new_kf, one_i, kf_N)
        kf_NU = jnp.where(new_kf, one_i, kf_NU)
        kf_sc = jnp.where(new_kf, frame_score.astype(kf_sc.dtype), kf_sc)
        kf_T = jnp.where(new_kf, T_WCf, kf_T)
        cur = cur + new_kf.astype(cur.dtype)
        idx = jnp.where(active, jnp.where(new_kf, ident, idx_f2k), idx)
        prev_T_WC = jnp.where(active, T_WCf, prev_T_WC)
        feat_last = jnp.where(active, feats_all[t], feat_last)
        pos_last = jnp.where(active, poss_all[t], pos_last)
        halted = halted | (active & ~ok)

        o_stats.append(jnp.concatenate([
            stats, jnp.stack([new_kf.astype(jnp.float32),
                              frame_score.astype(jnp.float32),
                              active.astype(jnp.float32)])]))
        o_T.append(T_WCf)
        o_Xff.append(Xff)
        o_Cff.append(Cff)
        if capture_matches:   # consumed by the consecutive-edge reuse
            o_idx.append(idx_f2k)   # path only; dead outputs otherwise
            o_valid.append(vmk)
            o_Qk.append(Qk)

    # final flush of the current keyframe's carried state
    kX = kX.at[cur].set(kf_X)
    kC = kC.at[cur].set(kf_C)
    kN = kN.at[cur].set(kf_N)
    kNU = kNU.at[cur].set(kf_NU)
    kscore = kscore.at[cur].set(kf_sc)

    return WindowOut(
        hoststats=jnp.stack(o_stats), T_WCf=jnp.stack(o_T),
        feats=feats_all, poss=poss_all, Xff=jnp.stack(o_Xff),
        Cff=jnp.stack(o_Cff), idx_last=idx,
        idxs=(jnp.stack(o_idx) if capture_matches
              else jnp.zeros((0,), jnp.int32)),
        valids=(jnp.stack(o_valid) if capture_matches
                else jnp.zeros((0,), bool)),
        Qks=(jnp.stack(o_Qk) if capture_matches
             else jnp.zeros((0,), jnp.float32)), prev_T_WC=prev_T_WC,
        feat_last=feat_last, pos_last=pos_last,
        kX=kX, kC=kC, kN=kN, kNU=kNU, kscore=kscore, kT=kT, kfeat=kfeat,
        kpos=kpos, kdix=kdix)


_track_window_fused = partial(
    jax.jit,
    static_argnames=("cfg", "mcfg", "tcfg", "ds", "fuse_mode", "score_fn",
                     "use_calib", "img_size", "window", "model_mod",
                     "capture_matches"),
    donate_argnums=frame_mod.donate_argnums(
        10, 11, 12, 13, 14, 15, 16, 17, 18))(_track_window_body)


class TrackerRunner:
    """Frame-to-keyframe tracking driver (spec: FrameTracker, tracker.py)."""

    def __init__(self, params, model_cfg, keyframes: KeyframeStore,
                 tcfg: tracker_mod.TrackerConfig, mcfg: MatchingConfig,
                 filtering_mode: str = "weighted_pointmap",
                 filtering_score: str = "median", use_calib=False,
                 K=None):
        self.params = params
        self.model_cfg = model_cfg
        self.keyframes = keyframes
        self.tcfg = tcfg
        self.mcfg = mcfg
        self.filtering_mode = filtering_mode
        self.filtering_score = filtering_score
        self.use_calib = use_calib
        self.K = K
        self.downsample = 1
        self.fused = True
        self.model_mod = mast3r
        self.idx_f2k = None
        self.last_stats = {}
        # (idx_f2k, valid, Qk) of the most recently PROMOTED frame vs its
        # previous keyframe; consumed by SLAMSystem.process_frame for the
        # consecutive-edge reuse path (None on the reference-shaped
        # step path, which the backend then covers by decoding)
        self.last_match = None

    def reset_idx(self):
        self.idx_f2k = None

    def track(self, frame: Frame):
        """Track ``frame`` against the last keyframe.

        Returns (new_kf: bool, try_reloc: bool). Mirrors tracker.py:28-127.
        """
        if self.fused:
            return self._track_fused(frame)
        return self._track_steps(frame)

    def _track_fused(self, frame: Frame):
        """Single-dispatch tracking path (_track_frame_fused)."""
        kfs = self.keyframes
        last = jnp.asarray(len(kfs) - 1, jnp.int32)
        idx_init = self.idx_f2k
        K = self.K if self.K is not None else jnp.eye(3)
        row = _get_row_jit
        (idx_f2k, T_WCf, Xff, Cff, kf_X, kf_C, kf_N, kf_NU, kf_score,
         frame_score, stats, vmk, Qk) = _track_frame_fused(
            self.params, self.model_cfg, self.mcfg, self.tcfg,
            frame.feat[None], frame.pos[None],
            row(kfs.feat, last)[None], row(kfs.pos, last)[None],
            idx_init[None] if idx_init is not None else None,
            row(kfs.X, last), row(kfs.C, last), row(kfs.N, last),
            row(kfs.N_updates, last), row(kfs.score, last),
            row(kfs.T_WC, last), frame.T_WC, K,
            self.downsample, self.filtering_mode, self.filtering_score,
            self.use_calib, (kfs.h, kfs.w), self.model_mod)

        st = np.asarray(stats)  # the single per-frame device sync
        self.idx_f2k = idx_f2k
        self.last_stats = {"match_frac": float(st[0]),
                           "match_frac_k": float(st[1]),
                           "unique_frac": float(st[2])}
        frame.X_canon, frame.C, frame.N = Xff, Cff, 1
        frame.N_updates = 1
        if self.filtering_mode == "best_score":
            frame.score = frame_score

        if st[3] > 0.5:
            print(f"Skipped frame {frame.frame_id}")
            return False, True
        if st[4] > 0.5:
            print(f"Cholesky failed {frame.frame_id}")
            return False, True

        frame.T_WC = T_WCf
        sr = kfs._set_row
        kfs.X = sr(kfs.X, last, kf_X)
        kfs.C = sr(kfs.C, last, kf_C)
        kfs.N = sr(kfs.N, last, kf_N)
        kfs.N_updates = sr(kfs.N_updates, last, kf_NU)
        kfs.score = sr(kfs.score, last, kf_score)

        if self.tcfg.kf_every:
            new_kf = frame.frame_id % self.tcfg.kf_every == 0
        else:
            new_kf = min(st[1], st[2]) < self.tcfg.match_frac_thresh
        if new_kf:
            # the promoted frame's match vs its (previous) keyframe — the
            # consecutive-edge reuse path consumes it (backend_step)
            self.last_match = (idx_f2k, vmk, Qk)
            self.reset_idx()
        return bool(new_kf), False

    def _track_steps(self, frame: Frame):
        """Step-by-step tracking path (reference-shaped; debug/fallback)."""
        kf = self.keyframes.last_keyframe()
        cfg, tcfg = self.model_cfg, self.tcfg

        idx_init = self.idx_f2k
        (idx_f2k, valid_match_k, Xff, Cff, Qff, Xkf, Ckf, Qkf,
         _p_sub) = _track_match(
            self.params, cfg, self.mcfg, frame.feat[None], frame.pos[None],
            kf.feat[None], kf.pos[None],
            idx_init[None] if idx_init is not None else None,
            self.downsample, self.model_mod,
        )
        self.idx_f2k = idx_f2k

        frame.update_pointmap(Xff, Cff, self.filtering_mode,
                              self.filtering_score)

        Qk, valid_opt, stats = _track_gate(
            idx_f2k, valid_match_k, Qff, Qkf, frame.get_average_conf(),
            kf.get_average_conf(), tcfg.C_conf, tcfg.Q_conf)
        match_frac, match_frac_k, unique_frac = np.asarray(stats)
        self.last_stats = {"match_frac": float(match_frac),
                           "match_frac_k": float(match_frac_k),
                           "unique_frac": float(unique_frac)}

        if match_frac < tcfg.min_match_frac:
            print(f"Skipped frame {frame.frame_id}")
            return False, True

        Xf = frame.X_canon
        Xk = kf.X_canon
        img_size = (self.keyframes.h, self.keyframes.w)
        if self.use_calib:
            from .. import geometry

            Xf = geometry.constrain_points_to_ray(img_size, Xf, self.K)
            Xk = geometry.constrain_points_to_ray(img_size, Xk, self.K)

        T_CkCf_init = _rel_pose(kf.T_WC, frame.T_WC)

        if not self.use_calib:
            res = tracker_mod.opt_pose_ray_dist_sim3(
                Xf[idx_f2k], Xk, T_CkCf_init, Qk, valid_opt, tcfg)
        else:
            meas_k, valid_meas_k = tracker_mod.calib_measurements(
                Xk, self.K, img_size, tcfg.depth_eps)
            res = tracker_mod.opt_pose_calib_sim3(
                Xf[idx_f2k], Xk, T_CkCf_init, Qk, valid_opt, meas_k,
                valid_meas_k, self.K, img_size, tcfg)

        if bool(res.failed):
            print(f"Cholesky failed {frame.frame_id}")
            return False, True

        T_CkCf = res.T_CkCf
        frame.T_WC = _compose(kf.T_WC, T_CkCf)

        # map keyframe-frame points into keyframe coords and fuse
        Xkk = _act(T_CkCf, Xkf)
        kf.update_pointmap(Xkk, Ckf, self.filtering_mode,
                           self.filtering_score)
        self.keyframes.set_frame(len(self.keyframes) - 1, kf)

        # keyframe decision (tracker.py:104-110)
        if tcfg.kf_every:
            new_kf = frame.frame_id % tcfg.kf_every == 0
        else:
            new_kf = min(match_frac_k, unique_frac) < tcfg.match_frac_thresh
        if new_kf:
            self.last_match = None   # step path: backend decodes the edge
            self.reset_idx()
        return new_kf, False


@jax.jit
def _rel_pose(Ta, Tb):
    from ..lie import sim3

    return sim3.rel(Ta, Tb)


@jax.jit
def _compose(Ta, Tb):
    from ..lie import sim3

    return sim3.mul(Ta, Tb)


@jax.jit
def _act(T, X):
    from ..lie import sim3

    return sim3.act(T, X)


@partial(jax.jit, static_argnames=("cfg", "ds", "model_mod"))
def _mono_init(params, cfg, feat, pos, ds=1, model_mod=mast3r):
    return model_mod.inference_mono(params, feat, pos, cfg, ds)


class SLAMSystem:
    """Full SLAM pipeline with the reference's mode state machine
    (INIT -> TRACKING <-> RELOC -> TERMINATED; spec: main.py:236-313)."""

    def __init__(self, params, model_cfg, config: dict, img_shape,
                 retrieval_params=None, K=None,
                 keyframe_capacity=None, edge_capacity=None, metrics=None,
                 debug_checks: bool = False, model_module=mast3r,
                 mesh=None):
        from .. import config as config_mod

        h, w = img_shape
        self.full_img_shape = (h, w)
        self.downsample = int(config.get("dataset", {}).get("img_downsample",
                                                            1))
        ds = self.downsample
        if ds > 1:
            h, w = h // ds, w // ds
            if K is not None:
                K = K / ds * jnp.asarray([[1.0, 1, 1], [1, 1, 1],
                                          [ds, ds, ds]])
        rt = config.get("runtime", {})
        kf_cap = keyframe_capacity or int(rt.get("keyframe_capacity", 512))
        e_cap = edge_capacity or int(rt.get("edge_capacity", 1024))

        self.config = config
        self.model_cfg = model_cfg
        self.model_mod = model_module
        self.params = params
        self.use_calib = bool(config.get("use_calib", False))
        self.K = K

        self.single_thread = bool(config.get("single_thread", True))
        # micro-batched streaming frontend: frames per tracking dispatch
        # (1 = reference-shaped per-frame stepping)
        self.window = int(rt.get("tracking_window", 1))
        num_points = h * w
        num_patches = model_cfg.num_patches
        self.keyframes = KeyframeStore(
            kf_cap, num_points, num_patches, model_cfg.enc_embed_dim, (h, w),
            donate=self.single_thread)
        self.keyframes.K = K

        tcfg = config_mod.make_tracker_config(config)
        mcfg = config_mod.make_matching_config(config)
        ba_cfg = config_mod.make_ba_config(
            config, point_chunk=int(rt.get("point_chunk", 8192)))
        fg_cfg = config_mod.make_factor_graph_config(config, e_cap)

        self.tracker = TrackerRunner(
            params, model_cfg, self.keyframes, tcfg, mcfg,
            filtering_mode=config["tracking"]["filtering_mode"],
            filtering_score=config["tracking"].get("filtering_score",
                                                   "median"),
            use_calib=self.use_calib, K=K)
        self.tracker.downsample = ds
        self.tracker.model_mod = model_module
        # optional dedicated backend device (frontend/backend overlap on a
        # multi-chip host — parallel/backend_device.py; the reference gets
        # the same overlap from processes sharing one GPU, main.py:228)
        self._backend_mirror = None
        fg_params, fg_store, fg_device = params, self.keyframes, None
        bd_spec = rt.get("backend_device", "none")
        if bd_spec not in (None, "none", "None", 0, False, ""):
            from ..parallel import backend_device as bdev

            dev_b = bdev.pick_backend_device(bd_spec)
            if dev_b is not None:
                assert fg_cfg.ba_backend == "dense", (
                    "backend_device combines with the dense BA backend "
                    "only (the sharded backends already span the mesh)")
                fg_params = jax.device_put(params, dev_b)
                self._backend_mirror = bdev.BackendMirror(self.keyframes,
                                                          dev_b)
                fg_store, fg_device = self._backend_mirror, dev_b
        self.factor_graph = FactorGraph(fg_params, model_cfg, fg_store,
                                        fg_cfg, ba_cfg, mcfg, K=K,
                                        downsample=ds,
                                        model_module=model_module,
                                        mesh=mesh, device=fg_device,
                                        donate=self.single_thread)
        self.retrieval = (
            RetrievalDatabase(retrieval_params,
                              config_mod.make_retrieval_config(config))
            if retrieval_params else None
        )
        self.mode = Mode.INIT
        self.backend_queue: list = []
        # kf store idx -> device handles from retrieval.prefetch (see
        # backend_prefetch); transient, not checkpointed
        self._retrieval_prefetch: dict = {}
        # kf store idx -> (idx_f2k, valid, Qk) tracker match of the
        # promoted frame vs its previous keyframe: lets the backend build
        # the consecutive edge WITHOUT a symmetric decode + dense match
        # (local_opt.reuse_consec_edge; the decode+match is ~60% of the
        # backend's per-keyframe device time). Transient, not checkpointed
        # (a resumed run falls back to decoding those edges).
        self._reuse_consec = bool(config.get("local_opt", {})
                                  .get("reuse_consec_edge", False))
        self._consec_match: dict = {}
        import threading

        self.state_lock = threading.Lock()
        self.reloc_pending = False
        self.current_frame: Optional[Frame] = None
        # reloc_failed / frames_reloc make a relocalization storm (every
        # frame paying mono-init + retrieval + strict decode, forever)
        # visible in the stats/metrics stream instead of only on stderr —
        # the reference's failure path is print-only (main.py:62-66)
        self.stats = {"skipped": 0, "keyframes": 0, "loop_closures": 0,
                      "relocs": 0, "reloc_failed": 0, "reinits": 0,
                      "frames_tracking": 0, "frames_reloc": 0,
                      "frames_init": 0}
        self._reloc_fail_streak = 0
        # escape hatch (beyond the reference, which loops RELOC forever,
        # main.py:28-71): after N consecutive failed relocalization
        # attempts, re-initialize tracking from the current frame's mono
        # pointmap as a fresh keyframe. 0 = reference-faithful (never).
        self.reinit_after = int(config.get("reloc", {}).get("reinit_after",
                                                            0))
        self.metrics = metrics
        self.debug_checks = debug_checks

    # -- frame construction --------------------------------------------------

    def _to_uimg(self, img_np: np.ndarray) -> np.ndarray:
        """Model input (normalized float32 OR raw uint8) -> display image at
        the working (post-downsample) resolution; host-side (export/viz)."""
        if img_np.dtype == np.uint8:
            u = img_np.astype(np.float32) / 255.0
        else:
            u = img_np * 0.5 + 0.5
        ds = self.downsample
        return u[::ds, ::ds] if ds > 1 else u

    def _check_frame_shape(self, frame_id, img_np):
        """A dataset frame that resizes to a different working resolution
        (e.g. a ragged video tail) would otherwise surface as an opaque
        reshape error deep inside the model; fail with the cause instead."""
        expect = (*self.full_img_shape, 3)   # pre-downsample resolution
        if tuple(img_np.shape) != expect:
            raise ValueError(
                f"frame {frame_id} resized to {tuple(img_np.shape)} but the "
                f"pipeline was built for {expect} (from the dataset's first "
                "frame); all frames must share one resolution")

    def make_frame(self, frame_id: int, img_np: np.ndarray) -> Frame:
        """img_np: (h, w, 3), already resized — normalized float32 or raw
        uint8 (normalized on device by models.mast3r.encode)."""
        from ..lie import sim3

        self._check_frame_shape(frame_id, img_np)
        img = jnp.asarray(img_np)
        T_WC = (self.current_frame.T_WC if self.current_frame is not None
                else sim3.identity())
        uimg = self._to_uimg(img_np)
        frame = Frame(frame_id=frame_id, img=img, uimg=uimg, T_WC=T_WC,
                      K=self.K)
        feat, pos = self.model_mod.encode(self.params, img[None],
                                          self.model_cfg)
        frame.feat = feat[0]
        frame.pos = pos[0]
        return frame

    # -- frontend ------------------------------------------------------------

    def process_frame(self, frame: Frame):
        """One frontend step; returns the (possibly updated) mode."""
        if self.mode == Mode.INIT:
            self.stats["frames_init"] += 1
            X, C = _mono_init(self.params, self.model_cfg, frame.feat[None],
                              frame.pos[None], self.downsample,
                              self.model_mod)
            frame.update_pointmap(X[0], C[0],
                                  self.config["tracking"]["filtering_mode"])
            self.keyframes.append(frame)
            self.stats["keyframes"] += 1
            self.backend_queue.append(len(self.keyframes) - 1)
            self.mode = Mode.TRACKING
            self.current_frame = frame
            return self.mode

        if self.mode == Mode.TRACKING:
            self.stats["frames_tracking"] += 1
            new_kf, try_reloc = self.tracker.track(frame)
            if try_reloc:
                self.mode = Mode.RELOC
                self.stats["skipped"] += 1
            self.current_frame = frame
            if new_kf:
                self.keyframes.append(frame)
                self.stats["keyframes"] += 1
                self.backend_queue.append(len(self.keyframes) - 1)
                cm, self.tracker.last_match = self.tracker.last_match, None
                if self._reuse_consec and cm is not None:
                    self._consec_match[len(self.keyframes) - 1] = cm
            if self.metrics is not None:
                self.metrics.log(event="track", frame=frame.frame_id,
                                 new_kf=bool(new_kf), reloc=bool(try_reloc),
                                 n_kf=len(self.keyframes),
                                 n_edges=self.factor_graph.n_edges,
                                 edges_dropped=self.factor_graph.edges_dropped,
                                 **self.tracker.last_stats)
            if self.debug_checks:
                self.check_invariants()
            return self.mode

        if self.mode == Mode.RELOC:
            self.stats["frames_reloc"] += 1
            X, C = _mono_init(self.params, self.model_cfg, frame.feat[None],
                              frame.pos[None], self.downsample,
                              self.model_mod)
            frame.update_pointmap(X[0], C[0],
                                  self.config["tracking"]["filtering_mode"])
            self.current_frame = frame
            self.reloc_pending = True
            return self.mode

        raise RuntimeError(f"invalid mode {self.mode}")

    def dispatch_window(self, ids, imgs_np):
        """Dispatch ``len(ids)`` frames as ONE device program (TRACKING mode
        only; see ``_track_window_fused``) WITHOUT waiting for the result.
        Returns an opaque pending handle for ``consume_window``. Between the
        two calls the host can do other work (e.g. dispatch backend BA for
        previously queued keyframes) that overlaps the device computing the
        window — the reference overlaps frontend/backend with processes on
        one GPU (main.py:192-197); here the XLA stream plays that role."""
        from ..lie import sim3

        assert self.mode == Mode.TRACKING
        kfs = self.keyframes
        tr = self.tracker
        W = len(ids)
        assert len(kfs) + W < kfs.capacity, "keyframe buffer nearly full"
        n = kfs.h * kfs.w

        for fid, im in zip(ids, imgs_np):
            self._check_frame_shape(fid, im)
        imgs = jnp.asarray(np.stack(imgs_np))
        idx_init = tr.idx_f2k
        if idx_init is None:
            idx_init = jnp.arange(n, dtype=jnp.int32)
        prev_T = (self.current_frame.T_WC if self.current_frame is not None
                  else sim3.identity())
        K = self.K if self.K is not None else jnp.eye(3)

        out = _track_window_fused(
            self.params, self.model_cfg, tr.mcfg, tr.tcfg, imgs,
            jnp.asarray(ids, jnp.int32), idx_init, prev_T, K,
            jnp.asarray(len(kfs) - 1, jnp.int32),
            kfs.X, kfs.C, kfs.N, kfs.N_updates, kfs.score, kfs.T_WC,
            kfs.feat, kfs.pos, kfs.dataset_idx,
            self.downsample, tr.filtering_mode, tr.filtering_score,
            self.use_calib, (kfs.h, kfs.w), W, self.model_mod,
            capture_matches=self._reuse_consec)

        # adopt the donated store buffers (device-side; no sync). Later
        # dispatches referencing them queue behind this window via XLA
        # data dependencies.
        kfs.X, kfs.C, kfs.N = out.kX, out.kC, out.kN
        kfs.N_updates, kfs.score = out.kNU, out.kscore
        kfs.T_WC, kfs.feat, kfs.pos = out.kT, out.kfeat, out.kpos
        kfs.dataset_idx = out.kdix
        tr.idx_f2k = out.idx_last

        try:   # start the stats transfer early; harmless if unsupported
            out.hoststats.copy_to_host_async()
        except Exception:
            pass
        return (out, ids, imgs_np, imgs)

    def process_window(self, ids, imgs_np) -> int:
        """Track ``len(ids)`` frames in ONE device dispatch. Returns the
        number of frames consumed — on a skip/failure mid-window, the
        prefix is committed, the system enters RELOC at the offending
        frame, and the caller resumes with the per-frame path."""
        return self.consume_window(self.dispatch_window(ids, imgs_np))

    def consume_window(self, pending) -> int:
        """Read back the per-window stats and do the host bookkeeping for a
        window started with ``dispatch_window``."""
        out, ids, imgs_np, imgs = pending
        kfs = self.keyframes
        tr = self.tracker
        W = len(ids)

        hs = np.asarray(out.hoststats)   # the single per-window readback
        consumed = 0
        for t in range(W):
            if hs[t, 7] < 0.5:           # post-halt: never processed
                break
            skipped = hs[t, 3] > 0.5 or hs[t, 4] > 0.5
            tr.last_stats = {"match_frac": float(hs[t, 0]),
                             "match_frac_k": float(hs[t, 1]),
                             "unique_frac": float(hs[t, 2])}
            new_kf = hs[t, 5] > 0.5
            if new_kf:
                kfs.n_size += 1
                self.stats["keyframes"] += 1
                self.backend_queue.append(kfs.n_size - 1)
                kfs.uimg[kfs.n_size - 1] = self._to_uimg(imgs_np[t])
                if self._reuse_consec:
                    # tiny queued slices (no sync); freeing the (W, n)
                    # window outputs once all its keyframes are consumed
                    self._consec_match[kfs.n_size - 1] = (
                        out.idxs[t], out.valids[t], out.Qks[t])
            if self.metrics is not None:
                self.metrics.log(event="track", frame=ids[t],
                                 new_kf=bool(new_kf), reloc=bool(skipped),
                                 n_kf=len(kfs),
                                 n_edges=self.factor_graph.n_edges,
                                 edges_dropped=self.factor_graph.edges_dropped,
                                 **tr.last_stats)
            consumed += 1
            self.stats["frames_tracking"] += 1
            if skipped:
                which = "Skipped" if hs[t, 3] > 0.5 else "Cholesky failed"
                print(f"{which} frame {ids[t]}")
                self.stats["skipped"] += 1
                self.mode = Mode.RELOC
                self.current_frame = Frame(
                    frame_id=ids[t], img=imgs[t],
                    uimg=self._to_uimg(imgs_np[t]),
                    T_WC=out.T_WCf[t], X_canon=out.Xff[t], C=out.Cff[t],
                    feat=out.feats[t], pos=out.poss[t], N=1, N_updates=1,
                    K=self.K)
                if self.debug_checks:
                    self.check_invariants()
                return consumed

        last = consumed - 1
        self.current_frame = Frame(
            frame_id=ids[last], img=None, uimg=None, T_WC=out.prev_T_WC,
            feat=out.feat_last, pos=out.pos_last, N=1, N_updates=1,
            K=self.K)
        if self.debug_checks:
            self.check_invariants()
        return consumed

    def check_invariants(self):
        """Assertion-mode runtime checks (SURVEY.md §5.2 — replaces the
        reference's lock-discipline-by-convention with explicit validation)."""
        kf = self.keyframes
        assert 0 <= kf.n_size <= kf.capacity
        self.factor_graph.flush()
        assert 0 <= self.factor_graph.n_edges <= self.factor_graph.capacity
        n = kf.n_size
        if n:
            T = np.asarray(kf.T_WC[:n])
            assert np.all(np.isfinite(T)), "non-finite keyframe pose"
            q = np.linalg.norm(T[:, 3:7], axis=-1)
            assert np.all(np.abs(q - 1.0) < 1e-2), "denormalized quaternion"
            assert np.all(T[:, 7] > 0), "non-positive scale"
        e = self.factor_graph.n_edges
        if e:
            ii = np.asarray(self.factor_graph.ii[:e])
            jj = np.asarray(self.factor_graph.jj[:e])
            assert ii.min() >= 0 and ii.max() < max(n, 1)
            assert jj.min() >= 0 and jj.max() < max(n, 1)

    # -- backend -------------------------------------------------------------

    def backend_prefetch(self):
        """Dispatch the device half of the queued backend steps' retrieval
        updates (prep+quantize, one tiny program per queued keyframe) so
        they land in the device queue BEFORE the next window program.

        The retrieval readback is the backend's only remaining
        per-keyframe sync; dispatched after the window it stalls for the
        full ~W*41 ms window compute, dispatched before it the readback
        and the host-side IVF scoring overlap the window instead. Results
        are bit-identical (retrieval.prefetch docstring). Call right
        before ``dispatch_window``; ``backend_step`` consumes the handles.
        """
        if self.retrieval is None:
            return
        for idx in self.backend_queue:
            if idx not in self._retrieval_prefetch:
                # traced row index (one gather executable for every idx;
                # a python-int slice would bake idx in and recompile
                # remotely per keyframe)
                feat = jnp.take(self.keyframes.feat, jnp.asarray(idx),
                                axis=0)
                handles = self.retrieval.prefetch(feat)
                # start the D2H transfers now: by drain time the data is
                # already host-side, so the backend's one remaining sync
                # (the quantize readback) costs ~a memcpy, not a relay RTT
                for a in handles:
                    try:
                        a.copy_to_host_async()
                    except Exception:
                        pass
                self._retrieval_prefetch[idx] = handles

    def backend_step(self, flush_deferred=True):
        """Process one backend task (global opt or reloc).

        Spec: run_backend (main.py:74-142). Returns True if work was done.

        ``flush_deferred=False`` (windowed drain): skip the deferred
        edge-gate flush — the drain flushes ONCE before stepping, so the
        second queued keyframe's step does not stall on the first's
        just-dispatched decode+match program (the solve masks by the
        device edge count while fracs are pending; factor_graph.add_factors
        defer docs).
        """
        # deferred edge-gate readbacks from PREVIOUS backend steps land
        # here (their device work has long finished; the readback is a
        # transfer, not a stall) so stats/metrics stay near-exact
        if flush_deferred:
            self.factor_graph.flush()
        if (self._backend_mirror is not None
                and (self.reloc_pending or self.backend_queue)):
            # only when there is backend work (3 of 4 per-frame calls are
            # no-ops at kf_every=4 — don't pay cross-device row copies)
            self._backend_mirror.sync()
        if self.reloc_pending:
            self.reloc_pending = False
            success = self._relocalize(self.current_frame)
            if success:
                self.mode = Mode.TRACKING
                self.stats["relocs"] += 1
                self._reloc_fail_streak = 0
            else:
                self.stats["reloc_failed"] += 1
                self._reloc_fail_streak += 1
                if self.metrics is not None:
                    self.metrics.log(event="reloc_failed",
                                     frame=self.current_frame.frame_id,
                                     streak=self._reloc_fail_streak)
                if self.reinit_after and (self._reloc_fail_streak
                                          >= self.reinit_after):
                    self._reinit_from_current()
            return True

        if not self.backend_queue:
            return False
        idx = self.backend_queue[0]

        # consecutive edge: reuse the tracker's existing frame->keyframe
        # match instead of re-deciding it with a symmetric decode + dense
        # match (the decode+match is the backend's device-time whale;
        # local_opt.reuse_consec_edge). Falls back to the decode path when
        # no match was captured (step-path tracking, resume, reinit).
        cm = (self._consec_match.pop(idx, None)
              if self._reuse_consec else None)

        kf_idx = []
        n_consec = 1
        if cm is None:
            for j in range(min(n_consec, idx)):
                kf_idx.append(idx - 1 - j)

        if self.retrieval is not None:
            rcfg = self.config["retrieval"]
            pref = self._retrieval_prefetch.pop(idx, None)
            # prefetch hit: skip get_frame entirely (its int(N[idx]) scalar
            # readback is a hidden sync behind whatever is queued)
            feat = (None if pref is not None
                    else self.keyframes.get_frame(idx).feat)
            inds = self.retrieval.update(
                feat, add_after_query=True, k=int(rcfg["k"]),
                min_thresh=float(rcfg["min_thresh"]), prefetched=pref)
            lc = set(inds) - {idx - 1}
            if lc:
                self.stats["loop_closures"] += len(lc)
            kf_idx += inds

        drop = {idx} if cm is None else {idx, idx - 1}
        kf_idx = list(set(kf_idx) - drop)
        if cm is not None and idx > 0:
            self.factor_graph.add_tracked_edge(idx - 1, idx, *cm)
        if kf_idx:
            # deferred gate: the decode+match dispatch is NOT synced here;
            # the solve below masks by the device edge count and the frac
            # readback lands at the next backend step's flush (factor_
            # graph.add_factors docstring)
            self.factor_graph.add_factors(
                kf_idx, [idx] * len(kf_idx),
                float(self.config["local_opt"]["min_match_frac"]),
                defer=True)

        if self.use_calib:
            self.factor_graph.solve_GN_calib()
        else:
            self.factor_graph.solve_GN_rays()

        self.backend_queue.pop(0)
        return True

    def _reinit_from_current(self):
        """Escape hatch for an unrecoverable relocalization storm: restart
        tracking from the current frame's mono pointmap as a fresh keyframe
        (a new disconnected trajectory segment; its pose keeps the last
        tracked value). The reference has no equivalent — it relocalizes
        forever (main.py:28-71) — so this is OFF unless
        ``reloc.reinit_after`` > 0."""
        frame = self.current_frame
        print(f"Re-initializing from frame {frame.frame_id} after "
              f"{self._reloc_fail_streak} failed relocalizations")
        self._reloc_fail_streak = 0
        self.stats["reinits"] += 1
        # the RELOC branch of process_frame already gave the frame its mono
        # pointmap (update_pointmap with N=0)
        self.keyframes.append(frame)
        self.stats["keyframes"] += 1
        self.backend_queue.append(len(self.keyframes) - 1)
        self.tracker.reset_idx()
        self.mode = Mode.TRACKING
        if self.metrics is not None:
            self.metrics.log(event="reinit", frame=frame.frame_id,
                             n_kf=len(self.keyframes))

    def _relocalize(self, frame: Frame):
        """Spec: relocalization() (main.py:28-71)."""
        if self.retrieval is None:
            return False
        rcfg = self.config["retrieval"]
        kf_idx = self.retrieval.update(
            frame.feat, add_after_query=False, k=int(rcfg["k"]),
            min_thresh=float(rcfg["min_thresh"]))
        if not kf_idx:
            return False
        self.keyframes.append(frame)
        if self._backend_mirror is not None:
            self._backend_mirror.sync()   # the tentative keyframe's rows
        n_kf = len(self.keyframes)
        frame_idx = [n_kf - 1] * len(kf_idx)
        print(f"RELOCALIZING against kf {n_kf - 1} and {kf_idx}")
        ok = self.factor_graph.add_factors(
            frame_idx, list(kf_idx),
            float(self.config["reloc"]["min_match_frac"]),
            is_reloc=bool(self.config["reloc"]["strict"]))
        if ok:
            self.retrieval.update(frame.feat, add_after_query=True,
                                  k=int(rcfg["k"]),
                                  min_thresh=float(rcfg["min_thresh"]))
            # seed pose from the retrieved keyframe (main.py:61)
            if self._backend_mirror is not None:
                self._backend_mirror.seed_pose(
                    n_kf - 1, _get_row_jit(
                        self.keyframes.T_WC,
                        jnp.asarray(kf_idx[0], jnp.int32)))
            else:
                self.keyframes.T_WC = self.keyframes.T_WC.at[n_kf - 1].set(
                    self.keyframes.T_WC[kf_idx[0]])
            self.stats["keyframes"] += 1
            if self.use_calib:
                self.factor_graph.solve_GN_calib()
            else:
                self.factor_graph.solve_GN_rays()
            print("Success! Relocalized")
            return True
        self.keyframes.pop_last()
        print("Failed to relocalize")
        return False

    # -- main loop -----------------------------------------------------------

    def run(self, dataset, max_frames=None, progress=False, start_frame=0,
            checkpoint_path=None, checkpoint_every=0, viewer=None):
        """End-to-end loop over a dataset.

        ``single_thread: True`` (eval default) drains the backend after every
        frame for deterministic results (spec: main.py:291-308 spin-waits);
        otherwise the backend runs in a host thread concurrently with
        frontend tracking (the reference's process parallelism, main.py:228).
        ``start_frame`` skips already-processed frames (checkpoint resume);
        ``checkpoint_every`` saves the runtime state to ``checkpoint_path``
        every N processed frames (fault tolerance — the reference has no
        recovery path, SURVEY.md §5.4). ``viewer`` is an optional
        viz_server.LiveViewer: its pause/step gate runs before each
        frame/window and its scene snapshot is refreshed (throttled) after —
        the reference's viz process + WindowMsg queue (main.py:170-171).
        """
        from ..io.image import resize_img

        n = len(dataset) if max_frames is None else min(max_frames,
                                                        len(dataset))
        import time

        backend_thread = None
        if not self.single_thread:
            import threading

            def backend_loop():
                while self.mode != Mode.TERMINATED:
                    with self.state_lock:
                        did = self.backend_step()
                    if not did:
                        time.sleep(0.005)

            backend_thread = threading.Thread(target=backend_loop,
                                              daemon=True)
            backend_thread.start()

        t0 = time.time()
        i = int(start_frame)
        W = self.window
        while i < n:
            i_prev = i
            if viewer is not None:
                viewer.wait_if_paused()
            # while paused, a released step advances ONE frame (per-frame
            # path), matching the reference's pause/next semantics even in
            # windowed mode
            stepping = viewer is not None and viewer.paused
            if (W > 1 and self.single_thread and self.mode == Mode.TRACKING
                    and not stepping and i + W <= n
                    and len(self.keyframes) + W < self.keyframes.capacity):
                ids = list(range(i, i + W))
                imgs_np = []
                for t in ids:
                    _, img = dataset[t]
                    r = resize_img(img, dataset.img_size)
                    # ship raw uint8 (4x less host->device traffic); the
                    # window program normalizes on device (mast3r.encode)
                    imgs_np.append(r.get("img_u8", r["img"]))
                # dispatch the queued backend steps' retrieval prep FIRST
                # (queue position => its readback and the host IVF overlap
                # the window compute), then the window, then drain backend
                # work queued by PREVIOUS windows while the device runs
                # this one (the backend's jitted steps queue behind the
                # window through XLA data deps), and only then block on
                # the stats readback
                self.backend_prefetch()
                pending = self.dispatch_window(ids, imgs_np)
                # one flush for the whole drain (previous windows' backend
                # programs have finished by now); the per-step flush would
                # make the SECOND queued keyframe stall on the first's
                # decode+match behind this window
                self.factor_graph.flush()
                while self.backend_step(flush_deferred=False):
                    pass
                i += self.consume_window(pending)
            else:
                _, img = dataset[i]
                res = resize_img(img, dataset.img_size)
                frame = self.make_frame(i, res.get("img_u8", res["img"]))
                if self.single_thread:
                    self.process_frame(frame)
                    while self.backend_step():
                        pass
                else:
                    with self.state_lock:
                        self.process_frame(frame)
                i += 1
            if viewer is not None:
                self.last_frame_idx = i
                viewer.update(self)   # snapshots under state_lock itself
            if progress and i > 0 and i // 30 > i_prev // 30:
                print(f"FPS: {i / (time.time() - t0):.2f}")
            if (checkpoint_every and checkpoint_path
                    and i // checkpoint_every > i_prev // checkpoint_every):
                from . import checkpoint as checkpoint_mod

                with self.state_lock:
                    checkpoint_mod.save_state(checkpoint_path, self)
        # drain
        while self.backend_queue or self.reloc_pending:
            if self.single_thread:
                if not self.backend_step():
                    break
            else:
                time.sleep(0.01)
        self.mode = Mode.TERMINATED
        # host bookkeeping catches up with the last deferred edge gates
        # before stats/exports are read
        self.factor_graph.flush()
        if backend_thread is not None:
            backend_thread.join(timeout=10.0)
        if viewer is not None:
            viewer.update(self, force=True)
        return self.stats
