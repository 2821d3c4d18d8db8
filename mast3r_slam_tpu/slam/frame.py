"""Frames and the fixed-capacity keyframe store (functional, device-resident).

TPU-native re-design of /root/reference/mast3r_slam/frame.py. The reference
keeps preallocated shared-memory CUDA tensors guarded by RLocks
(SharedKeyframes:220-327, SharedStates:125-217) so three processes can
mutate them concurrently. Here the SLAM runs as a single-controller JAX
program: the store is a pytree of capacity-padded device arrays updated with
donated ``.at[i].set`` jits (true in-place on TPU), and the frontend/backend
exchange immutable snapshots instead of taking locks — the whole class of
shared-memory races disappears.

Pointmap fusion modes mirror Frame.update_pointmap (frame.py:41-105).
"""

from __future__ import annotations

import dataclasses
import enum
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..lie import sim3

# MSLAM_NO_DONATE=1 disables ALL buffer donation (here, the fused window
# program and the fused edge append) — a diagnostic for backends whose
# input/output aliasing is suspect: donation is semantically transparent,
# so any behavior difference under this flag indicts the runtime's
# aliasing, not the SLAM code.
DONATE = not os.environ.get("MSLAM_NO_DONATE")


def donate_argnums(*nums):
    """donate_argnums honoring the MSLAM_NO_DONATE kill-switch."""
    return nums if DONATE else ()


class Mode(enum.Enum):
    INIT = 0
    TRACKING = 1
    RELOC = 2
    TERMINATED = 3


@partial(jax.jit, static_argnames=("mode", "score_fn"),
         donate_argnums=donate_argnums(1, 2))
def fuse_pointmap(mode: str, X_old, C_old, N_old, X_new, C_new,
                  score_old=None, score_fn: str = "median", n_updates=None):
    """One fusion step; returns (X, C, N[, score]). Spec: frame.py:41-105.

    ``N`` is the accumulation count used by get_average_conf (C is a running
    sum in the weighted modes, as in the reference). ``best_score`` keeps the
    map whose median/mean confidence is highest (frame.py:33-38, 62-68);
    ``first`` keeps the first post-registration update (replaces while
    ``n_updates == 1``, frame.py:52-57).
    """
    if mode == "best_score":
        new_score = (jnp.median(C_new) if score_fn == "median"
                     else jnp.mean(C_new))
        take = new_score > score_old
        X = jnp.where(take, X_new, X_old)
        C = jnp.where(take, C_new, C_old)
        score = jnp.where(take, new_score, score_old)
        return X, C, jnp.ones_like(N_old), score
    if mode == "first":
        take = n_updates == 1
        X = jnp.where(take, X_new, X_old)
        C = jnp.where(take, C_new, C_old)
        return X, C, jnp.ones_like(N_old)
    if mode == "recent":
        return X_new, C_new, jnp.ones_like(N_old)
    if mode == "indep_conf":
        take = C_new > C_old
        X = jnp.where(take, X_new, X_old)
        C = jnp.where(take, C_new, C_old)
        return X, C, jnp.ones_like(N_old)
    if mode == "weighted_pointmap":
        X = (C_old * X_old + C_new * X_new) / (C_old + C_new)
        return X, C_old + C_new, N_old + 1
    if mode == "weighted_spherical":
        def to_sph(P):
            r = jnp.linalg.norm(P, axis=-1, keepdims=True)
            x, y, z = jnp.split(P, 3, axis=-1)
            phi = jnp.arctan2(y, x)
            theta = jnp.arccos(jnp.clip(z / jnp.maximum(r, 1e-12), -1.0, 1.0))
            return jnp.concatenate([r, phi, theta], axis=-1)

        def to_cart(s):
            r, phi, theta = jnp.split(s, 3, axis=-1)
            st = jnp.sin(theta)
            return jnp.concatenate(
                [r * st * jnp.cos(phi), r * st * jnp.sin(phi),
                 r * jnp.cos(theta)], axis=-1)

        s = (C_old * to_sph(X_old) + C_new * to_sph(X_new)) / (C_old + C_new)
        return to_cart(s), C_old + C_new, N_old + 1
    raise ValueError(f"unknown filtering_mode {mode}")


@dataclasses.dataclass
class Frame:
    """One input frame (device arrays; batch dim stripped)."""

    frame_id: int
    img: jnp.ndarray                  # (h, w, 3) normalized
    uimg: jnp.ndarray                 # (h, w, 3) [0, 1] for viz/export
    T_WC: jnp.ndarray = None          # (8,)
    X_canon: Optional[jnp.ndarray] = None   # (h*w, 3)
    C: Optional[jnp.ndarray] = None         # (h*w, 1)
    feat: Optional[jnp.ndarray] = None      # (n, enc_dim)
    pos: Optional[jnp.ndarray] = None       # (n, 2)
    N: int = 0
    N_updates: int = 0
    K: Optional[jnp.ndarray] = None
    score: Optional[jnp.ndarray] = None     # best_score filtering state

    def __post_init__(self):
        if self.T_WC is None:
            self.T_WC = sim3.identity()

    def update_pointmap(self, X, C, mode: str, score_fn: str = "median"):
        if self.N == 0:
            self.X_canon, self.C, self.N = X, C, 1
            self.N_updates = 1
            if mode == "best_score":
                self.score = (jnp.median(C) if score_fn == "median"
                              else jnp.mean(C))
            return
        if mode == "best_score":
            Xn, Cn, Nn, score = fuse_pointmap(
                mode, self.X_canon, self.C, jnp.asarray(self.N, jnp.int32),
                X, C, self.score, score_fn)
            self.score = score
        else:
            Xn, Cn, Nn = fuse_pointmap(
                mode, self.X_canon, self.C, jnp.asarray(self.N, jnp.int32),
                X, C, n_updates=jnp.asarray(self.N_updates, jnp.int32))
        self.X_canon, self.C, self.N = Xn, Cn, int(Nn)
        self.N_updates += 1

    def get_average_conf(self):
        return self.C / self.N if self.C is not None else None


def _set_row(buf, i, row):
    return buf.at[i].set(row)


_set_row_donate = jax.jit(_set_row, donate_argnums=donate_argnums(0))
_set_row_copy = jax.jit(_set_row)


def _get_row(buf, i):
    return jax.lax.dynamic_index_in_dim(buf, i, keepdims=False)


# traced row index => one executable regardless of i (remote compiles are
# expensive; eager buf[i] slices would compile per distinct index)
_get_row_jit = jax.jit(_get_row)


class KeyframeStore:
    """Fixed-capacity keyframe buffer (capacity-padded device arrays).

    Matches SharedKeyframes' field set (frame.py:234-248) minus the viz-only
    duplicates; `n_size` is host state. All arrays stay on device; per-field
    row writes are donated jits => in-place buffer updates, no reallocation.
    """

    def __init__(self, capacity: int, num_points: int, num_patches: int,
                 feat_dim: int, img_shape, dtype=jnp.float32,
                 feat_dtype=jnp.bfloat16, donate: bool = True):
        import numpy as _np

        # donated in-place row writes are only safe single-threaded; the
        # concurrent frontend/backend mode keeps old buffers valid for
        # in-flight consumers (cf. the reference's RLock'd shared tensors)
        self._set_row = _set_row_donate if donate else _set_row_copy
        h, w = img_shape
        self.capacity = capacity
        self.h, self.w = h, w
        self.n_size = 0
        z = jnp.zeros
        self.dataset_idx = z((capacity,), jnp.int32)
        self.T_WC = jnp.tile(sim3.identity()[None], (capacity, 1))
        self.X = z((capacity, num_points, 3), dtype)
        self.C = z((capacity, num_points), dtype)
        self.N = z((capacity,), jnp.int32)
        self.N_updates = z((capacity,), jnp.int32)
        self.feat = z((capacity, num_patches, feat_dim), feat_dtype)
        self.pos = z((capacity, num_patches, 2), jnp.int32)
        self.score = z((capacity,), dtype)   # best_score filtering state
        # uimg is export/viz-only -> host memory, not HBM
        self.uimg = _np.zeros((capacity, h, w, 3), _np.float32)
        self.K = None

    def __len__(self):
        return self.n_size

    def append(self, frame: Frame):
        idx = self.n_size
        assert idx < self.capacity, "keyframe buffer full"
        self.set_frame(idx, frame)
        return idx

    def pop_last(self):
        self.n_size -= 1

    def set_frame(self, idx: int, frame: Frame):
        self.n_size = max(self.n_size, idx + 1)
        sr = self._set_row
        self.dataset_idx = sr(self.dataset_idx, idx,
                              jnp.asarray(frame.frame_id, jnp.int32))
        self.T_WC = sr(self.T_WC, idx, frame.T_WC)
        self.X = sr(self.X, idx, frame.X_canon)
        self.C = sr(self.C, idx, frame.C[..., 0])
        self.N = sr(self.N, idx, jnp.asarray(frame.N, jnp.int32))
        self.N_updates = sr(self.N_updates, idx,
                            jnp.asarray(frame.N_updates, jnp.int32))
        self.feat = sr(self.feat, idx, frame.feat.astype(self.feat.dtype))
        self.pos = sr(self.pos, idx, frame.pos)
        if frame.score is not None:
            self.score = sr(self.score, idx,
                            jnp.asarray(frame.score, self.score.dtype))
        if frame.uimg is not None:
            import numpy as _np

            self.uimg[idx] = _np.asarray(frame.uimg)

    def get_frame(self, idx: int) -> Frame:
        f = Frame(
            frame_id=int(self.dataset_idx[idx]),
            img=None,
            uimg=self.uimg[idx],
            T_WC=self.T_WC[idx],
            X_canon=self.X[idx],
            C=self.C[idx][..., None],
            feat=self.feat[idx],
            pos=self.pos[idx],
            N=int(self.N[idx]),
            N_updates=int(self.N_updates[idx]),
            K=self.K,
            score=self.score[idx],
        )
        return f

    def last_keyframe(self) -> Optional[Frame]:
        if self.n_size == 0:
            return None
        return self.get_frame(self.n_size - 1)

    def update_T_WCs(self, T_WCs):
        """Adopt globally-optimized poses (full capacity buffer)."""
        self.T_WC = T_WCs

    def average_confs(self):
        """(cap, P) average confidences C / N (inactive rows -> 0)."""
        N = jnp.maximum(self.N, 1).astype(self.C.dtype)
        return self.C / N[:, None]
