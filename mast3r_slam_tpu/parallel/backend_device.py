"""Run the SLAM backend on a dedicated device (frontend/backend overlap).

The reference overlaps its frontend and backend as two PROCESSES sharing one
GPU (/root/reference/main.py:228, 291-308) — concurrency without extra
silicon. On a multi-chip TPU host the natural mapping is one chip per role:
the factor graph's device programs (symmetric edge decode + dense match +
global Gauss-Newton — the backend's ~0.5 s/keyframe of device work,
DEVELOPMENT.md round-4 ledger) execute on a backend chip while the frontend
chip keeps tracking; only row updates flow forward (new keyframe
feat/pos/pointmaps, a few MB per keyframe) and optimized poses flow back
(KB). SURVEY.md §7 hard-parts: "dedicate a second chip to backend decode".

Mechanics (single-controller JAX): every array the factor graph touches is
COMMITTED to the backend device — model params (replicated once at startup,
the reference's ``model.share_memory()`` equivalent, main.py:200), the edge
buffers (created there), and a :class:`BackendMirror` of the keyframe-store
fields the backend reads. jit dispatch follows the committed operands, so
``FactorGraph``'s existing programs run on the backend device unchanged.
``BackendMirror.sync()`` copies the rows that changed since the last sync —
appended keyframes plus the still-fusing latest row — and all poses; the
post-solve ``update_T_WCs`` pushes poses back to the frontend store.

This path needs >= 2 local devices; the test suite exercises it on the
virtual CPU mesh (tests/test_backend_device.py), and the driver's
``dryrun_multichip`` compiles it. Single-chip runs (the current tunnel)
keep the in-stream overlap instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..slam.frame import _get_row_jit, _set_row_copy


@jax.jit
def _avg_confs(C, N):
    return C / jnp.maximum(N, 1).astype(C.dtype)[:, None]


class BackendMirror:
    """Backend-device mirror of the keyframe fields the factor graph reads.

    Duck-types the ``KeyframeStore`` surface ``FactorGraph`` consumes
    (X, C, T_WC, feat, pos, average_confs, len, capacity, h/w, K,
    update_T_WCs). The frontend store stays the source of truth for
    everything except poses, which the backend owns after each solve
    (reference: global_opt.py:158 writes poses into the shared store).
    """

    def __init__(self, keyframes, device):
        self.main = keyframes
        self.device = device
        put = lambda a: jax.device_put(a, device)
        self.X = put(keyframes.X)
        self.C = put(keyframes.C)
        self.N = put(keyframes.N)
        self.T_WC = put(keyframes.T_WC)
        self.feat = put(keyframes.feat)
        self.pos = put(keyframes.pos)
        self.capacity = keyframes.capacity
        self.h, self.w = keyframes.h, keyframes.w
        self._mirror_n = 0

    # -- KeyframeStore surface ------------------------------------------------

    @property
    def K(self):
        return self.main.K

    @property
    def n_size(self):
        return self.main.n_size

    def __len__(self):
        return self.main.n_size

    def average_confs(self):
        return _avg_confs(self.C, self.N)

    def update_T_WCs(self, T_WCs):
        """Adopt optimized poses on the backend device AND push them to the
        frontend store (the backend's only writeback, KB-sized)."""
        self.T_WC = T_WCs
        self.main.update_T_WCs(jax.device_put(T_WCs, _device_of(self.main)))

    # -- forward sync ---------------------------------------------------------

    def sync(self):
        """Copy keyframe rows changed since the last sync + all poses.

        Changed rows = appended since last sync, plus the previously-latest
        row (the frontend keeps fusing the active keyframe's pointmap,
        tracker.py:98-101, until the next promotion). Row transfers are
        per-row jitted gathers (traced index -> one executable each) so no
        per-shape recompiles happen on a remote-compile backend.
        """
        n = self.main.n_size
        start = max(0, min(self._mirror_n - 1, n - 1))
        for r in range(start, n):
            ri = jnp.asarray(r, jnp.int32)
            for field in ("X", "C", "N", "feat", "pos"):
                row = _get_row_jit(getattr(self.main, field), ri)
                row = jax.device_put(row, self.device)
                setattr(self, field,
                        _set_row_copy(getattr(self, field), ri, row))
        # poses: the frontend appends new keyframe poses and reloc seeds
        # them; the whole buffer is KB-sized, so mirror it wholesale
        self.T_WC = jax.device_put(self.main.T_WC, self.device)
        self._mirror_n = n

    def seed_pose(self, idx: int, T):
        """Write a pose row on BOTH stores (relocalization seeding,
        main.py:61) without a full resync."""
        ri = jnp.asarray(idx, jnp.int32)
        self.T_WC = _set_row_copy(self.T_WC,
                                  ri, jax.device_put(T, self.device))
        self.main.T_WC = self.main._set_row(self.main.T_WC, ri, T)


def _device_of(store):
    d = getattr(store.T_WC, "devices", None)
    if d is None:
        return None
    ds = store.T_WC.devices()
    return next(iter(ds)) if ds else None


def pick_backend_device(spec):
    """Resolve the ``runtime.backend_device`` config value to a jax device.

    ``"none"``/0/False -> None (single-device operation). ``"auto"`` -> the
    second local device when one exists, else None. An integer -> that
    device index (must differ from 0 and exist).
    """
    if spec is None or spec is False or spec in ("none", "None", "") \
            or (spec == 0 and not isinstance(spec, bool)):
        return None
    devs = jax.local_devices()
    # `is True` (not ==): the integer index 1 must NOT match the bool
    if spec == "auto" or spec is True:
        return devs[1] if len(devs) > 1 else None
    i = int(spec)
    if i <= 0 or i >= len(devs):
        raise ValueError(
            f"backend_device={spec!r} but only {len(devs)} local devices")
    return devs[i]
