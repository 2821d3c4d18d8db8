"""Mid-run SLAM state checkpoint / resume.

The reference cannot resume a run (SURVEY.md §5.4 — weights-only loading,
results written once at termination). Here the entire runtime state —
keyframe store, factor-graph edges, retrieval inverted file, mode/counters —
is a flat pytree of arrays, so checkpointing is a single compressed npz and
resume is state-exact (keyframes, edges, fusion state, match warm start,
current pose; the retrieval inverted file is rebuilt deterministically from
the stored keyframe features).
"""

from __future__ import annotations

import pathlib

import numpy as np


def save_state(path, system):
    """Serialize a SLAMSystem's runtime state (not the model weights)."""
    kf = system.keyframes
    fg = system.factor_graph
    arrays = {
        "kf_n_size": np.asarray(kf.n_size),
        "kf_dataset_idx": np.asarray(kf.dataset_idx),
        "kf_T_WC": np.asarray(kf.T_WC),
        "kf_X": np.asarray(kf.X),
        "kf_C": np.asarray(kf.C),
        "kf_N": np.asarray(kf.N),
        "kf_N_updates": np.asarray(kf.N_updates),
        "kf_score": np.asarray(kf.score),
        "kf_feat": np.asarray(kf.feat.astype(np.float32)
                              if kf.feat.dtype != np.float32 else kf.feat),
        "kf_pos": np.asarray(kf.pos),
        "kf_uimg": np.asarray(kf.uimg[: kf.n_size]),
        "fg_n_edges": np.asarray(fg.n_edges),
        "fg_ii": np.asarray(fg.ii),
        "fg_jj": np.asarray(fg.jj),
        "fg_idx": np.asarray(fg.idx_ii2jj),
        "fg_valid": np.asarray(fg.valid_match),
        "fg_Q": np.asarray(fg.Q),
        "mode": np.asarray(system.mode.value),
        "backend_queue": np.asarray(system.backend_queue, dtype=np.int64),
        "last_frame_id": np.asarray(
            system.current_frame.frame_id
            if system.current_frame is not None
            else (int(np.asarray(kf.dataset_idx[: kf.n_size]).max())
                  if kf.n_size else -1)),
    }
    if system.retrieval is not None:
        arrays["retrieval_kf_counter"] = np.asarray(
            system.retrieval.kf_counter)
    if system.tracker.idx_f2k is not None:
        arrays["tracker_idx_f2k"] = np.asarray(system.tracker.idx_f2k)
    if system.current_frame is not None:
        arrays["current_T_WC"] = np.asarray(system.current_frame.T_WC)
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load_state(path, system):
    """Restore a SLAMSystem's runtime state in place."""
    import jax.numpy as jnp

    from .frame import Mode

    data = np.load(path, allow_pickle=False)
    kf = system.keyframes
    fg = system.factor_graph
    kf.n_size = int(data["kf_n_size"])
    kf.dataset_idx = jnp.asarray(data["kf_dataset_idx"])
    kf.T_WC = jnp.asarray(data["kf_T_WC"])
    kf.X = jnp.asarray(data["kf_X"])
    kf.C = jnp.asarray(data["kf_C"])
    kf.N = jnp.asarray(data["kf_N"])
    if "kf_N_updates" in data:
        kf.N_updates = jnp.asarray(data["kf_N_updates"])
    if "kf_score" in data:
        kf.score = jnp.asarray(data["kf_score"])
    kf.feat = jnp.asarray(data["kf_feat"]).astype(kf.feat.dtype)
    kf.pos = jnp.asarray(data["kf_pos"])
    kf.uimg[: kf.n_size] = data["kf_uimg"]
    fg.n_edges = int(data["fg_n_edges"])
    fg.ii = jnp.asarray(data["fg_ii"])
    fg.jj = jnp.asarray(data["fg_jj"])
    fg.idx_ii2jj = jnp.asarray(data["fg_idx"])
    fg.valid_match = jnp.asarray(data["fg_valid"])
    fg.Q = jnp.asarray(data["fg_Q"])
    mode = Mode(int(data["mode"]))
    if mode == Mode.TERMINATED:
        # an end-of-run checkpoint: resuming means processing MORE frames,
        # so re-enter the live state machine
        mode = Mode.TRACKING if kf.n_size else Mode.INIT
    system.mode = mode
    system.backend_queue = [int(x) for x in data["backend_queue"]]
    if system.retrieval is not None and "retrieval_kf_counter" in data:
        # rebuild the IVF from stored keyframe features (deterministic)
        system.retrieval.kf_counter = 0
        n = int(data["retrieval_kf_counter"])
        for i in range(min(n, kf.n_size)):
            system.retrieval.update(kf.get_frame(i).feat,
                                    add_after_query=True, k=1)
    if "tracker_idx_f2k" in data:
        system.tracker.idx_f2k = jnp.asarray(data["tracker_idx_f2k"])
    if "current_T_WC" in data and system.current_frame is None:
        from .frame import Frame

        system.current_frame = Frame(
            frame_id=-1, img=None, uimg=None,
            T_WC=jnp.asarray(data["current_T_WC"]))
    # next dataset frame to process (for run(start_frame=...))
    system.resume_frame = int(data["last_frame_id"]) + 1 \
        if "last_frame_id" in data else 0
    return system
