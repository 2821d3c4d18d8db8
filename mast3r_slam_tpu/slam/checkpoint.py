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
    """Serialize a SLAMSystem's runtime state (not the model weights).

    Only the ACTIVE rows (n_size keyframes / n_edges edges) are written —
    at full capacity the padded pointmap buffers alone are ~1.2 GB, so
    slicing keeps periodic checkpoints (system.run checkpoint_every)
    proportional to actual map size. ``load_state`` pads back into the
    target system's capacity buffers.
    """
    kf = system.keyframes
    fg = system.factor_graph
    fg.flush()   # deferred edge-gate readbacks must land before snapshot
    n, e = kf.n_size, fg.n_edges
    arrays = {
        "kf_n_size": np.asarray(kf.n_size),
        "kf_dataset_idx": np.asarray(kf.dataset_idx[:n]),
        "kf_T_WC": np.asarray(kf.T_WC[:n]),
        "kf_X": np.asarray(kf.X[:n]),
        "kf_C": np.asarray(kf.C[:n]),
        "kf_N": np.asarray(kf.N[:n]),
        "kf_N_updates": np.asarray(kf.N_updates[:n]),
        "kf_score": np.asarray(kf.score[:n]),
        "kf_feat": np.asarray(kf.feat[:n].astype(np.float32)
                              if kf.feat.dtype != np.float32
                              else kf.feat[:n]),
        "kf_pos": np.asarray(kf.pos[:n]),
        "kf_uimg": np.asarray(kf.uimg[:n]),
        "fg_n_edges": np.asarray(fg.n_edges),
        "fg_ii": np.asarray(fg.ii[:e]),
        "fg_jj": np.asarray(fg.jj[:e]),
        "fg_idx": np.asarray(fg.idx_ii2jj[:e]),
        "fg_valid": np.asarray(fg.valid_match[:e]),
        "fg_Q": np.asarray(fg.Q[:e]),
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
        # flat IVF snapshot => O(1) resume (no per-keyframe re-quantization
        # replay; load falls back to replay if the snapshot's engine kind
        # isn't available on the resuming host)
        st = system.retrieval.state_dict()
        for k, v in st.items():
            arrays[f"ivf_{k}"] = np.asarray(v)
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

    def into(buf, name, dtype=None):
        """Write the saved (active-rows) array into the leading rows of the
        capacity buffer (also accepts full-capacity arrays from older
        checkpoints)."""
        arr = jnp.asarray(data[name])
        if dtype is not None:
            arr = arr.astype(dtype)
        m = arr.shape[0]
        assert m <= buf.shape[0], (
            f"checkpoint {name} has {m} rows; capacity is {buf.shape[0]}")
        return buf.at[:m].set(arr)

    kf.n_size = int(data["kf_n_size"])
    kf.dataset_idx = into(kf.dataset_idx, "kf_dataset_idx")
    kf.T_WC = into(kf.T_WC, "kf_T_WC")
    kf.X = into(kf.X, "kf_X")
    kf.C = into(kf.C, "kf_C")
    kf.N = into(kf.N, "kf_N")
    if "kf_N_updates" in data:
        kf.N_updates = into(kf.N_updates, "kf_N_updates")
    if "kf_score" in data:
        kf.score = into(kf.score, "kf_score")
    kf.feat = into(kf.feat, "kf_feat", dtype=kf.feat.dtype)
    kf.pos = into(kf.pos, "kf_pos")
    kf.uimg[: kf.n_size] = data["kf_uimg"][: kf.n_size]
    fg.n_edges = int(data["fg_n_edges"])
    fg.n_edges_dev = jnp.asarray(fg.n_edges, jnp.int32)
    fg.n_edges_ub = fg.n_edges
    fg._pending = []
    fg.ensure_capacity(fg.n_edges)   # checkpoints may hold a grown graph
    fg.ii = into(fg.ii, "fg_ii")
    fg.jj = into(fg.jj, "fg_jj")
    fg.idx_ii2jj = into(fg.idx_ii2jj, "fg_idx")
    fg.valid_match = into(fg.valid_match, "fg_valid")
    fg.Q = into(fg.Q, "fg_Q")
    mode = Mode(int(data["mode"]))
    if mode == Mode.TERMINATED:
        # an end-of-run checkpoint: resuming means processing MORE frames,
        # so re-enter the live state machine
        mode = Mode.TRACKING if kf.n_size else Mode.INIT
    system.mode = mode
    system.backend_queue = [int(x) for x in data["backend_queue"]]
    # drop live prefetch handles: they were dispatched against pre-restore
    # features and would otherwise be consumed for reused keyframe indices
    # (backend_prefetch skips idxs already present in the dict)
    system._retrieval_prefetch = {}
    # tracker matches for queued consecutive edges are not checkpointed;
    # the backend falls back to decoding those edges after a resume
    system._consec_match = {}
    bm = getattr(system, "_backend_mirror", None)
    if bm is not None:   # re-mirror the restored store wholesale
        bm.__init__(system.keyframes, bm.device)
    if system.retrieval is not None and "retrieval_kf_counter" in data:
        restored = False
        if "ivf_kind" in data:   # O(1): direct flat-IVF restore
            st = {k[len("ivf_"):]: data[k] for k in data.files
                  if k.startswith("ivf_")}
            restored = system.retrieval.load_state_dict(st)
        if not restored:
            # fallback: rebuild the IVF from stored keyframe features
            # (deterministic; O(n) device dispatches)
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
