"""End-to-end pipeline test on CPU with the TINY model and synthetic frames.

Exercises the full mode machine (INIT -> TRACKING, keyframing, backend
global optimization, retrieval insertion, export) without real weights —
validating pipeline mechanics, not trajectory accuracy (SURVEY.md §4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mast3r_slam_tpu import config as config_mod
from mast3r_slam_tpu.models import TINY, init_params
from mast3r_slam_tpu.slam import retrieval as retrieval_mod
from mast3r_slam_tpu.slam.frame import Mode
from mast3r_slam_tpu.slam.system import SLAMSystem


class _SynthDataset:
    """Drifting textured pattern at the TINY model's resolution."""

    def __init__(self, n=6, h=64, w=96):
        rng = np.random.default_rng(0)
        base = rng.standard_normal((h + 32, w + 32, 3)).astype(np.float32)
        # smooth it for more coherent "images"
        k = np.ones((5, 5)) / 25.0
        for c in range(3):
            from scipy.signal import convolve2d

            base[..., c] = convolve2d(base[..., c], k, mode="same")
        self.frames = []
        for i in range(n):
            crop = base[i * 2:i * 2 + h, i * 3:i * 3 + w]
            self.frames.append(np.ascontiguousarray(crop))
        self.timestamps = [float(i) for i in range(n)]
        self.img_size = 512
        self.save_results = True

    def __len__(self):
        return len(self.frames)

    def __getitem__(self, i):
        return self.timestamps[i], self.frames[i]


@pytest.fixture(scope="module")
def tiny_system():
    cfg = dict(config_mod.default_config())
    params = init_params(jax.random.PRNGKey(0), TINY)
    rparams = retrieval_mod.init_retrieval_params(
        jax.random.PRNGKey(1), backbone_dim=TINY.enc_embed_dim,
        proj_dim=64, codebook_size=256)
    h, w = TINY.img_size
    system = SLAMSystem(params, TINY, cfg, (h, w), retrieval_params=rparams,
                        keyframe_capacity=8, edge_capacity=16)
    return system


def test_pipeline_runs_and_exports(tmp_path, tiny_system):
    system = tiny_system
    ds = _SynthDataset(n=5)
    h, w = TINY.img_size
    for i in range(len(ds)):
        _, img = ds[i]
        frame = system.make_frame(i, (img - img.mean()) / (img.std() + 1e-6))
        system.process_frame(frame)
        while system.backend_step():
            pass

    assert system.mode in (Mode.TRACKING, Mode.RELOC)
    assert len(system.keyframes) >= 1
    assert system.stats["keyframes"] >= 1
    # all stored poses finite
    T = np.asarray(system.keyframes.T_WC[: len(system.keyframes)])
    assert np.all(np.isfinite(T))

    # export round trip
    from mast3r_slam_tpu.io import export

    traj = export.save_traj(tmp_path, "seq.txt", ds.timestamps,
                            system.keyframes)
    lines = traj.read_text().strip().splitlines()
    assert len(lines) == len(system.keyframes)
    assert len(lines[0].split()) == 8

    ply = export.save_reconstruction(tmp_path, "seq.ply", system.keyframes,
                                     c_conf_threshold=0.0)
    assert ply.exists() and ply.stat().st_size > 100


def test_checkpointable_state(tiny_system):
    """SLAM runtime state is a plain pytree -> trivially checkpointable
    (SURVEY.md §5.4: the reference cannot resume mid-run; we can)."""
    kf = tiny_system.keyframes
    state = {
        "T_WC": kf.T_WC, "X": kf.X, "C": kf.C, "N": kf.N,
        "feat": kf.feat, "pos": kf.pos,
        "edges": {
            "ii": tiny_system.factor_graph.ii,
            "jj": tiny_system.factor_graph.jj,
            "idx": tiny_system.factor_graph.idx_ii2jj,
            "valid": tiny_system.factor_graph.valid_match,
            "Q": tiny_system.factor_graph.Q,
        },
    }
    flat, treedef = jax.tree_util.tree_flatten(state)
    assert all(hasattr(x, "shape") for x in flat)
    rebuilt = jax.tree_util.tree_unflatten(treedef, flat)
    np.testing.assert_array_equal(np.asarray(rebuilt["T_WC"]),
                                  np.asarray(kf.T_WC))


def test_metrics_and_invariants(tmp_path):
    import jax

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.models import TINY, init_params
    from mast3r_slam_tpu.slam.system import SLAMSystem
    from mast3r_slam_tpu.utils.metrics import Metrics

    cfg = dict(config_mod.default_config())
    params = init_params(jax.random.PRNGKey(0), TINY)
    h, w = TINY.img_size
    m = Metrics(tmp_path / "metrics.jsonl")
    system = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=4,
                        edge_capacity=8, metrics=m, debug_checks=True)
    rng = np.random.default_rng(1)
    for i in range(3):
        frame = system.make_frame(
            i, rng.standard_normal((h, w, 3)).astype(np.float32))
        system.process_frame(frame)
        while system.backend_step():
            pass
    system.check_invariants()
    if len(system.keyframes) and system.stats["keyframes"] < 3:
        pass  # tracking may keyframe every frame with random weights
    assert (tmp_path / "metrics.jsonl").exists()
    lines = (tmp_path / "metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 1
    import json

    row = json.loads(lines[0])
    assert row["event"] == "track"
    assert "match_frac" in row


def test_tracking_failure_triggers_reloc(tiny_system):
    """Failure-detection tier (a): low match fraction -> frame skipped,
    relocalization requested (spec: tracker.py:67-70)."""
    import dataclasses

    from mast3r_slam_tpu.slam import tracker as tracker_mod

    system = tiny_system
    if len(system.keyframes) == 0:
        rng = np.random.default_rng(3)
        h, w = TINY.img_size
        f = system.make_frame(0, rng.standard_normal((h, w, 3)).astype(np.float32))
        system.process_frame(f)
    # force an impossible match-fraction gate
    old = system.tracker.tcfg
    system.tracker.tcfg = old._replace(min_match_frac=1.1)
    try:
        rng = np.random.default_rng(4)
        h, w = TINY.img_size
        f = system.make_frame(99, rng.standard_normal((h, w, 3)).astype(np.float32))
        new_kf, try_reloc = system.tracker.track(f)
        assert try_reloc and not new_kf
    finally:
        system.tracker.tcfg = old


def test_fused_and_step_tracking_agree():
    """The single-dispatch fused tracking path must produce the same state
    updates as the step-by-step (reference-shaped) path."""
    import copy

    import jax

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.slam.system import SLAMSystem

    cfg = dict(config_mod.default_config())
    params = init_params(jax.random.PRNGKey(0), TINY)
    h, w = TINY.img_size
    rng = np.random.default_rng(7)
    imgs = [rng.standard_normal((h, w, 3)).astype(np.float32)
            for _ in range(3)]

    def run(fused):
        system = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=4,
                            edge_capacity=8)
        system.tracker.fused = fused
        outs = []
        for i, img in enumerate(imgs):
            frame = system.make_frame(i, img)
            system.process_frame(frame)
            outs.append((system.mode, len(system.keyframes)))
        return system, outs

    sys_f, out_f = run(True)
    sys_s, out_s = run(False)
    assert out_f == out_s
    n = len(sys_f.keyframes)
    np.testing.assert_allclose(
        np.asarray(sys_f.keyframes.T_WC[:n]),
        np.asarray(sys_s.keyframes.T_WC[:n]), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sys_f.keyframes.X[:n]),
        np.asarray(sys_s.keyframes.X[:n]), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(sys_f.keyframes.C[:n]),
        np.asarray(sys_s.keyframes.C[:n]), atol=1e-3)


def test_loop_closure_fires_on_revisit():
    """Deterministic loop closure: a revisited view has identical encoder
    features -> retrieval must return it and the factor graph must accept
    the edge (identical pointmaps match perfectly), then global BA runs."""
    import jax

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.slam import retrieval as retrieval_mod
    from mast3r_slam_tpu.slam.system import SLAMSystem

    cfg = dict(config_mod.default_config())
    params = init_params(jax.random.PRNGKey(0), TINY)
    h, w = TINY.img_size
    rparams = retrieval_mod.init_retrieval_params(
        jax.random.PRNGKey(1), backbone_dim=TINY.enc_embed_dim,
        proj_dim=32, codebook_size=128)
    system = SLAMSystem(params, TINY, cfg, (h, w), retrieval_params=rparams,
                        keyframe_capacity=8, edge_capacity=16)

    rng = np.random.default_rng(11)
    imgs = [rng.standard_normal((h, w, 3)).astype(np.float32)
            for _ in range(3)]

    # manually append keyframes A, B, C (C == A revisit)
    for i, img in enumerate([imgs[0], imgs[1], imgs[0]]):
        frame = system.make_frame(i, img)
        from mast3r_slam_tpu.slam.system import _mono_init

        X, C = _mono_init(system.params, TINY, frame.feat[None],
                          frame.pos[None], 1)
        frame.update_pointmap(X[0], C[0], "weighted_pointmap")
        system.keyframes.append(frame)
        inds = system.retrieval.update(frame.feat, add_after_query=True,
                                       k=3, min_thresh=0.0)
        if i == 2:
            assert 0 in inds, f"revisit not retrieved: {inds}"

    # with random weights the two decoder heads produce unrelated pointmaps,
    # so the geometric gate would reject any edge; threshold 0 exercises the
    # edge-append + two-way storage + BA plumbing deterministically (the
    # retrieval hit above is the meaningful revisit check)
    ok = system.factor_graph.add_factors([0], [2], min_match_frac=0.0)
    assert ok
    assert system.factor_graph.n_edges == 2  # two-way storage
    system.factor_graph.solve_GN_rays()
    n = len(system.keyframes)
    assert np.all(np.isfinite(np.asarray(system.keyframes.T_WC[:n])))


def test_threaded_backend_mode():
    """single_thread: False runs the backend in a host thread concurrently
    with tracking (donation-safe buffers); results stay finite/consistent."""
    import jax

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.slam.frame import Mode
    from mast3r_slam_tpu.slam.system import SLAMSystem

    cfg = dict(config_mod.default_config())
    cfg["single_thread"] = False
    params = init_params(jax.random.PRNGKey(0), TINY)
    h, w = TINY.img_size
    system = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=8,
                        edge_capacity=16)
    assert not system.single_thread

    ds = _SynthDataset(n=5)
    ds.img_size = 512

    class _NoResize:
        """feed frames at model resolution directly"""

    # drive via the public run() loop but with pre-sized frames
    import types

    def run_small(self, dataset, max_frames=None, progress=False):
        return SLAMSystem.run(self, dataset, max_frames, progress)

    # monkeypatch resize to identity for the tiny fixture
    from mast3r_slam_tpu.io import image as image_mod

    orig = image_mod.resize_img
    image_mod.resize_img = lambda img, size=512, **kw: {
        "img": (img - img.mean()) / (img.std() + 1e-6),
        "unnormalized": img,
        "true_shape": img.shape[:2],
    }
    try:
        stats = system.run(ds, progress=False)
    finally:
        image_mod.resize_img = orig
    assert system.mode == Mode.TERMINATED
    assert stats["keyframes"] >= 1
    n = len(system.keyframes)
    assert np.all(np.isfinite(np.asarray(system.keyframes.T_WC[:n])))


def test_mismatched_frame_shape_fails_loudly():
    """A frame at a different working resolution (e.g. a ragged video tail)
    must raise a clear error, not an opaque reshape deep in the model."""
    import pytest

    cfg = dict(config_mod.default_config())
    params = init_params(jax.random.PRNGKey(0), TINY)
    h, w = TINY.img_size
    system = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=4,
                        edge_capacity=8)
    bad = np.zeros((h - 16, w, 3), np.float32)
    with pytest.raises(ValueError, match="resized to"):
        system.make_frame(0, bad)


def test_successful_relocalization_resumes_tracking():
    """Full reloc flow (SURVEY.md §3.3): a violent jump breaks tracking ->
    RELOC; the next frame REVISITS a mapped pose, retrieval proposes it,
    the strict edge gate accepts, the pose is seeded from the graph and
    the mode returns to TRACKING with stats['relocs'] == 1."""
    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.models import oracle
    from mast3r_slam_tpu.models.mast3r import MASt3RConfig
    from mast3r_slam_tpu.slam import retrieval as retrieval_mod

    CFG = MASt3RConfig(img_size=(64, 96), enc_embed_dim=64, desc_dim=8,
                       dtype="float32")
    h, w = CFG.img_size
    # frames 0..4 smooth; frame 5 teleports far away (tracking failure);
    # frame 6 back at frame 1's pose (revisit -> reloc target)
    Ts = [sim3.identity()]
    for i in range(1, 5):
        Ts.append(sim3.mul(Ts[-1], sim3.exp(jnp.array(
            [0.18, 0.0, 0.04, 0.0, 0.06, 0.0, 0.0]))))
    Ts.append(sim3.mul(Ts[-1], sim3.exp(jnp.array(
        [9.0, 6.0, -4.0, 0.0, 2.8, 0.0, 0.0]))))   # frame 5: jump
    Ts.append(Ts[1])                                # frame 6: revisit
    traj = jnp.stack(Ts)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    cfg = dict(config_mod.default_config())
    cfg["tracking"] = dict(cfg["tracking"])
    cfg["tracking"]["match_frac_thresh"] = 0.95
    cfg["retrieval"] = dict(cfg["retrieval"])
    cfg["retrieval"]["min_thresh"] = 0.0   # random-projection retriever
    rparams = retrieval_mod.init_retrieval_params(
        jax.random.PRNGKey(7), backbone_dim=CFG.enc_embed_dim,
        proj_dim=32, codebook_size=64)
    system = SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                        edge_capacity=64, model_module=oracle,
                        retrieval_params=rparams)
    for i in range(7):
        frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
        system.process_frame(frame)
        while system.backend_step():
            pass
    assert system.stats["skipped"] >= 1          # the jump broke tracking
    assert system.stats["relocs"] == 1, system.stats
    assert system.mode == Mode.TRACKING
    # the relocalized frame was adopted as a keyframe with a pose near
    # the revisited one (graph-seeded + solved)
    n = len(system.keyframes)
    T_last = np.asarray(system.keyframes.T_WC[n - 1])
    T_gt = np.asarray(traj[6])
    assert np.linalg.norm(T_last[:3] - T_gt[:3]) < 0.5, (T_last, T_gt)
