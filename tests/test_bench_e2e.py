"""CPU smoke test of the end-to-end benchmark path (bench.py).

Runs the EXACT bench_e2e code (timing-faithful oracle module, health
assertions, warm+timed passes) at the TINY model size so the headline
benchmark logic is validated before it ever touches the chip — the
round-2 bench shipped a number from a degenerate run precisely because its
path had no health gate and no CPU-testable harness.
"""

import pathlib
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from mast3r_slam_tpu.models import TINY, init_params
from mast3r_slam_tpu.slam import retrieval as retrieval_mod


def test_bench_e2e_tiny_healthy():
    import bench

    h, w = TINY.img_size
    net_params = init_params(jax.random.PRNGKey(0), TINY)
    rparams = retrieval_mod.init_retrieval_params(
        jax.random.PRNGKey(1), backbone_dim=TINY.enc_embed_dim,
        proj_dim=64, codebook_size=256)

    fps, sys_t, all_fps = bench.bench_e2e(net_params, rparams, TINY, h, w,
                                          W=4, kf_every=4, n_frames=17)
    assert all_fps == [fps]
    assert fps > 0
    st = sys_t.stats
    assert st["skipped"] == 0 and st["reloc_failed"] == 0
    assert st["keyframes"] == 5            # ids 0, 4, 8, 12, 16
    assert sys_t.factor_graph.n_edges > 0


def test_bench_health_gate_rejects_degenerate_run():
    """_assert_healthy must refuse to bless a reloc-storm run."""
    import bench

    class _Sys:
        pass

    from mast3r_slam_tpu.slam.frame import Mode

    class _FG:
        n_edges = 0

    s = _Sys()
    s.stats = {"skipped": 1, "keyframes": 1, "loop_closures": 0,
               "relocs": 0, "reloc_failed": 30, "reinits": 0,
               "frames_tracking": 10, "frames_reloc": 30,
               "frames_init": 1}
    s.mode = Mode.TERMINATED
    s.factor_graph = _FG()
    with pytest.raises(RuntimeError, match="UNHEALTHY"):
        bench._assert_healthy(s, 49, 4)


def test_oracle_timing_outputs_match_oracle_exactly():
    """oracle_timing must return the oracle's predictions (the real network
    only rides along for timing) — so every oracle-based accuracy
    regression transfers to the benchmark's model module. Tolerances are
    ~1 ulp: differences come only from XLA fusing the raycast differently
    inside the combined program, never from the network outputs leaking."""
    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.models import oracle, oracle_timing

    h, w = TINY.img_size
    traj = jax.numpy.stack([sim3.identity(),
                            sim3.exp(jax.numpy.asarray(
                                [0.1, 0.0, 0.02, 0.0, 0.03, 0.0, 0.0]))])
    oparams = oracle.make_params(traj, desc_dim=TINY.desc_dim)
    net_params = init_params(jax.random.PRNGKey(0), TINY)
    params = oracle_timing.make_params(net_params, oparams)

    img0 = oracle_timing.make_frame_image(0, h, w)
    img1 = oracle_timing.make_frame_image(1, h, w)
    imgs = jax.numpy.stack([jax.numpy.asarray(img0),
                            jax.numpy.asarray(img1)])
    feat, pos = oracle_timing.encode(params, imgs, TINY)

    # frame ids decoded through the uint8 protocol
    fid = np.asarray(oracle_timing._fid_from_image(imgs))
    np.testing.assert_array_equal(fid, [0, 1])
    # and through the normalized-float path
    fimg = (imgs.astype(jax.numpy.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_array_equal(
        np.asarray(oracle_timing._fid_from_image(fimg)), [0, 1])

    feat_o, pos_o = oracle.encode_fid(
        oparams, jax.numpy.asarray([0, 1]), TINY)
    # tight allclose, not equality: the raycast fuses differently inside
    # oracle_timing's larger jit (1-ulp-level reassociation), while _carry
    # itself adds exactly 0.0
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_o),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos_o))

    X, C, D, Q = oracle_timing.inference_asymmetric(
        params, feat[0:1], pos[0:1], feat[1:2], pos[1:2], TINY)
    Xo, Co, Do, Qo = oracle.inference_asymmetric(
        oparams, feat_o[0:1], pos_o[0:1], feat_o[1:2], pos_o[1:2], TINY)
    np.testing.assert_allclose(np.asarray(X), np.asarray(Xo),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(D), np.asarray(Do),
                               rtol=1e-5, atol=1e-5)


def test_health_gate_natural_cadence_bounds():
    """kf_every=0 (natural keyframing): the gate must reject both the
    keyframe-every-frame storm (the degenerate regime DEVELOPMENT.md
    documents) and a dead cadence, and accept a live middle."""
    import bench
    from mast3r_slam_tpu.slam.frame import Mode

    class _FG:
        n_edges = 10

    def sys_with(kf, n_frames):
        s = type("S", (), {})()
        s.stats = {"skipped": 0, "keyframes": kf, "loop_closures": 2,
                   "relocs": 0, "reloc_failed": 0, "reinits": 0,
                   "frames_tracking": n_frames - 1, "frames_reloc": 0,
                   "frames_init": 1}
        s.mode = Mode.TERMINATED
        s.factor_graph = _FG()
        return s

    bench._assert_healthy(sys_with(10, 65), 65, kf_every=0)   # live

    import pytest

    with pytest.raises(RuntimeError, match="degenerate natural cadence"):
        bench._assert_healthy(sys_with(64, 65), 65, kf_every=0)  # storm
    with pytest.raises(RuntimeError, match="degenerate natural cadence"):
        bench._assert_healthy(sys_with(1, 65), 65, kf_every=0)   # dead
