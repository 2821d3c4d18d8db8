"""Sequence-level data-parallel tracking (parallel.dp_tracking).

S independent streams, one per mesh device, running the same fused window
program — results must equal S independent single-chip runs exactly.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import oracle
from mast3r_slam_tpu.models.mast3r import MASt3RConfig
from mast3r_slam_tpu.parallel.dp_tracking import track_window_dp
from mast3r_slam_tpu.slam.factor_graph import MatchingConfig
from mast3r_slam_tpu.slam.system import _track_window_fused
from mast3r_slam_tpu.slam import tracker as tracker_mod

CFG = MASt3RConfig(img_size=(32, 48), enc_embed_dim=32, desc_dim=8,
                   dtype="float32")
W = 3
S = 2


def _traj(n):
    Ts = [sim3.identity()]
    for i in range(1, n):
        xi = jnp.array([0.15, 0.03 * np.sin(i / 2), 0.03,
                        0.0, 0.05, 0.01, 0.0])
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


def _seq_inputs(params, first_frame):
    """Keyframe store seeded at frame ``first_frame``; window = the next W
    frames (mirrors SLAMSystem INIT -> TRACKING)."""
    h, w = CFG.img_size
    n = h * w
    cap = 8
    img_k = oracle.make_frame_image(first_frame, h, w)[None]
    feat, pos = oracle.encode(params, img_k, CFG)
    Xk, Ck = oracle.inference_mono(params, feat, pos, CFG)
    bufs = dict(
        kX=jnp.zeros((cap, n, 3)).at[0].set(Xk[0]),
        kC=jnp.zeros((cap, n)).at[0].set(Ck[0, :, 0]),
        kN=jnp.zeros((cap,), jnp.int32).at[0].set(1),
        kNU=jnp.zeros((cap,), jnp.int32).at[0].set(1),
        kscore=jnp.zeros((cap,)),
        kT=jnp.zeros((cap, 8)).at[0].set(sim3.identity()),
        kfeat=jnp.zeros((cap,) + feat.shape[1:]).at[0].set(feat[0]),
        kpos=jnp.zeros((cap,) + pos.shape[1:], pos.dtype).at[0].set(pos[0]),
        kdix=jnp.zeros((cap,), jnp.int32).at[0].set(first_frame),
    )
    imgs = jnp.stack([oracle.make_frame_image(first_frame + 1 + t, h, w)
                      for t in range(W)])
    ids = jnp.arange(first_frame + 1, first_frame + 1 + W, dtype=jnp.int32)
    return imgs, ids, bufs


def test_dp_equals_independent_runs():
    if len(jax.devices()) < S:
        pytest.skip("needs >= 2 devices")
    h, w = CFG.img_size
    n = h * w
    traj = _traj(12)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)
    mcfg = MatchingConfig(dilation_max=1, max_iter=4, radius=2)
    tcfg = tracker_mod.TrackerConfig(match_frac_thresh=0.95)

    idx0 = jnp.arange(n, dtype=jnp.int32)
    K = jnp.eye(3)
    row0 = jnp.asarray(0, jnp.int32)

    seqs = [_seq_inputs(params, 0), _seq_inputs(params, 5)]

    def run_single(imgs, ids, bufs):
        return _track_window_fused(
            params, CFG, mcfg, tcfg, imgs, ids, idx0, sim3.identity(), K,
            row0, *bufs.values(), 1, "weighted_pointmap", "median", False,
            (h, w), W, oracle)

    singles = [run_single(im, ids, {k: v for k, v in bufs.items()})
               for im, ids, bufs in [(*s[:2], dict(s[2])) for s in seqs]]

    # rebuild buffers (donated above) and stack along the sequence axis
    seqs = [_seq_inputs(params, 0), _seq_inputs(params, 5)]
    stack = lambda xs: jnp.stack(list(xs))
    imgs_S = stack(s[0] for s in seqs)
    ids_S = stack(s[1] for s in seqs)
    bufs_S = [stack(s[2][k] for s in seqs) for k in seqs[0][2]]
    mesh = Mesh(np.asarray(jax.devices()[:S]), ("seq",))
    out = track_window_dp(
        params, CFG, mcfg, tcfg, imgs_S, ids_S,
        jnp.broadcast_to(idx0, (S, n)),
        jnp.broadcast_to(sim3.identity(), (S, 8)),
        jnp.broadcast_to(K, (S, 3, 3)),
        jnp.broadcast_to(row0, (S,)), *bufs_S,
        1, "weighted_pointmap", "median", False, (h, w), W, oracle, mesh)

    for s in range(S):
        for leaf_dp, leaf_1, name in zip(
                jax.tree.leaves(jax.tree.map(lambda a: a[s], out)),
                jax.tree.leaves(singles[s]),
                [f"leaf{i}" for i in range(len(jax.tree.leaves(out)))]):
            np.testing.assert_allclose(
                np.asarray(leaf_dp), np.asarray(leaf_1), rtol=0, atol=0,
                err_msg=f"seq {s} {name}")
    # sanity: at least one keyframe decision happened somewhere
    assert float(out.hoststats[..., 7].min()) >= 0.0
