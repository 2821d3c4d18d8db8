"""Data-parallel multi-sequence tracking over a device mesh (serving mode).

The reference tracks ONE stream on one GPU (main.py:236-313). For serving,
the TPU-native scale-out is sequence-level data parallelism: S independent
video streams, each with its own keyframe store and tracker state, mapped
one-per-device over a ``seq`` mesh axis with the model weights replicated.
Each device runs the SAME fused window program as the single-chip frontend
(``slam.system._track_window_body``) on its own stream — per-sequence
results are bit-identical to S independent single-chip runs (tested), and
throughput scales linearly by construction (no cross-sequence
communication; weights ride ICI broadcast once).

Host usage: keep one ``SLAMSystem``-style bookkeeping loop per sequence and
feed the stacked image batches here; the (S, W, 8) stats block is the only
per-window readback.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..slam.system import _track_window_body


def shard_sequences(mesh: Mesh, tree, axis: str = "seq"):
    """Place leading-axis-S arrays of a pytree onto the mesh's seq axis."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


@partial(jax.jit,
         static_argnames=("cfg", "mcfg", "tcfg", "ds", "fuse_mode",
                          "score_fn", "use_calib", "img_size", "window",
                          "model_mod", "mesh"),
         donate_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18))
def track_window_dp(params, cfg, mcfg, tcfg, imgs, frame_ids, idx_init,
                    prev_T_WC, K, last_idx,
                    kX, kC, kN, kNU, kscore, kT, kfeat, kpos, kdix,
                    ds: int, fuse_mode: str, score_fn: str,
                    use_calib: bool, img_size, window: int, model_mod,
                    mesh: Mesh):
    """Run the fused tracking window for S sequences, one per device.

    Every array argument carries a leading sequence axis S (== mesh size
    along ``seq``); ``params`` is replicated. Returns a ``WindowOut`` whose
    leaves carry the same leading S axis. Keyframe-store buffers are
    donated exactly like the single-sequence path.
    """
    shard_map = jax.shard_map

    seq_args = (imgs, frame_ids, idx_init, prev_T_WC, K, last_idx,
                kX, kC, kN, kNU, kscore, kT, kfeat, kpos, kdix)
    n_seq_devices = mesh.shape["seq"]
    if imgs.shape[0] != n_seq_devices:
        raise ValueError(
            f"track_window_dp maps one sequence per device: got S = "
            f"{imgs.shape[0]} sequences on a {n_seq_devices}-device seq "
            "axis (a larger S would silently drop sequences)")

    def one(params, *args):
        # per-shard leading dim is S / n_devices == 1
        unbatched = tuple(a[0] for a in args)
        out = _track_window_body(
            params, cfg, mcfg, tcfg, *unbatched, ds, fuse_mode, score_fn,
            use_calib, img_size, window, model_mod)
        return jax.tree.map(lambda a: a[None], out)

    # check_vma off: loop carries inside the body start from invariant
    # constants (e.g. the matcher LM state) and become seq-varying on the
    # first iteration, which the strict varying-axes checker rejects
    fn = shard_map(one, mesh=mesh,
                   in_specs=(P(),) + (P("seq"),) * len(seq_args),
                   out_specs=P("seq"), check_vma=False)
    return fn(params, *seq_args)
