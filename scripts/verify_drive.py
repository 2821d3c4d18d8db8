"""Verification drive: composed library flow on the real device.

Synthetic two-view fixture (oracle raycast) -> ops.matching.match ->
slam.tracker.opt_pose_ray_dist_sim3 -> recovered relative pose vs ground
truth. Exercises the library boundary end to end (matcher conventions:
X11 = view1's own pointmap, X21 = view2's points in view1's frame;
tracker: Xk ~ T_CkCf . Xf[idx]).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/verify_drive.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import oracle
from mast3r_slam_tpu.models.mast3r import MASt3RConfig
from mast3r_slam_tpu.ops import matching
from mast3r_slam_tpu.slam import tracker


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    cfg = MASt3RConfig(img_size=(64, 96), enc_embed_dim=64, desc_dim=8,
                       dtype="float32")
    h, w = cfg.img_size
    n = h * w

    T_WCk = sim3.identity()
    T_WCf = sim3.exp(jnp.asarray([0.15, 0.02, 0.03, 0.0, 0.04, 0.01, 0.02]))
    params = oracle.make_params(jnp.stack([T_WCk, T_WCf]), desc_dim=8)

    feat, pos = oracle.encode_fid(params, jnp.asarray([0, 1]), cfg)
    # asymmetric decode (frame | keyframe): X[0]=frame pointmap in frame
    # coords (X11), X[1]=keyframe points in frame coords (X21)
    X, C, D, Q = oracle.inference_asymmetric(
        params, feat[1:2], pos[1:2], feat[0:1], pos[0:1], cfg)

    idx, valid = matching.match(X[0:1], X[1:2], D[0:1], D[1:2])
    frac = float(valid.mean())
    print(f"match valid frac: {frac:.3f}", file=sys.stderr)
    assert frac > 0.6, frac

    # keyframe canonical pointmap (its own frame)
    Xk, Ck = oracle.inference_mono(params, feat[0:1], pos[0:1], cfg)
    Xf = X[0].reshape(n, 3)
    Xf_at = jnp.take(Xf, idx[0], axis=0)
    Qk = jnp.full((n, 1), 2.0)

    tcfg = tracker.TrackerConfig()
    res = tracker.opt_pose_ray_dist_sim3(
        Xf_at, Xk[0], sim3.identity(), Qk, valid[0], tcfg)
    assert not bool(res.failed)

    T_true = sim3.rel(T_WCk, T_WCf)          # keyframe <- frame
    err = sim3.log(sim3.mul(sim3.inv(res.T_CkCf), T_true))
    e = float(jnp.abs(err).max())
    print(f"pose error (log-Sim3 max-abs): {e:.4f}", file=sys.stderr)
    # half-pixel match quantization floor at 64x96 bounds accuracy
    assert e < 0.03, np.asarray(err)
    print("VERIFY_DRIVE_OK")


if __name__ == "__main__":
    main()
