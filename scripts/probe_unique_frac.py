#!/usr/bin/env python
"""Why does the oracle fixture's unique_frac sit at the keyframe threshold?

VERDICT r4 directive #4: natural-cadence keyframing is degenerate on the
bench fixture because unique_frac (fraction of frame pixels that are some
keyframe pixel's match target, tracker.py:104-110 semantics) is ~0.32 from
frame 1 — at the 0.333 threshold — instead of decaying from ~1 with
viewpoint change. This probe measures uf(frame) against keyframe 0 for
scene/descriptor variants to find a fixture where natural cadence is
meaningful.

Run CPU:  JAX_PLATFORMS=cpu python scripts/probe_unique_frac.py
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import oracle
from mast3r_slam_tpu.models.mast3r import MASt3RConfig
from mast3r_slam_tpu.ops import matching

H, W = 192, 256     # reduced-res stand-in for 384x512 (same aspect)


def make_traj(n, step_scale=1.0):
    Ts = [sim3.identity()]
    for i in range(1, n):
        xi = jnp.asarray([0.03, 0.01 * np.sin(i / 5.0), 0.008,
                          0.0, 0.012, 0.002, 0.0]) * step_scale
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


def uf_curve(params, cfg, mcfg_kwargs, n=13):
    """unique_frac + match_frac_k of frame k vs keyframe 0."""
    n_pix = H * W
    out = []
    idx_init = jnp.arange(n_pix, dtype=jnp.int32)[None]
    for k in range(1, n):
        feat_f, pos_f = oracle.encode_fid(params, jnp.asarray([k]), cfg)
        feat_k, pos_k = oracle.encode_fid(params, jnp.asarray([0]), cfg)
        X, C, D, Q = oracle.inference_asymmetric(params, feat_f, pos_f,
                                                 feat_k, pos_k, cfg)
        idx, valid = matching.match(X[0:1], X[1:2], D[0:1], D[1:2],
                                    idx_1_to_2_init=idx_init,
                                    **mcfg_kwargs)
        idx_init = idx
        v = np.asarray(valid[0, :, 0])
        ix = np.asarray(idx[0])
        hit = np.zeros(n_pix, bool)
        hit[ix[v]] = True
        uf = hit.sum() / n_pix
        mf = v.mean()
        out.append((uf, mf))
    return out


def main():
    cfg = MASt3RConfig(img_size=(H, W), enc_embed_dim=64, desc_dim=8,
                       dtype="float32")
    tpu_fast_m = dict(max_iter=0, coarse_iter=3, radius=2, dilation_max=1,
                      lambda_init=1e-8, convergence_thresh=1e-6,
                      dist_thresh=0.1)
    traj = make_traj(13)

    variants = {
        "baseline (desc 2.0, 1 sphere)": dict(),
        "sharp desc 20": dict(desc_freq=20.0),
        "sharp desc 60": dict(desc_freq=60.0),
        "clutter (9 spheres)": dict(scene="cluttered"),
        "clutter + sharp 20": dict(scene="cluttered", desc_freq=20.0),
    }
    for name, kw in variants.items():
        try:
            params = oracle.make_params(traj, desc_dim=cfg.desc_dim, **kw)
        except TypeError as e:
            print(f"{name:28s} SKIP ({e})")
            continue
        curve = uf_curve(params, cfg, tpu_fast_m)
        ufs = " ".join(f"{u:.2f}" for u, _ in curve)
        mfs = " ".join(f"{m:.2f}" for _, m in curve)
        print(f"{name:28s} uf: {ufs}")
        print(f"{'':28s} mf: {mfs}")




def main2():
    """Cadence scan: with sharp descriptors, which motion scale yields a
    natural keyframe every ~5-10 frames (uf crossing 0.333)?"""
    cfg = MASt3RConfig(img_size=(H, W), enc_embed_dim=64, desc_dim=8,
                       dtype="float32")
    tpu_fast_m = dict(max_iter=0, coarse_iter=3, radius=2, dilation_max=1,
                      lambda_init=1e-8, convergence_thresh=1e-6,
                      dist_thresh=0.1)
    for ss in (2.0, 3.0, 4.0):
        traj = make_traj(13, step_scale=ss)
        params = oracle.make_params(traj, desc_dim=cfg.desc_dim,
                                    desc_freq=20.0)
        curve = uf_curve(params, cfg, tpu_fast_m)
        ufs = " ".join(f"{u:.2f}" for u, _ in curve)
        mfs = " ".join(f"{m:.2f}" for _, m in curve)
        print(f"step x{ss:.0f} desc20            uf: {ufs}")
        print(f"{'':28s} mf: {mfs}")


if __name__ == "__main__":
    import sys as _s
    if "--cadence" in _s.argv:
        main2()
        raise SystemExit
    main()
