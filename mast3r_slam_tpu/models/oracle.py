"""Oracle pointmap predictor: ground-truth geometry in the MASt3R API.

Implements the same inference surface as ``models.mast3r`` (encode /
decode_pair / inference_{mono,asymmetric,symmetric}) but computes pointmaps,
descriptors and confidences from a known synthetic scene and ground-truth
camera trajectory instead of a network. This is the "fake pointmap
predictor" the reference lacks (SURVEY.md §4): with it, the ENTIRE SLAM
stack — matcher, tracker GN, keyframing, factor graph, global BA, retrieval,
export — runs end-to-end and its trajectory can be regression-tested
against ground truth (ATE), independent of model weights.

Scene: a sphere in front of a background plane (closed-form raycast).
Frame identity travels through the pipeline inside the encoder-feature
arrays (the pipeline treats features as opaque): token 0's last channel
carries the frame index; the remaining channels hold patch-center world
coordinates so retrieval similarity reflects true viewpoint overlap.
Descriptors are a smooth function of the WORLD point seen by each pixel, so
the same surface point gets the same descriptor in every view (what a
trained MASt3R provides).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lie import sim3
from .mast3r import MASt3RConfig, downsample_maps


def make_params(traj_WC, desc_dim: int = 8, sphere_center=(0.0, 0.0, 4.0),
                sphere_radius: float = 1.5, plane_z: float = 7.0, seed: int = 0,
                pix_noise: float = 0.0, desc_freq: float = 2.0,
                scene: str = "default"):
    """Oracle 'weights': ground-truth trajectory + scene + descriptor field.

    ``desc_freq`` scales the descriptor field's spatial frequency — the
    default smooth field makes neighbouring pixels near-indistinguishable
    inside the refine window, which collapses unique_frac to ~1/3 under any
    motion (the degenerate natural-cadence regime, DEVELOPMENT.md round-4
    note). ``scene="cluttered"`` replaces the single sphere with a spread of
    spheres at varied depths (parallax everywhere); together these make the
    keyframe statistic decay with viewpoint change the way real texture
    does, so match-fraction keyframing (tracker.py:104-110) is exercised
    meaningfully.
    """
    key = jax.random.PRNGKey(seed)
    params = {
        "traj": jnp.asarray(traj_WC, jnp.float32),        # (N, 8) Sim3 T_WC
        "desc_proj": jax.random.normal(key, (3, desc_dim)) * desc_freq,
        "sphere_c": jnp.asarray(sphere_center, jnp.float32),
        "sphere_r": jnp.asarray(sphere_radius, jnp.float32),
        "plane_z": jnp.asarray(plane_z, jnp.float32),
        "pix_noise": jnp.asarray(pix_noise, jnp.float32),
    }
    if scene == "cluttered":
        kc, kr = jax.random.split(jax.random.fold_in(key, 17))
        K = 9
        gx = jnp.tile(jnp.linspace(-2.2, 2.2, 3), 3)
        gy = jnp.repeat(jnp.linspace(-1.4, 1.4, 3), 3)
        centers = jnp.stack([
            gx + 0.35 * jax.random.normal(kc, (K,)),
            gy + 0.25 * jax.random.normal(jax.random.fold_in(kc, 1), (K,)),
            3.0 + 3.2 * jax.random.uniform(jax.random.fold_in(kc, 2), (K,)),
        ], axis=-1)
        radii = 0.45 + 0.45 * jax.random.uniform(kr, (K,))
        params["spheres_c"] = centers
        params["spheres_r"] = radii
    return params


def make_frame_image(frame_id: int, h: int, w: int):
    """Input 'image' carrying the frame index (the oracle's encode reads it
    back; content is otherwise irrelevant)."""
    import numpy as np

    img = np.zeros((h, w, 3), np.float32)
    img[0, 0, 0] = frame_id / 1024.0
    return img


def _intrinsics(cfg: MASt3RConfig):
    h, w = cfg.img_size
    f = 0.8 * w
    return f, f, w / 2.0, h / 2.0


def _raycast_world(params, T_WC, cfg: MASt3RConfig):
    """World-space hit points of every pixel ray of a camera at T_WC."""
    h, w = cfg.img_size
    fx, fy, cx, cy = _intrinsics(cfg)
    v, u = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                        jnp.arange(w, dtype=jnp.float32), indexing="ij")
    dirs = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], -1)
    dirs = dirs.reshape(-1, 3)

    t, q, s = sim3.parts(T_WC)
    dir_w = s * sim3.quat_act(q, dirs)
    a = jnp.sum(dir_w * dir_w, axis=-1)
    if "spheres_c" in params:   # cluttered scene: nearest of K spheres
        oc = t[None, :] - params["spheres_c"]              # (K, 3)
        b = 2.0 * dir_w @ oc.T                             # (n, K)
        c = jnp.sum(oc * oc, axis=-1) - params["spheres_r"] ** 2
        disc = b * b - 4.0 * a[:, None] * c[None, :]
        sk = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * a[:, None])
        ok = (disc > 0) & (sk > 1e-3)
        sk = jnp.where(ok, sk, jnp.inf)
        s_sph = jnp.min(sk, axis=-1)
        hit = jnp.isfinite(s_sph)
        s_sph = jnp.where(hit, s_sph, 0.0)
    else:
        oc = t - params["sphere_c"]
        b = 2.0 * dir_w @ oc
        c = jnp.dot(oc, oc) - params["sphere_r"] ** 2
        disc = b * b - 4 * a * c
        hit = disc > 0
        s_sph = (-b - jnp.sqrt(jnp.maximum(disc, 0.0))) / (2 * a)
        hit = hit & (s_sph > 1e-3)
    # background plane z = plane_z (world)
    denom = dir_w[:, 2]
    s_pl = (params["plane_z"] - t[2]) / jnp.where(jnp.abs(denom) < 1e-6,
                                                  1e-6, denom)
    s_hit = jnp.where(hit, s_sph, s_pl)
    return t + s_hit[:, None] * dir_w                     # (h*w, 3) world


def _descriptors(params, Xw):
    d = jnp.sin(Xw @ params["desc_proj"])
    return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)


@partial(jax.jit, static_argnames=("cfg",))
def render_rgb(params, frame_id, cfg: MASt3RConfig):
    """View-consistent textured rendering of the oracle scene: (h, w, 3)
    float32 in [0, 1].

    The color of a pixel is a multi-frequency function of the WORLD point
    it sees, so the same surface point looks the same from every view —
    what a real camera provides. Used by the real-geometry rehearsal
    (scripts/distill_oracle.py): a REAL MASt3R architecture trained on
    these images learns actual two-view geometry, which the full SLAM
    pipeline then consumes through the released-checkpoint path."""
    h, w = cfg.img_size
    T = params["traj"][jnp.asarray(frame_id, jnp.int32)]
    Xw = _raycast_world(params, T, cfg)
    key = jax.random.PRNGKey(42)
    p1 = jax.random.normal(jax.random.fold_in(key, 1), (3, 3)) * 3.0
    p2 = jax.random.normal(jax.random.fold_in(key, 2), (3, 3)) * 11.0
    p3 = jax.random.normal(jax.random.fold_in(key, 3), (3, 3)) * 29.0
    c = (0.5 + 0.25 * jnp.sin(Xw @ p1) + 0.15 * jnp.sin(Xw @ p2)
         + 0.10 * jnp.sin(Xw @ p3))
    # mild depth shading so surfaces are distinguishable even where the
    # texture phases align
    z = jnp.linalg.norm(Xw - sim3.parts(T)[0][None], axis=-1, keepdims=True)
    c = c * (1.15 - 0.05 * z)
    return jnp.clip(c, 0.0, 1.0).reshape(h, w, 3)


def _frame_pose(params, feat):
    fid = feat[:, 0, -1].astype(jnp.int32)                # (b,)
    return params["traj"][fid]                            # (b, 8)


@partial(jax.jit, static_argnames=("cfg",))
def encode(params, img, cfg: MASt3RConfig):
    """Reads the frame id from the image; emits id + patch-center world
    coordinates as the 'encoder features' (for retrieval overlap)."""
    from .mast3r import normalize_frames

    img = normalize_frames(img)   # encode contract: uint8 ingest works
    fid = jnp.round(img[:, 0, 0, 0] * 1024.0).astype(jnp.int32)
    return encode_fid(params, fid, cfg)


def encode_fid(params, fid, cfg: MASt3RConfig):
    """Oracle features for frame ids ``fid`` (b,) — the encode body, split
    out so alternative frame-id protocols (models.oracle_timing's uint8
    two-byte pixel encoding) can reuse it."""
    b = fid.shape[0]
    T = params["traj"][fid]

    h, w = cfg.img_size
    ps = cfg.patch_size
    nh, nw = h // ps, w // ps
    n = nh * nw

    def one(Tb):
        Xw = _raycast_world(params, Tb, cfg).reshape(h, w, 3)
        centers = Xw[ps // 2::ps, ps // 2::ps].reshape(n, 3)
        return centers

    centers = jax.vmap(one)(T)                            # (b, n, 3)
    feat = jnp.zeros((b, n, cfg.enc_embed_dim), jnp.float32)
    reps = -(-cfg.enc_embed_dim // 3)
    tiled = jnp.tile(centers, (1, 1, reps))[:, :, :cfg.enc_embed_dim]
    feat = feat + tiled
    feat = feat.at[:, 0, -1].set(fid.astype(jnp.float32))
    ys = jnp.repeat(jnp.arange(nh, dtype=jnp.int32), nw)
    xs = jnp.tile(jnp.arange(nw, dtype=jnp.int32), nh)
    pos = jnp.broadcast_to(jnp.stack([ys, xs], -1), (b, n, 2))
    return feat, pos


@partial(jax.jit, static_argnames=("cfg",))
def decode_pair(params, feat1, pos1, feat2, pos2, cfg: MASt3RConfig):
    """Ground-truth two-view 'inference': view1's pointmap in view1's frame
    (head1) and view2's pointmap in view1's frame (head2)."""
    h, w = cfg.img_size
    T1 = _frame_pose(params, feat1)
    T2 = _frame_pose(params, feat2)

    def one(T1b, T2b, k):
        Xw1 = _raycast_world(params, T1b, cfg)
        Xw2 = _raycast_world(params, T2b, cfg)
        T1_inv = sim3.inv(T1b)
        X11 = sim3.act(T1_inv, Xw1)
        X21 = sim3.act(T1_inv, Xw2)
        if_noise = params["pix_noise"]
        n1 = jax.random.normal(jax.random.PRNGKey(0), X11.shape) * if_noise
        n2 = jax.random.normal(jax.random.PRNGKey(1), X21.shape) * if_noise
        return (X11 + n1, X21 + n2, _descriptors(params, Xw1),
                _descriptors(params, Xw2))

    X11, X21, D11, D21 = jax.vmap(one)(T1, T2, jnp.arange(T1.shape[0]))
    b = T1.shape[0]
    conf = jnp.full((b, h, w), 2.5, jnp.float32)
    res1 = {"pts3d": X11.reshape(b, h, w, 3), "conf": conf,
            "desc": D11.reshape(b, h, w, -1), "desc_conf": conf}
    res2 = {"pts3d": X21.reshape(b, h, w, 3), "conf": conf,
            "desc": D21.reshape(b, h, w, -1), "desc_conf": conf}
    return res1, res2


def inference_mono(params, feat, pos, cfg: MASt3RConfig, ds: int = 1):
    res1, _ = decode_pair(params, feat, pos, feat, pos, cfg)
    b = feat.shape[0]
    X, C = downsample_maps(res1["pts3d"], res1["conf"][..., None], ds=ds)
    return X.reshape(b, -1, 3), C.reshape(b, -1, 1)


def inference_asymmetric(params, feat_f, pos_f, feat_k, pos_k, cfg):
    res1, res2 = decode_pair(params, feat_f, pos_f, feat_k, pos_k, cfg)
    X = jnp.concatenate([res1["pts3d"], res2["pts3d"]], axis=0)
    C = jnp.concatenate([res1["conf"], res2["conf"]], axis=0)
    D = jnp.concatenate([res1["desc"], res2["desc"]], axis=0)
    Q = jnp.concatenate([res1["desc_conf"], res2["desc_conf"]], axis=0)
    return X, C, D, Q


def inference_symmetric(params, feat_i, pos_i, feat_j, pos_j, cfg):
    b = feat_i.shape[0]
    f1 = jnp.concatenate([feat_i, feat_j], axis=0)
    p1 = jnp.concatenate([pos_i, pos_j], axis=0)
    f2 = jnp.concatenate([feat_j, feat_i], axis=0)
    p2 = jnp.concatenate([pos_j, pos_i], axis=0)
    res1, res2 = decode_pair(params, f1, p1, f2, p2, cfg)
    out = {}
    out["Xii"], out["Xjj"] = res1["pts3d"][:b], res1["pts3d"][b:]
    out["Cii"], out["Cjj"] = res1["conf"][:b], res1["conf"][b:]
    out["Dii"], out["Djj"] = res1["desc"][:b], res1["desc"][b:]
    out["Qii"], out["Qjj"] = res1["desc_conf"][:b], res1["desc_conf"][b:]
    out["Xji"], out["Xij"] = res2["pts3d"][:b], res2["pts3d"][b:]
    out["Cji"], out["Cij"] = res2["conf"][:b], res2["conf"][b:]
    out["Dji"], out["Dij"] = res2["desc"][:b], res2["desc"][b:]
    out["Qji"], out["Qij"] = res2["desc_conf"][:b], res2["desc_conf"][b:]
    return out
