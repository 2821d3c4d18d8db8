"""MASt3R two-view pointmap model: assembly, init, and inference APIs.

TPU-native re-design of the inference subset of the reference model stack
(AsymmetricMASt3R: /root/reference/thirdparty/mast3r/mast3r/model.py:40-68,
over the DUSt3R/CroCo backbone). Architecture constants follow the released
``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric`` checkpoint string
(thirdparty/mast3r/README.md:277): ViT-L/16 encoder (24 x 1024 x 16 heads),
dual 12-block 768-d decoders, catmlp+dpt head, pts3d+desc24, RoPE100.

Inference entry points mirror mast3r_slam/mast3r_utils.py:
``inference_mono`` (I, I), ``inference_asymmetric`` (frame vs keyframe) and
``inference_symmetric`` (both directions of an edge). All are shaped for
batching: the decoder is vmap/batch-friendly, so candidate loop-closure
edges decode data-parallel in one call (replacing the per-edge python loop
at mast3r_utils.py:83-115) and shard over device meshes along the batch dim.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import dpt, vit


class MASt3RConfig(NamedTuple):
    img_size: tuple = (384, 512)      # (h, w), landscape
    patch_size: int = 16
    enc_depth: int = 24
    enc_embed_dim: int = 1024
    enc_num_heads: int = 16
    dec_depth: int = 12
    dec_embed_dim: int = 768
    dec_num_heads: int = 12
    mlp_ratio: int = 4
    rope_base: float = 100.0
    desc_dim: int = 24
    feature_dim: int = 256            # DPT fusion width
    last_dim: int = 128               # head penultimate width
    layer_dims: tuple = (96, 192, 384, 768)
    dtype: str = "bfloat16"           # transformer compute dtype
    head_dtype: str = "float32"       # DPT-head conv dtype (fp32 = reference
                                      # parity; bf16 trades ~1e-2 head error
                                      # for an order-of-magnitude conv speedup)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def head_compute_dtype(self):
        return jnp.dtype(self.head_dtype)

    @property
    def num_patches(self):
        return (self.img_size[0] // self.patch_size) * (
            self.img_size[1] // self.patch_size
        )


TINY = MASt3RConfig(
    img_size=(64, 96), enc_depth=2, enc_embed_dim=64, enc_num_heads=4,
    dec_depth=4, dec_embed_dim=48, dec_num_heads=4, desc_dim=8,
    feature_dim=32, last_dim=16, layer_dims=(16, 16, 16, 48), dtype="float32",
)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _linear_init(key, din, dout, bias=True):
    k1, _ = jax.random.split(key)
    bound = jnp.sqrt(6.0 / (din + dout))  # xavier uniform
    p = {"w": jax.random.uniform(k1, (din, dout), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def _conv_init(key, kh, kw, cin, cout, bias=True):
    fan_in = kh * kw * cin
    bound = jnp.sqrt(1.0 / fan_in)
    p = {"w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                                 -bound, bound)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _norm_init(dim):
    return {"w": jnp.ones((dim,), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)}


def _enc_block_init(key, dim, mlp_ratio):
    ks = jax.random.split(key, 4)
    return {
        "norm1": _norm_init(dim),
        "attn": {"qkv": _linear_init(ks[0], dim, 3 * dim),
                 "proj": _linear_init(ks[1], dim, dim)},
        "norm2": _norm_init(dim),
        "mlp": {"fc1": _linear_init(ks[2], dim, mlp_ratio * dim),
                "fc2": _linear_init(ks[3], mlp_ratio * dim, dim)},
    }


def _dec_block_init(key, dim, mlp_ratio):
    ks = jax.random.split(key, 8)
    return {
        "norm1": _norm_init(dim),
        "attn": {"qkv": _linear_init(ks[0], dim, 3 * dim),
                 "proj": _linear_init(ks[1], dim, dim)},
        "norm2": _norm_init(dim),
        "norm3": _norm_init(dim),
        "norm_y": _norm_init(dim),
        "cross_attn": {"projq": _linear_init(ks[2], dim, dim),
                       "projk": _linear_init(ks[3], dim, dim),
                       "projv": _linear_init(ks[4], dim, dim),
                       "proj": _linear_init(ks[5], dim, dim)},
        "mlp": {"fc1": _linear_init(ks[6], dim, mlp_ratio * dim),
                "fc2": _linear_init(ks[7], mlp_ratio * dim, dim)},
    }


def _dpt_init(key, cfg: MASt3RConfig, num_channels: int):
    ks = jax.random.split(key, 24)
    ld = cfg.layer_dims
    fd = cfg.feature_dim
    ed, dd = cfg.enc_embed_dim, cfg.dec_embed_dim
    dims_in = [ed, dd, dd, dd]

    def rcu(k):
        k1, k2 = jax.random.split(k)
        return {"conv1": _conv_init(k1, 3, 3, fd, fd),
                "conv2": _conv_init(k2, 3, 3, fd, fd)}

    def refine(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"resConfUnit1": rcu(k1), "resConfUnit2": rcu(k2),
                "out_conv": _conv_init(k3, 1, 1, fd, fd)}

    return {
        "act_postprocess": [
            {"proj": _conv_init(ks[0], 1, 1, dims_in[0], ld[0]),
             "deconv": _conv_init(ks[1], 4, 4, ld[0], ld[0])},
            {"proj": _conv_init(ks[2], 1, 1, dims_in[1], ld[1]),
             "deconv": _conv_init(ks[3], 2, 2, ld[1], ld[1])},
            {"proj": _conv_init(ks[4], 1, 1, dims_in[2], ld[2])},
            {"proj": _conv_init(ks[5], 1, 1, dims_in[3], ld[3]),
             "conv": _conv_init(ks[6], 3, 3, ld[3], ld[3])},
        ],
        "layer_rn": [
            _conv_init(ks[7], 3, 3, ld[0], fd, bias=False),
            _conv_init(ks[8], 3, 3, ld[1], fd, bias=False),
            _conv_init(ks[9], 3, 3, ld[2], fd, bias=False),
            _conv_init(ks[10], 3, 3, ld[3], fd, bias=False),
        ],
        "refinenet1": refine(ks[11]),
        "refinenet2": refine(ks[12]),
        "refinenet3": refine(ks[13]),
        "refinenet4": refine(ks[14]),
        "head": {
            "conv1": _conv_init(ks[15], 3, 3, fd, fd // 2),
            "conv2": _conv_init(ks[16], 3, 3, fd // 2, cfg.last_dim),
            "conv3": _conv_init(ks[17], 1, 1, cfg.last_dim, num_channels),
        },
    }


def _head_init(key, cfg: MASt3RConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    idim = cfg.enc_embed_dim + cfg.dec_embed_dim
    hidden = 4 * idim
    out = (cfg.desc_dim + 1) * cfg.patch_size ** 2
    return {
        "dpt": _dpt_init(k1, cfg, num_channels=4),
        "head_local_features": {
            "fc1": _linear_init(k2, idim, hidden),
            "fc2": _linear_init(k3, hidden, out),
        },
    }


def init_params(key, cfg: MASt3RConfig):
    """Random-init full parameter pytree (same tree as checkpoint convert)."""
    ks = jax.random.split(key, 8)
    ed, dd = cfg.enc_embed_dim, cfg.dec_embed_dim
    params = {
        "patch_embed": {
            "proj": _linear_init(ks[0], cfg.patch_size ** 2 * 3, ed)
        },
        "enc_blocks": [
            _enc_block_init(jax.random.fold_in(ks[1], i), ed, cfg.mlp_ratio)
            for i in range(cfg.enc_depth)
        ],
        "enc_norm": _norm_init(ed),
        "decoder_embed": _linear_init(ks[2], ed, dd),
        # the two weight-distinct decoder streams (dust3r/model.py:72,90-97)
        # are stored STACKED along a leading stream axis (leaf shape
        # (2, ...)) so both run as one batched MXU pass per block
        # (vit.decode); stream 0 tracks dec_blocks, stream 1 dec_blocks2
        "dec_blocks_s": [
            jax.tree.map(
                lambda a, b: jnp.stack([a, b]),
                _dec_block_init(jax.random.fold_in(ks[3], i), dd,
                                cfg.mlp_ratio),
                _dec_block_init(jax.random.fold_in(ks[4], i), dd,
                                cfg.mlp_ratio))
            for i in range(cfg.dec_depth)
        ],
        "dec_norm": _norm_init(dd),
        "head1": _head_init(ks[5], cfg),
        "head2": _head_init(ks[6], cfg),
    }
    return params


# ---------------------------------------------------------------------------
# inference
# ---------------------------------------------------------------------------


def normalize_frames(img):
    """Raw uint8 pixels -> ImgNorm float32 (no-op on float inputs).

    The ON-DEVICE counterpart of the host normalization in
    io/image.resize_img (((x/255) - 0.5)/0.5; spec dust3r/utils/image.py:23)
    — frames cross the host->device boundary at 1 byte/channel instead of 4.
    Part of the ``encode`` contract: EVERY pluggable model module's encode
    (mast3r, models.oracle, ...) must accept uint8 via this helper, since
    system.run ships raw bytes.
    """
    if img.dtype == jnp.uint8:
        img = (img.astype(jnp.float32) / 255.0 - 0.5) / 0.5
    return img


@partial(jax.jit, static_argnames=("cfg",))
def encode(params, img, cfg: MASt3RConfig):
    """Encode images (b, h, w, 3) -> (feat (b, n, ed), pos (b, n, 2)).

    Accepts ImgNorm-normalized float32 or raw uint8 (see normalize_frames).
    """
    feat, pos, _ = vit.encode(params, normalize_frames(img), cfg,
                              cfg.compute_dtype)
    return feat, pos


def _grid(cfg: MASt3RConfig):
    return (cfg.img_size[0] // cfg.patch_size, cfg.img_size[1] // cfg.patch_size)


@partial(jax.jit, static_argnames=("cfg",))
def decode_pair(params, feat1, pos1, feat2, pos2, cfg: MASt3RConfig):
    """Two-view decode + heads. Batched over the leading dim.

    Returns (res1, res2): dicts with pts3d/conf/desc/desc_conf at full
    resolution, fp32 (head runs fp32; spec mast3r_utils.py:34-40).
    """
    grid = _grid(cfg)
    L = cfg.dec_depth
    hooks = (0, L * 2 // 4, L * 3 // 4, L)
    out1, out2 = vit.decode(params, feat1, pos1, feat2, pos2, cfg,
                            cfg.compute_dtype)
    hdt = cfg.head_compute_dtype
    res1 = dpt.head_forward(params["head1"], out1, grid, cfg.patch_size,
                            cfg.desc_dim, hooks, hdt)
    res2 = dpt.head_forward(params["head2"], out2, grid, cfg.patch_size,
                            cfg.desc_dim, hooks, hdt)
    return res1, res2


def downsample_maps(*maps, ds: int = 1):
    """Spatially subsample (b, h, w, ...) prediction maps by stride ``ds``
    (spec: mast3r_utils.downsample, :43-52)."""
    if ds <= 1:
        return maps
    return tuple(m[:, ::ds, ::ds] for m in maps)


def inference_mono(params, feat, pos, cfg: MASt3RConfig, ds: int = 1):
    """Self-pair decode (spec: mast3r_inference_mono, mast3r_utils.py:118-139).

    Returns (X (b, n, 3), C (b, n, 1)) canonical pointmap + conf
    (n = h*w / ds^2).
    """
    res1, _ = decode_pair(params, feat, pos, feat, pos, cfg)
    b = feat.shape[0]
    X, C = downsample_maps(res1["pts3d"], res1["conf"][..., None], ds=ds)
    return X.reshape(b, -1, 3), C.reshape(b, -1, 1)


def inference_asymmetric(params, feat_f, pos_f, feat_k, pos_k, cfg):
    """Frame/keyframe decode: returns stacked (X, C, D, Q) with leading dim 2
    = [ff, kf] (frame's map in frame coords, keyframe's map in frame coords).

    Spec: mast3r_asymmetric_inference (mast3r_utils.py:183-206).
    """
    res1, res2 = decode_pair(params, feat_f, pos_f, feat_k, pos_k, cfg)
    X = jnp.concatenate([res1["pts3d"], res2["pts3d"]], axis=0)
    C = jnp.concatenate([res1["conf"], res2["conf"]], axis=0)
    D = jnp.concatenate([res1["desc"], res2["desc"]], axis=0)
    Q = jnp.concatenate([res1["desc_conf"], res2["desc_conf"]], axis=0)
    return X, C, D, Q


def inference_symmetric(params, feat_i, pos_i, feat_j, pos_j, cfg):
    """Both decode directions of edge (i, j), batched in one call.

    Returns per-direction dicts (Xii, Xji, Xjj, Xij, ...) with shapes
    (b, h, w, ...): decode (i|j) gives (ii, ji); decode (j|i) gives (jj, ij).
    Spec: mast3r_match_symmetric (mast3r_utils.py:142-180); the reference
    loops edges one-by-one — here both directions (and all edges in the
    batch) go through the decoder as one batch of size 2b.
    """
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
