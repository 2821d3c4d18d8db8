"""Torch MASt3R checkpoint -> JAX param pytree converter.

Maps the released ``MASt3R_ViTLarge_BaseDecoder_512_catmlpdpt_metric.pth``
state_dict (and any AsymmetricMASt3R-compatible checkpoint) onto the param
tree produced by :func:`mast3r_slam_tpu.models.mast3r.init_params`.

Name map (torch -> ours), derived from the reference module structure
(croco/models/croco.py, dust3r/dust3r/model.py, mast3r/catmlp_dpt_head.py):

    patch_embed.proj.{weight OIHW, bias} -> patch_embed.proj (flattened to a
        (ps*ps*3, E) matmul; the conv kernel is reshaped so that
        patches flattened as (ph, pw, c) row-major hit the same weights)
    enc_blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}
    enc_norm, decoder_embed, dec_blocks(.2).N.*, dec_norm
    downstream_head{1,2}.dpt.act_postprocess.K.{0,1} -> head.dpt.act_postprocess
    downstream_head{1,2}.dpt.scratch.layer{1-4}_rn -> head.dpt.layer_rn
    downstream_head{1,2}.dpt.scratch.refinenet{1-4}.* -> head.dpt.refinenet*
    downstream_head{1,2}.dpt.head.{0,2,4} -> head.dpt.head.conv{1,2,3}
    downstream_head{1,2}.head_local_features.fc{1,2}

Checkpoints missing ``dec_blocks2`` duplicate ``dec_blocks`` (spec:
dust3r/model.py:90-97). Tensors arrive as numpy arrays (use
``load_torch_state_dict`` to read a .pth without any reference code).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .mast3r import MASt3RConfig


def load_torch_state_dict(path):
    """Load a torch checkpoint into {name: np.ndarray} on CPU."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}


def _lin(sd, name):
    p = {"w": np.ascontiguousarray(sd[f"{name}.weight"].T.astype(np.float32))}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].astype(np.float32)
    return p


def _conv(sd, name, bias=True):
    # torch OIHW -> jax HWIO
    w = sd[f"{name}.weight"].astype(np.float32).transpose(2, 3, 1, 0)
    p = {"w": np.ascontiguousarray(w)}
    if bias and f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].astype(np.float32)
    return p


def _deconv(sd, name):
    # torch ConvTranspose2d weight (in, out, kh, kw) -> ours (kh, kw, in, out)
    w = sd[f"{name}.weight"].astype(np.float32).transpose(2, 3, 0, 1)
    p = {"w": np.ascontiguousarray(w)}
    if f"{name}.bias" in sd:
        p["b"] = sd[f"{name}.bias"].astype(np.float32)
    return p


def _norm(sd, name):
    return {"w": sd[f"{name}.weight"].astype(np.float32),
            "b": sd[f"{name}.bias"].astype(np.float32)}


def _patch_embed(sd):
    # conv OIHW (E, 3, ph, pw); our patches flatten (ph, pw, c) row-major
    w = sd["patch_embed.proj.weight"].astype(np.float32)
    e, c, ph, pw = w.shape
    w = w.transpose(2, 3, 1, 0).reshape(ph * pw * c, e)
    return {"proj": {"w": np.ascontiguousarray(w),
                     "b": sd["patch_embed.proj.bias"].astype(np.float32)}}


def _enc_block(sd, pre):
    return {
        "norm1": _norm(sd, f"{pre}.norm1"),
        "attn": {"qkv": _lin(sd, f"{pre}.attn.qkv"),
                 "proj": _lin(sd, f"{pre}.attn.proj")},
        "norm2": _norm(sd, f"{pre}.norm2"),
        "mlp": {"fc1": _lin(sd, f"{pre}.mlp.fc1"),
                "fc2": _lin(sd, f"{pre}.mlp.fc2")},
    }


def _dec_block(sd, pre):
    return {
        "norm1": _norm(sd, f"{pre}.norm1"),
        "attn": {"qkv": _lin(sd, f"{pre}.attn.qkv"),
                 "proj": _lin(sd, f"{pre}.attn.proj")},
        "cross_attn": {"projq": _lin(sd, f"{pre}.cross_attn.projq"),
                       "projk": _lin(sd, f"{pre}.cross_attn.projk"),
                       "projv": _lin(sd, f"{pre}.cross_attn.projv"),
                       "proj": _lin(sd, f"{pre}.cross_attn.proj")},
        "norm2": _norm(sd, f"{pre}.norm2"),
        "norm3": _norm(sd, f"{pre}.norm3"),
        "norm_y": _norm(sd, f"{pre}.norm_y"),
        "mlp": {"fc1": _lin(sd, f"{pre}.mlp.fc1"),
                "fc2": _lin(sd, f"{pre}.mlp.fc2")},
    }


def _rcu(sd, pre):
    return {"conv1": _conv(sd, f"{pre}.conv1"), "conv2": _conv(sd, f"{pre}.conv2")}


def _head(sd, pre):
    dpt = f"{pre}.dpt"
    return {
        "dpt": {
            "act_postprocess": [
                {"proj": _conv(sd, f"{dpt}.act_postprocess.0.0"),
                 "deconv": _deconv(sd, f"{dpt}.act_postprocess.0.1")},
                {"proj": _conv(sd, f"{dpt}.act_postprocess.1.0"),
                 "deconv": _deconv(sd, f"{dpt}.act_postprocess.1.1")},
                {"proj": _conv(sd, f"{dpt}.act_postprocess.2.0")},
                {"proj": _conv(sd, f"{dpt}.act_postprocess.3.0"),
                 "conv": _conv(sd, f"{dpt}.act_postprocess.3.1")},
            ],
            "layer_rn": [
                _conv(sd, f"{dpt}.scratch.layer{i}_rn", bias=False)
                for i in (1, 2, 3, 4)
            ],
            **{
                f"refinenet{i}": {
                    "resConfUnit1": _rcu(sd, f"{dpt}.scratch.refinenet{i}.resConfUnit1"),
                    "resConfUnit2": _rcu(sd, f"{dpt}.scratch.refinenet{i}.resConfUnit2"),
                    "out_conv": _conv(sd, f"{dpt}.scratch.refinenet{i}.out_conv"),
                }
                for i in (1, 2, 3, 4)
            },
            "head": {
                "conv1": _conv(sd, f"{dpt}.head.0"),
                "conv2": _conv(sd, f"{dpt}.head.2"),
                "conv3": _conv(sd, f"{dpt}.head.4"),
            },
        },
        "head_local_features": {
            "fc1": _lin(sd, f"{pre}.head_local_features.fc1"),
            "fc2": _lin(sd, f"{pre}.head_local_features.fc2"),
        },
    }


def convert_state_dict(sd, cfg: MASt3RConfig):
    """Torch {name: np.ndarray} -> JAX param pytree."""
    dec2_prefix = (
        "dec_blocks2" if any(k.startswith("dec_blocks2") for k in sd)
        else "dec_blocks"
    )
    return {
        "patch_embed": _patch_embed(sd),
        "enc_blocks": [_enc_block(sd, f"enc_blocks.{i}")
                       for i in range(cfg.enc_depth)],
        "enc_norm": _norm(sd, "enc_norm"),
        "decoder_embed": _lin(sd, "decoder_embed"),
        # streams stacked along a leading axis (vit.decode runs both as one
        # batched pass); stream 0 = dec_blocks, stream 1 = dec_blocks2
        "dec_blocks_s": [
            jax.tree.map(lambda a, b: jnp.stack([a, b]),
                         _dec_block(sd, f"dec_blocks.{i}"),
                         _dec_block(sd, f"{dec2_prefix}.{i}"))
            for i in range(cfg.dec_depth)
        ],
        "dec_norm": _norm(sd, "dec_norm"),
        "head1": _head(sd, "downstream_head1"),
        "head2": _head(sd, "downstream_head2"),
    }


def load_checkpoint(path, cfg: MASt3RConfig):
    """Convenience: .pth path -> JAX params."""
    return convert_state_dict(load_torch_state_dict(path), cfg)


# ---------------------------------------------------------------------------
# released-checkpoint loading (from_pretrained equivalent)
# ---------------------------------------------------------------------------

# kwargs of the released instantiation string we map onto MASt3RConfig.
_INT_ARGS = {
    "enc_embed_dim": "enc_embed_dim", "enc_depth": "enc_depth",
    "enc_num_heads": "enc_num_heads", "dec_embed_dim": "dec_embed_dim",
    "dec_depth": "dec_depth", "dec_num_heads": "dec_num_heads",
    "patch_size": "patch_size",
    # extra architecture kwargs our export writes for non-default-size
    # models (the reference's AsymmetricMASt3R accepts feature_dim /
    # last_dim too; they are absent from the released string because the
    # ViT-L defaults apply)
    "feature_dim": "feature_dim", "last_dim": "last_dim",
}


def parse_model_args(args_str: str, img_size=None, **overrides) -> MASt3RConfig:
    """Instantiation string from ``ckpt['args'].model`` -> MASt3RConfig.

    The reference reconstructs the network with ``eval(ckpt['args'].model)``
    (spec: mast3r/model.py:21-37, incl. the ManyAR->PatchEmbedDust3R and
    landscape_only=False rewrites, which only affect portrait handling — the
    weights and landscape forward are identical). We parse the same string
    without eval: integer architecture kwargs by regex, plus sanity checks
    that the head/activation family matches what this implementation
    hardcodes (catmlp+dpt, pts3d+descN, exp depth/conf modes, RoPE freq).

    ``img_size`` here is the *inference* resolution (h, w) — the checkpoint
    string's img_size=(512, 512) is only the training crop bound.
    """
    import re

    kw = {}
    for m in re.finditer(r"(\w+)\s*=\s*(-?\d+)\s*[,)]", args_str):
        name, val = m.group(1), int(m.group(2))
        if name in _INT_ARGS:
            kw[_INT_ARGS[name]] = val

    m = re.search(r"layer_dims\s*=\s*\(([\d,\s]+)\)", args_str)
    if m:
        kw["layer_dims"] = tuple(
            int(x) for x in m.group(1).split(",") if x.strip())

    m = re.search(r"output_mode\s*=\s*'pts3d\+desc(\d+)'", args_str)
    if m:
        kw["desc_dim"] = int(m.group(1))
    elif "output_mode" in args_str:
        raise ValueError(f"unsupported output_mode in: {args_str}")

    m = re.search(r"pos_embed\s*=\s*'RoPE(\d+)'", args_str)
    if m:
        kw["rope_base"] = float(m.group(1))
    elif "pos_embed" in args_str:
        raise ValueError(f"unsupported pos_embed in: {args_str}")

    if "head_type" in args_str and "catmlp+dpt" not in args_str:
        raise ValueError(f"unsupported head_type in: {args_str}")
    for mode in ("depth_mode", "conf_mode", "desc_conf_mode"):
        m = re.search(mode + r"\s*=\s*\(\s*'(\w+)'", args_str)
        if m and m.group(1) != "exp":
            raise ValueError(f"unsupported {mode}={m.group(1)!r}")

    if img_size is not None:
        kw["img_size"] = tuple(img_size)
    kw.update(overrides)
    return MASt3RConfig(**kw)


def load_released_checkpoint(path, img_size=None, **overrides):
    """Released-format .pth ({'args': Namespace(model=...), 'model': sd})
    -> (MASt3RConfig, params). The from_pretrained equivalent
    (spec: mast3r/model.py:47-52 -> load_model :21-37).

    ``overrides`` pass MASt3RConfig fields (dtype=..., head_dtype=...);
    ``img_size`` sets the inference resolution (default: config default).
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if "args" in ckpt and hasattr(ckpt["args"], "model"):
        cfg = parse_model_args(ckpt["args"].model, img_size=img_size,
                               **overrides)
    else:  # bare state_dict: trust caller-supplied overrides
        kw = dict(overrides)
        if img_size is not None:
            kw["img_size"] = tuple(img_size)
        cfg = MASt3RConfig(**kw)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.detach().cpu().numpy() for k, v in sd.items()
          if hasattr(v, "detach")}
    return cfg, convert_state_dict(sd, cfg)


# ---------------------------------------------------------------------------
# released-checkpoint EXPORT (inverse of convert_state_dict)
# ---------------------------------------------------------------------------


def _np(a):
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32))


def _inv_lin(out, name, p):
    out[f"{name}.weight"] = _np(p["w"]).T
    if "b" in p:
        out[f"{name}.bias"] = _np(p["b"])


def _inv_conv(out, name, p):
    out[f"{name}.weight"] = _np(p["w"]).transpose(3, 2, 0, 1)  # HWIO->OIHW
    if "b" in p:
        out[f"{name}.bias"] = _np(p["b"])


def _inv_deconv(out, name, p):
    # ours (kh, kw, in, out) -> torch ConvTranspose2d (in, out, kh, kw)
    out[f"{name}.weight"] = _np(p["w"]).transpose(2, 3, 0, 1)
    if "b" in p:
        out[f"{name}.bias"] = _np(p["b"])


def _inv_norm(out, name, p):
    out[f"{name}.weight"] = _np(p["w"])
    out[f"{name}.bias"] = _np(p["b"])


def _inv_enc_block(out, pre, p):
    _inv_norm(out, f"{pre}.norm1", p["norm1"])
    _inv_lin(out, f"{pre}.attn.qkv", p["attn"]["qkv"])
    _inv_lin(out, f"{pre}.attn.proj", p["attn"]["proj"])
    _inv_norm(out, f"{pre}.norm2", p["norm2"])
    _inv_lin(out, f"{pre}.mlp.fc1", p["mlp"]["fc1"])
    _inv_lin(out, f"{pre}.mlp.fc2", p["mlp"]["fc2"])


def _inv_dec_block(out, pre, p):
    _inv_norm(out, f"{pre}.norm1", p["norm1"])
    _inv_lin(out, f"{pre}.attn.qkv", p["attn"]["qkv"])
    _inv_lin(out, f"{pre}.attn.proj", p["attn"]["proj"])
    for nm in ("projq", "projk", "projv", "proj"):
        _inv_lin(out, f"{pre}.cross_attn.{nm}", p["cross_attn"][nm])
    _inv_norm(out, f"{pre}.norm2", p["norm2"])
    _inv_norm(out, f"{pre}.norm3", p["norm3"])
    _inv_norm(out, f"{pre}.norm_y", p["norm_y"])
    _inv_lin(out, f"{pre}.mlp.fc1", p["mlp"]["fc1"])
    _inv_lin(out, f"{pre}.mlp.fc2", p["mlp"]["fc2"])


def _inv_head(out, pre, p):
    dpt = f"{pre}.dpt"
    ap = p["dpt"]["act_postprocess"]
    _inv_conv(out, f"{dpt}.act_postprocess.0.0", ap[0]["proj"])
    _inv_deconv(out, f"{dpt}.act_postprocess.0.1", ap[0]["deconv"])
    _inv_conv(out, f"{dpt}.act_postprocess.1.0", ap[1]["proj"])
    _inv_deconv(out, f"{dpt}.act_postprocess.1.1", ap[1]["deconv"])
    _inv_conv(out, f"{dpt}.act_postprocess.2.0", ap[2]["proj"])
    _inv_conv(out, f"{dpt}.act_postprocess.3.0", ap[3]["proj"])
    _inv_conv(out, f"{dpt}.act_postprocess.3.1", ap[3]["conv"])
    for i in (1, 2, 3, 4):
        _inv_conv(out, f"{dpt}.scratch.layer{i}_rn", p["dpt"]["layer_rn"][i - 1])
        rf = p["dpt"][f"refinenet{i}"]
        for unit in ("resConfUnit1", "resConfUnit2"):
            _inv_conv(out, f"{dpt}.scratch.refinenet{i}.{unit}.conv1",
                      rf[unit]["conv1"])
            _inv_conv(out, f"{dpt}.scratch.refinenet{i}.{unit}.conv2",
                      rf[unit]["conv2"])
        _inv_conv(out, f"{dpt}.scratch.refinenet{i}.out_conv", rf["out_conv"])
    _inv_conv(out, f"{dpt}.head.0", p["dpt"]["head"]["conv1"])
    _inv_conv(out, f"{dpt}.head.2", p["dpt"]["head"]["conv2"])
    _inv_conv(out, f"{dpt}.head.4", p["dpt"]["head"]["conv3"])
    _inv_lin(out, f"{pre}.head_local_features.fc1",
             p["head_local_features"]["fc1"])
    _inv_lin(out, f"{pre}.head_local_features.fc2",
             p["head_local_features"]["fc2"])


def export_state_dict(params, cfg: MASt3RConfig):
    """JAX param pytree -> reference-named torch state dict (numpy values).

    Exact inverse of ``convert_state_dict`` (round-trip tested): lets this
    framework hand a model back to the reference implementation — or save
    its own checkpoints in the released format (``save_released_checkpoint``)
    that both the reference's ``from_pretrained`` (mast3r/model.py:21-37)
    and our ``load_released_checkpoint`` ingest.
    """
    out = {}
    pe = params["patch_embed"]["proj"]
    e = pe["w"].shape[1]
    ph = pw = cfg.patch_size
    w = _np(pe["w"]).reshape(ph, pw, 3, e).transpose(3, 2, 0, 1)
    out["patch_embed.proj.weight"] = np.ascontiguousarray(w)
    out["patch_embed.proj.bias"] = _np(pe["b"])
    for i, blk in enumerate(params["enc_blocks"]):
        _inv_enc_block(out, f"enc_blocks.{i}", blk)
    _inv_norm(out, "enc_norm", params["enc_norm"])
    _inv_lin(out, "decoder_embed", params["decoder_embed"])
    for i, blk_s in enumerate(params["dec_blocks_s"]):
        s0 = jax.tree.map(lambda a: a[0], blk_s)
        s1 = jax.tree.map(lambda a: a[1], blk_s)
        _inv_dec_block(out, f"dec_blocks.{i}", s0)
        _inv_dec_block(out, f"dec_blocks2.{i}", s1)
    _inv_norm(out, "dec_norm", params["dec_norm"])
    _inv_head(out, "downstream_head1", params["head1"])
    _inv_head(out, "downstream_head2", params["head2"])
    return out


def model_args_string(cfg: MASt3RConfig) -> str:
    """Released-format instantiation string for ``cfg`` (the ``args.model``
    the reference's load_model evals, mast3r/model.py:21-37). Non-default
    head sizes ride as extra kwargs that ``parse_model_args`` reads back."""
    extra = ""
    default = MASt3RConfig()
    if (cfg.feature_dim, cfg.last_dim, cfg.layer_dims) != (
            default.feature_dim, default.last_dim, default.layer_dims):
        extra = (f", feature_dim={cfg.feature_dim}, last_dim={cfg.last_dim}"
                 f", layer_dims={tuple(cfg.layer_dims)}")
    return (
        f"AsymmetricMASt3R(pos_embed='RoPE{cfg.rope_base:g}', "
        "patch_embed_cls='ManyAR_PatchEmbed', img_size=(512, 512), "
        f"head_type='catmlp+dpt', output_mode='pts3d+desc{cfg.desc_dim}', "
        "depth_mode=('exp', -inf, inf), conf_mode=('exp', 1, inf), "
        f"enc_embed_dim={cfg.enc_embed_dim}, enc_depth={cfg.enc_depth}, "
        f"enc_num_heads={cfg.enc_num_heads}, "
        f"dec_embed_dim={cfg.dec_embed_dim}, dec_depth={cfg.dec_depth}, "
        f"dec_num_heads={cfg.dec_num_heads}, two_confs=True, "
        f"desc_conf_mode=('exp', 0, inf), patch_size={cfg.patch_size}"
        f"{extra})")


def save_released_checkpoint(params, cfg: MASt3RConfig, path):
    """Save ``params`` as a released-format .pth
    ({'args': Namespace(model=...), 'model': state_dict})."""
    import argparse as _argparse

    import torch

    sd = {k: torch.from_numpy(v) for k, v in
          export_state_dict(params, cfg).items()}
    ckpt = {"args": _argparse.Namespace(model=model_args_string(cfg)),
            "model": sd}
    torch.save(ckpt, path)
    return path
