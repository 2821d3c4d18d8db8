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
