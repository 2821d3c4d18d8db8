"""DPT pixelwise head + MASt3R Cat-MLP local-feature head (functional JAX).

Spec: /root/reference/thirdparty/mast3r/dust3r/croco/models/dpt_block.py
(DPTOutputAdapter), dust3r/dust3r/heads/dpt_head.py (hooks/forward),
mast3r/catmlp_dpt_head.py (MLP descriptor branch + postprocess) and
dust3r/dust3r/heads/postprocess.py (exp pointmap / conf activations).

The head runs in fp32 (the reference disables autocast for it,
mast3r_slam/mast3r_utils.py:37). Convs are NHWC; spatial sizes are static
multiples of the patch size, so all resizes are exact-factor bilinear ops
XLA lowers to fused VPU code.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import (conv2d, conv_transpose2d, interpolate_bilinear, linear,
                     mlp, pixel_shuffle)


def _c(p, x, dt, **kw):
    """Conv in compute dtype ``dt`` with fp32 accumulation."""
    return conv2d(p, x.astype(dt), dtype=dt, **kw).astype(dt)


def _residual_conv_unit(p, x, dt):
    """ReLU-conv-ReLU-conv + skip (spec: dpt_block.py ResidualConvUnit)."""
    out = jax.nn.relu(x)
    out = _c(p["conv1"], out, dt)
    out = jax.nn.relu(out)
    out = _c(p["conv2"], out, dt)
    return out + x


def _fusion_block(p, x, res=None, dt=jnp.float32):
    """FeatureFusionBlock_custom, width_ratio=1, align_corners=True."""
    if res is not None:
        x = x + _residual_conv_unit(p["resConfUnit1"], res, dt)
    x = _residual_conv_unit(p["resConfUnit2"], x, dt)
    n, h, w, c = x.shape
    x = interpolate_bilinear(x, (2 * h, 2 * w), align_corners=True)
    return _c(p["out_conv"], x, dt)


def dpt_forward(p, hook_tokens, grid, dt=jnp.float32):
    """DPT reassemble + fusion + regression head.

    Args:
      p: dpt params.
      hook_tokens: list of 4 token maps (b, n, c_i) from hooks [0, 6, 9, 12].
      grid: (nh, nw) patch grid.
      dt: conv compute dtype. The reference runs the whole head fp32; on TPU
          fp32 convs are an order of magnitude slower than bf16 on the MXU,
          so the trunk dtype is configurable (final conv always fp32).
    Returns (b, H, W, num_channels) fp32 map at full resolution.
    """
    nh, nw = grid
    layers = []
    for i, tok in enumerate(hook_tokens):
        b, n, c = tok.shape
        layers.append(tok.astype(dt).reshape(b, nh, nw, c))

    # act_postprocess: project + rescale each hook to its pyramid level
    a = p["act_postprocess"]
    l0 = conv_transpose2d(a[0]["deconv"], _c(a[0]["proj"], layers[0], dt),
                          4, dtype=dt).astype(dt)
    l1 = conv_transpose2d(a[1]["deconv"], _c(a[1]["proj"], layers[1], dt),
                          2, dtype=dt).astype(dt)
    l2 = _c(a[2]["proj"], layers[2], dt)
    # torch Conv2d(k=3, s=2, p=1) pads (1,1) even when XLA SAME would pad
    # (0,1); explicit padding keeps checkpoint parity
    l3 = _c(a[3]["conv"], _c(a[3]["proj"], layers[3], dt), dt, stride=2,
            padding=((1, 1), (1, 1)))

    # scratch.layer_rn 3x3 convs to the common feature dim
    rn = p["layer_rn"]
    l0 = _c(rn[0], l0, dt)
    l1 = _c(rn[1], l1, dt)
    l2 = _c(rn[2], l2, dt)
    l3 = _c(rn[3], l3, dt)

    # refinenet cascade (fix variant crops path_4 to l2's spatial size)
    path4 = _fusion_block(p["refinenet4"], l3, dt=dt)[:, : l2.shape[1],
                                                      : l2.shape[2]]
    path3 = _fusion_block(p["refinenet3"], path4, l2, dt=dt)
    path2 = _fusion_block(p["refinenet2"], path3, l1, dt=dt)
    path1 = _fusion_block(p["refinenet1"], path2, l0, dt=dt)

    # regression head: conv3x3 -> x2 bilinear -> conv3x3 -> relu -> conv1x1
    h = p["head"]
    x = _c(h["conv1"], path1, dt)
    n_, hh, ww, _ = x.shape
    x = interpolate_bilinear(x, (2 * hh, 2 * ww), align_corners=True)
    x = jax.nn.relu(_c(h["conv2"], x, dt))
    return conv2d(h["conv3"], x.astype(jnp.float32))


# Exponent ceiling for the 'exp' activations. The reference leaves them
# unclamped (postprocess.py:43-44, :49-56) — safe with trained weights whose
# head outputs stay small, but an untrained/degenerate network can emit
# |xyz| in the hundreds, exp overflows fp32 at ~88, and a single inf
# pointmap poisons the tracker's normal equations (non-finite Cholesky ->
# permanent RELOC; the round-2 bench pathology). exp(20) ~ 4.9e8 metric
# units is far beyond any physical scene, so the clamp is exactly a no-op
# for real checkpoints while keeping the whole pipeline finite for any
# weights.
_EXP_CLAMP = 20.0


def reg_dense_pts3d(xyz):
    """'exp' depth mode: unit direction * expm1(|xyz|) (postprocess.py:25-45)."""
    d = jnp.linalg.norm(xyz, axis=-1, keepdims=True)
    return xyz / jnp.maximum(d, 1e-8) * jnp.expm1(jnp.minimum(d, _EXP_CLAMP))


def reg_dense_conf(x, vmin: float = 1.0):
    """'exp' conf mode with vmax=inf (postprocess.py:49-56)."""
    return vmin + jnp.exp(jnp.minimum(x, _EXP_CLAMP))


def head_forward(p, hook_tokens, grid, patch_size: int, desc_dim: int = 24,
                 hooks=(0, 6, 9, 12), dt=jnp.float32):
    """Full MASt3R head: DPT pts3d+conf branch, MLP desc branch, postprocess.

    Spec: catmlp_dpt_head.py Cat_MLP_LocalFeatures_DPT_Pts3d.forward (:71-96).
    ``hooks`` = [0, 2L/4, 3L/4, L] for decoder depth L (catmlp_dpt_head.py:115).
    Returns dict(pts3d (b,H,W,3), conf (b,H,W), desc (b,H,W,desc_dim),
    desc_conf (b,H,W)).
    """
    nh, nw = grid
    dpt_out = dpt_forward(p["dpt"], [hook_tokens[h] for h in hooks], grid, dt)

    cat = jnp.concatenate(
        [hook_tokens[0].astype(dt), hook_tokens[-1].astype(dt)], axis=-1,
    )
    local = mlp(p["head_local_features"], cat, dtype=dt)  # (b,n,(d+1)*ps^2)
    b, n, c = local.shape
    # torch path: view(B, C, nh, nw) then pixel_shuffle; channels-first order
    local = local.reshape(b, nh, nw, c)
    local = pixel_shuffle(local, patch_size)    # (b, H, W, d+1)

    fmap = jnp.concatenate([dpt_out, local], axis=-1)
    pts3d = reg_dense_pts3d(fmap[..., 0:3])
    conf = reg_dense_conf(fmap[..., 3], vmin=1.0)
    desc = fmap[..., 4:4 + desc_dim]
    desc = desc / jnp.maximum(
        jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-12
    )
    desc_conf = reg_dense_conf(fmap[..., 4 + desc_dim], vmin=0.0)
    return {"pts3d": pts3d, "conf": conf, "desc": desc, "desc_conf": desc_conf}
