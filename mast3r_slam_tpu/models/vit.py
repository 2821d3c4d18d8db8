"""ViT encoder / dual cross-attention decoder (functional JAX).

TPU-native re-design of the CroCo/DUSt3R transformer backbone
(/root/reference/thirdparty/mast3r/dust3r/croco/models/blocks.py and
dust3r/dust3r/model.py:127-190):

* 24-block ViT-L encoder over 16x16 patches with RoPE2D on q/k;
* linear decoder_embed 1024->768, then two weight-distinct 12-block decoder
  streams; each block = self-attn + cross-attn(memory of the other image)
  + MLP (pre-norm).

All matmuls are large, batch-friendly MXU ops (768 tokens x 1024/768 dims);
attention uses fp32 softmax statistics and bf16 operands by default. Shapes
are static under jit; the two decoder streams of a pair run as one batched
call where possible (the caller stacks them).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .layers import layernorm, linear, mlp
from .rope import rope_2d


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * d)


def _sdpa(q, k, v):
    """Softmax attention, fp32 logits/softmax, operand dtype preserved."""
    d = q.shape[-1]
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits * (d ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def self_attention(p, x, xpos, num_heads, rope_base, dtype):
    """Fused-qkv self attention with RoPE (spec: blocks.py Attention)."""
    qkv = linear(p["qkv"], x, dtype)
    b, n, c3 = qkv.shape
    c = c3 // 3
    qkv = qkv.reshape(b, n, 3, num_heads, c // num_heads)
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    q = rope_2d(q, xpos, rope_base)
    k = rope_2d(k, xpos, rope_base)
    out = _merge_heads(_sdpa(q.astype(v.dtype), k.astype(v.dtype), v))
    return linear(p["proj"], out, dtype)


def cross_attention(p, q_in, kv_in, qpos, kpos, num_heads, rope_base, dtype):
    """Cross attention with RoPE on q and k (spec: blocks.py CrossAttention)."""
    q = _split_heads(linear(p["projq"], q_in, dtype), num_heads)
    k = _split_heads(linear(p["projk"], kv_in, dtype), num_heads)
    v = _split_heads(linear(p["projv"], kv_in, dtype), num_heads)
    q = rope_2d(q, qpos, rope_base)
    k = rope_2d(k, kpos, rope_base)
    out = _merge_heads(_sdpa(q.astype(v.dtype), k.astype(v.dtype), v))
    return linear(p["proj"], out, dtype)


def encoder_block(p, x, xpos, num_heads, rope_base, dtype):
    x = x + self_attention(p["attn"], layernorm(p["norm1"], x), xpos,
                           num_heads, rope_base, dtype).astype(x.dtype)
    x = x + mlp(p["mlp"], layernorm(p["norm2"], x), dtype).astype(x.dtype)
    return x


def decoder_block(p, x, y, xpos, ypos, num_heads, rope_base, dtype):
    """Self-attn + cross-attn into memory y + MLP (spec: blocks.py:171-191)."""
    x = x + self_attention(p["attn"], layernorm(p["norm1"], x), xpos,
                           num_heads, rope_base, dtype).astype(x.dtype)
    y_ = layernorm(p["norm_y"], y)
    x = x + cross_attention(p["cross_attn"], layernorm(p["norm2"], x), y_,
                            xpos, ypos, num_heads, rope_base, dtype).astype(x.dtype)
    x = x + mlp(p["mlp"], layernorm(p["norm3"], x), dtype).astype(x.dtype)
    return x


def patch_embed(p, img, patch_size: int, dtype):
    """16x16 patchify as reshape+matmul (equivalent to the stride-16 conv of
    blocks.py PatchEmbed but expressed as one big MXU matmul).

    img: (b, h, w, 3) NHWC. Returns (tokens (b, n, c), pos (b, n, 2) int32
    (y, x) per patch, grid (nh, nw)).
    """
    b, h, w, c = img.shape
    ph = pw = patch_size
    nh, nw = h // ph, w // pw
    x = img.reshape(b, nh, ph, nw, pw, c).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, nh * nw, ph * pw * c)
    # w_flat: (ph*pw*c, embed) derived from the HWIO conv kernel
    tokens = linear(p["proj"], x, dtype)
    ys = jnp.repeat(jnp.arange(nh, dtype=jnp.int32), nw)
    xs = jnp.tile(jnp.arange(nw, dtype=jnp.int32), nh)
    pos = jnp.broadcast_to(jnp.stack([ys, xs], axis=-1), (b, nh * nw, 2))
    return tokens, pos, (nh, nw)


def encode(params, img, cfg, dtype=jnp.bfloat16):
    """Full encoder: patchify + enc_depth blocks + final norm.

    Spec: dust3r/model.py _encode_image (:127-139).
    """
    x, pos, grid = patch_embed(params["patch_embed"], img, cfg.patch_size, dtype)
    x = x.astype(dtype)
    for blk in params["enc_blocks"]:
        x = encoder_block(blk, x, pos, cfg.enc_num_heads, cfg.rope_base, dtype)
    x = layernorm(params["enc_norm"], x)
    return x, pos, grid


def decode(params, f1, pos1, f2, pos2, cfg, dtype=jnp.bfloat16):
    """Dual-stream decoder. Returns hook activations for both streams.

    Spec: dust3r/model.py _decoder (:171-190). Output lists have
    dec_depth + 1 entries: [encoder tokens, block1 out, ..., block12 out
    (normed)] — exactly the hook indexing the DPT head expects.

    TPU-native layout: the two weight-distinct streams are stored stacked
    (params["dec_blocks_s"], leaf shape (2, ...)) and each block runs both
    streams as ONE vmapped/batched pass — every matmul becomes a 2-batch
    MXU op instead of two back-to-back kernels, and the cross-attention
    memory is just the stream-flipped activations.
    """
    f = jnp.stack([f1, f2])            # (2, b, n, ed)
    pos = jnp.stack([pos1, pos2])      # (2, b, n, 2)
    pos_sw = pos[::-1]
    out = [f]
    x = linear(params["decoder_embed"], f, dtype).astype(dtype)

    def blk_fn(p, x_, y_, xp, yp):
        return decoder_block(p, x_, y_, xp, yp, cfg.dec_num_heads,
                             cfg.rope_base, dtype)

    vblk = jax.vmap(blk_fn)
    for blk_s in params["dec_blocks_s"]:
        x = vblk(blk_s, x, x[::-1], pos, pos_sw)
        out.append(x)
    out[-1] = layernorm(params["dec_norm"], out[-1])
    out1 = [o[0] for o in out]
    out2 = [o[1] for o in out]
    return out1, out2
