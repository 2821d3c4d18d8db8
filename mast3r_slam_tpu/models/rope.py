"""2D rotary position embedding (RoPE2D) in plain jnp.

Executable spec: the pure-torch fallback at
/root/reference/thirdparty/mast3r/dust3r/croco/models/pos_embed.py:112-159
(the CUDA kernel in croco/models/curope implements the same map). The head
dim is split in half; the first half is rotated by the token's y position,
the second by its x position. Within each half, rotate_half pairs feature
i with feature i + D/4.

On TPU this is a pure VPU elementwise op — cos/sin tables are computed once
per (positions, dim) and fused into the attention projections by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def _rope_1d(tokens, pos1d, base: float):
    """tokens: (b, heads, n, d), pos1d: (b, n) int."""
    d = tokens.shape[-1]
    inv_freq = 1.0 / (base ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    ang = pos1d[..., None].astype(jnp.float32) * inv_freq  # (b, n, d/2)
    ang = jnp.concatenate([ang, ang], axis=-1)             # (b, n, d)
    cos = jnp.cos(ang)[:, None].astype(tokens.dtype)
    sin = jnp.sin(ang)[:, None].astype(tokens.dtype)
    x1 = tokens[..., : d // 2]
    x2 = tokens[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return tokens * cos + rot * sin


def rope_2d(tokens, positions, base: float = 100.0):
    """Apply RoPE2D.

    Args:
      tokens: (b, heads, n, d) with d % 4 == 0.
      positions: (b, n, 2) integer (y, x) patch coordinates.
    """
    d = tokens.shape[-1]
    assert d % 4 == 0, "RoPE2D needs head dim divisible by 4"
    y_half = tokens[..., : d // 2]
    x_half = tokens[..., d // 2:]
    y_out = _rope_1d(y_half, positions[..., 0], base)
    x_out = _rope_1d(x_half, positions[..., 1], base)
    return jnp.concatenate([y_out, x_out], axis=-1)
