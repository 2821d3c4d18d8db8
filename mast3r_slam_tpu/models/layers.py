"""Functional NN building blocks (pure JAX, explicit param pytrees).

Parameters are nested dicts whose leaf names mirror the reference torch
modules (croco/blocks.py, croco/dpt_block.py) so the checkpoint converter in
``models/convert.py`` is a mechanical name map. Linear weights are stored
(in, out); conv weights HWIO.

Compute policy for TPU: matmuls run in the caller-chosen ``dtype`` (bf16 by
default) with fp32 accumulation (``preferred_element_type``); layernorms and
softmax statistics stay fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def linear(p, x, dtype=None):
    w = p["w"]
    b = p.get("b")
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jnp.dot(x, w, preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def layernorm(p, x, eps: float = 1e-6):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["w"] + p["b"]).astype(x.dtype)


def mlp(p, x, dtype=None):
    """Two-layer GELU MLP (spec: croco/blocks.py Mlp)."""
    h = jax.nn.gelu(linear(p["fc1"], x, dtype), approximate=False)
    return linear(p["fc2"], h, dtype)


def conv2d(p, x, stride=1, padding="SAME", dtype=None):
    """NHWC conv. p["w"]: HWIO."""
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(y.dtype)
    return y


def conv_transpose2d(p, x, stride, dtype=None):
    """NHWC transposed conv with kernel == stride (the exact-factor
    upsampling blocks of the DPT adapter). Implemented as one einsum +
    pixel interleave, which is both unambiguous w.r.t. torch's
    ConvTranspose2d semantics (out[y*s+dy, x*s+dx, o] = sum_i
    in[y, x, i] * w[dy, dx, i, o]) and a single MXU matmul.

    p["w"]: (s, s, in, out).
    """
    w = p["w"]
    if dtype is not None:
        x = x.astype(dtype)
        w = w.astype(dtype)
    n, h, ww_, c = x.shape
    s = stride
    y = jnp.einsum("nhwi,uvio->nhuwvo", x, w,
                   preferred_element_type=jnp.float32)
    y = y.reshape(n, h * s, ww_ * s, w.shape[-1])
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(y.dtype)
    return y


def _interp_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) 1-D linear-interpolation matrix (torch semantics)."""
    if align_corners:
        pos = (np.linspace(0.0, n_in - 1.0, n_out) if n_out > 1
               else np.zeros(1))
    else:
        pos = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5,
                      0.0, n_in - 1.0)
    i0 = np.floor(pos).astype(np.int64)
    i1 = np.minimum(i0 + 1, n_in - 1)
    w1 = pos - i0
    M = np.zeros((n_out, n_in), dtype=np.float32)
    M[np.arange(n_out), i0] += 1.0 - w1
    M[np.arange(n_out), i1] += w1
    return M


def interpolate_bilinear(x, out_hw, align_corners: bool = True):
    """Bilinear resize of NHWC matching torch F.interpolate semantics.

    Separable interpolation expressed as two dense matmuls with constant
    (trace-time) interpolation matrices — on TPU this runs on the MXU
    instead of the gather path, which is the difference between ~us and
    ~ms at DPT feature-map sizes.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    Wy = jnp.asarray(_interp_matrix(h, oh, align_corners), dtype=x.dtype)
    Wx = jnp.asarray(_interp_matrix(w, ow, align_corners), dtype=x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", Wy, x, preferred_element_type=jnp.float32)
    y = jnp.einsum("pw,nowc->nopc", Wx, y.astype(x.dtype),
                   preferred_element_type=jnp.float32)
    return y.astype(x.dtype)


def pixel_shuffle(x, r: int):
    """NHWC pixel shuffle: (n, h, w, c*r*r) -> (n, h*r, w*r, c).

    Channel layout matches torch.nn.functional.pixel_shuffle on NCHW:
    channel index = c*r*r + dy*r + dx.
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)
