"""Scharr image gradients (spec: /root/reference/mast3r_slam/image.py:5-38).

Implemented as an explicit shift-and-add stencil rather than a grouped conv:
for a fixed 3x3 kernel on TPU, XLA fuses the 6 shifted adds into a single
VPU pass over the image, avoiding the layout cost of tiny-channel convs.
"""

from __future__ import annotations

import jax.numpy as jnp


def _reflect_pad_hw(img):
    """Reflect-pad by 1 pixel on the two spatial dims of (..., h, w, c)."""
    return jnp.pad(img, [(0, 0)] * (img.ndim - 3) + [(1, 1), (1, 1), (0, 0)],
                   mode="reflect")


def img_gradient(img):
    """Scharr x/y gradients of (..., h, w, c) images; returns (gx, gy).

    Kernel (1/32) * [[-3,0,3],[-10,0,10],[-3,0,3]] and its transpose,
    matching torch's conv2d cross-correlation orientation.
    """
    p = _reflect_pad_hw(img)
    h, w = img.shape[-3], img.shape[-2]

    def sh(dy, dx):
        return p[..., 1 + dy:1 + dy + h, 1 + dx:1 + dx + w, :]

    gx = (1.0 / 32.0) * (
        3.0 * (sh(-1, 1) - sh(-1, -1))
        + 10.0 * (sh(0, 1) - sh(0, -1))
        + 3.0 * (sh(1, 1) - sh(1, -1))
    )
    gy = (1.0 / 32.0) * (
        3.0 * (sh(1, -1) - sh(-1, -1))
        + 10.0 * (sh(1, 0) - sh(-1, 0))
        + 3.0 * (sh(1, 1) - sh(-1, 1))
    )
    return gx, gy
