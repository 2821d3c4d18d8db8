"""Pallas TPU kernel for the Scharr gradient stencil.

Functionally identical to ops.gradient.img_gradient (spec:
/root/reference/mast3r_slam/image.py:5-38) but implemented as a single
Pallas VMEM pass: the reflect-padded image is loaded into VMEM once and
both gx and gy come out of the same register-resident shifted slices,
instead of XLA re-materializing the six shifted operand streams per
output.

This is also the validation kernel for the Pallas→Mosaic toolchain on
this backend: it deliberately uses only static slicing on VMEM blocks —
the one access pattern known to compile reliably through the remote
Mosaic compiler (dynamic gathers beyond a vreg crash it; see
DEVELOPMENT.md "Gather experiments"). New kernels should start from this
template. The matcher keeps the XLA stencil by default (the gradient op
is ~µs-scale; parity-speed measured — see DEVELOPMENT.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gradient import _reflect_pad_hw


def _scharr_kernel(h: int, w: int, c: int, p_ref, gx_ref, gy_ref):
    """p_ref: (h+2, (w+2)*c) reflect-padded rows; outputs (h, w*c).

    An x-shift of one PIXEL is a shift of ``c`` elements along the
    flattened minor axis, so all nine taps are static slices of the same
    VMEM block.
    """
    p = p_ref[:]

    def sh(dy, dx):
        return jax.lax.slice(
            p, (1 + dy, (1 + dx) * c), (1 + dy + h, (1 + dx) * c + w * c))

    gx_ref[:] = (1.0 / 32.0) * (
        3.0 * (sh(-1, 1) - sh(-1, -1))
        + 10.0 * (sh(0, 1) - sh(0, -1))
        + 3.0 * (sh(1, 1) - sh(1, -1))
    )
    gy_ref[:] = (1.0 / 32.0) * (
        3.0 * (sh(1, -1) - sh(-1, -1))
        + 10.0 * (sh(1, 0) - sh(-1, 0))
        + 3.0 * (sh(1, 1) - sh(-1, 1))
    )


@partial(jax.jit, static_argnames=("interpret",))
def img_gradient_pallas(img, interpret: bool = False):
    """Scharr x/y gradients of (..., h, w, c) images; returns (gx, gy).

    Drop-in for ops.gradient.img_gradient. ``interpret=True`` runs the
    kernel in the Pallas interpreter (for CPU tests; compiled Mosaic
    kernels are TPU-only).
    """
    batch = img.shape[:-3]
    h, w, c = img.shape[-3:]
    p = _reflect_pad_hw(img).reshape(batch + (h + 2, (w + 2) * c))

    call = pl.pallas_call(
        partial(_scharr_kernel, h, w, c),
        out_shape=(
            jax.ShapeDtypeStruct((h, w * c), img.dtype),
            jax.ShapeDtypeStruct((h, w * c), img.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )
    for _ in batch:
        call = jax.vmap(call)
    gx, gy = call(p)
    shape = batch + (h, w, c)
    return gx.reshape(shape), gy.reshape(shape)
