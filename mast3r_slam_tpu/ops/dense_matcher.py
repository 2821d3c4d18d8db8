"""Dense coarse-to-fine correspondence matcher (TPU-native design).

An alternative to the reference's iterative projective matcher
(ops/matching.py, spec matching_kernels.cu) that re-thinks matching for the
MXU instead of translating the gather-heavy CUDA scheme:

1. **Coarse**: full descriptor correlation of every query point against a
   strided grid of target descriptors — one big (n, f) x (f, nc) matmul,
   streamed in row tiles with fused argmax (no gathers at all).
2. **Fine**: one dilated window search around the upsampled coarse match
   (reusing ops.matching.refine_matches, a single level instead of five).
3. **Geometric gate**: the same 3D-distance occlusion check as the
   reference (matching.py:71-76).

Intended use: loop-closure / relocalization edges, where there is no
warm-start and the reference's per-pixel LM starts from the identity map —
the dense correlation is both more robust to large viewpoint change and an
order of magnitude cheaper on TPU. Frame-to-keyframe tracking keeps the
reference matcher (small motion + warm start).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import matching


@partial(jax.jit, static_argnames=("stride", "row_tile"))
def coarse_correlate(D21, D11, stride: int = 4, row_tile: int = 8192):
    """argmax_j <D21[p], D11_coarse[j]> for every query point p.

    D21: (b, n, f) query descriptors (view2's points); D11: (b, h, w, f)
    target descriptor image. Returns (b, n) int32 full-res linear indices of
    the best coarse cell center.
    """
    b, h, w, f = D11.shape
    n = D21.shape[1]
    Dc = D11[:, ::stride, ::stride]                  # (b, hc, wc, f)
    hc, wc = Dc.shape[1], Dc.shape[2]
    Dc_flat = Dc.reshape(b, hc * wc, f)

    n_tiles = -(-n // row_tile)
    pad = n_tiles * row_tile - n
    D21p = jnp.pad(D21, ((0, 0), (0, pad), (0, 0)))
    D21t = D21p.reshape(b, n_tiles, row_tile, f)

    def tile_argmax(carry, Drow):
        # Drow: (b, row_tile, f)
        corr = jnp.einsum("brf,bkf->brk", Drow, Dc_flat,
                          preferred_element_type=jnp.float32)
        return carry, jnp.argmax(corr, axis=-1).astype(jnp.int32)

    _, idx_tiles = jax.lax.scan(tile_argmax, None, D21t.transpose(1, 0, 2, 3))
    idx_c = idx_tiles.transpose(1, 0, 2).reshape(b, n_tiles * row_tile)[:, :n]

    # coarse cell -> full-res pixel at the cell center
    uc = idx_c % wc
    vc = idx_c // wc
    u = jnp.minimum(uc * stride + stride // 2, w - 1)
    v = jnp.minimum(vc * stride + stride // 2, h - 1)
    return v * w + u


def match_dense(X11, X21, D11, D21, stride: int = 4, fine_radius: int = 3,
                fine_dilation: int = 2, dist_thresh: float = 0.1,
                lm_iters: int = 3, lambda_init: float = 1e-8,
                convergence_thresh: float = 1e-6):
    """Full dense matcher. Same contract as ops.matching.match:
    returns (idx_1_to_2 (b, n) int32, valid (b, n, 1) bool).

    A short LM polish (``lm_iters`` of the projective refinement, warm
    started from the descriptor match) recovers the sub-pixel geometric
    alignment the reference gets from its 10-iteration search.
    """
    b, h, w, _ = X11.shape
    n = h * w

    # 1) coarse descriptor correlation (MXU)
    idx_c = coarse_correlate(D21.reshape(b, n, -1).astype(jnp.bfloat16),
                             D11.astype(jnp.bfloat16), stride)

    # 2) short geometric LM polish from the coarse match
    rays_grad = matching.prep_rays_grad(X11)
    pts3d_norm = matching._normalize(X21.reshape(b, n, 3))
    p_init = matching.lin_to_pixel(idx_c, w).astype(X11.dtype)
    p1, valid_proj = matching.iter_proj(rays_grad, pts3d_norm, p_init,
                                        lm_iters, lambda_init,
                                        convergence_thresh)
    p1i = p1.astype(jnp.int32)

    # 3) occlusion gate (matching.py:71-76)
    lin = matching.pixel_to_lin(p1i, w)
    X11_flat = X11.reshape(b, n, 3)
    X11_at = jnp.take_along_axis(X11_flat, lin[..., None], axis=1)
    dists = jnp.linalg.norm(X11_at - X21.reshape(b, n, 3), axis=-1)
    valid = valid_proj & (dists < dist_thresh)

    # 4) one fine descriptor window pass (unfolded fast path)
    if fine_radius > 0:
        from .window_gather import refine_matches_unfold

        p1i = refine_matches_unfold(
            D11.astype(jnp.bfloat16),
            D21.reshape(b, n, -1).astype(jnp.bfloat16), p1i,
            fine_radius, fine_dilation)

    return matching.pixel_to_lin(p1i, w), valid[..., None]
