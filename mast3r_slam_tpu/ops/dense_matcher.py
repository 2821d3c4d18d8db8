"""Dense coarse-to-fine correspondence matcher (TPU-native design).

An alternative to the reference's iterative projective matcher
(ops/matching.py, spec matching_kernels.cu) that re-thinks matching for the
MXU instead of translating the gather-heavy CUDA scheme:

1. **Coarse**: descriptor correlation of a stride-2 query subgrid against a
   strided grid of target descriptors — one big (n/4, f) x (f, nc) matmul,
   streamed in row tiles with fused argmax (no gathers at all). This is the
   global search that replaces a warm start.
2. **Polish + fine**: the correlation winners seed the SAME pyramidal
   matcher the tracking path uses (ops.matching.match with coarse_iter
   subgrid LM + windowed descriptor refine + occlusion gate) — measured at
   ~14 ms/image on chip vs ~100 ms/image for the round-3 formulation
   (full-resolution 3-iteration LM + radius-3/dilation-2 refine), which was
   the e2e backend's whale (round-4 probe_dense_stages: LM 316 ms + refine
   431 ms of the 780 ms batch-8 edge match).

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

    The correlation tiles are accumulated in bf16: the (rows, cells) score
    matrix is the op's entire HBM cost (~n*nc*bytes written + re-read by
    the argmax) and the MXU emits bf16 at full rate, halving the op. The
    cost: bf16 score ties are GLOBAL — on a near-flat correlation plateau
    the argmax may pick a far-away cell, and the downstream LM + window
    polish has a bounded catch radius, so such points end up gated
    invalid (occlusion/frac gates) rather than recovered. Acceptable for
    a seed whose consumers are robust to per-point dropouts
    (oracle-ATE-gated end to end); flip to f32 accumulation if a future
    descriptor family shows plateau-heavy correlations.
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
                          preferred_element_type=jnp.bfloat16)
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
                convergence_thresh: float = 1e-6, query_stride: int = 1):
    """Full dense matcher. Same contract as ops.matching.match:
    returns (idx_1_to_2 (b, n) int32, valid (b, n, 1) bool).

    The coarse correlation runs on the stride-2 query subgrid only (4x
    less correlation traffic; the flow field it seeds is smoother than a
    single coarse cell anyway) and its upsampled flow warm-starts the
    standard pyramidal matcher (subgrid LM polish + windowed descriptor
    refine + occlusion gate) — the exact machinery the tracking fast path
    ships, re-used here with the correlation replacing the previous-frame
    warm start. Costs ~4x less device time than the round-3 formulation
    (probe_dense_stages.py) at equal oracle trajectory accuracy
    (tests/test_e2e_oracle.py gates it).

    ``query_stride`` > 1 matches only every qs-th COLUMN of view 2 (the
    rows BA reads at ``BAConfig.point_stride == qs``: a stride over the
    row-major flat point axis is a column stride) and scatters the results
    into the full-size return arrays with ``valid`` False elsewhere —
    everything downstream masks by ``valid``. Requires w % qs == 0 and an
    even query grid; callers validate (factor_graph passes the BA stride).
    """
    b, h, w, _ = X11.shape
    n = h * w
    qs = int(query_stride)
    X21q = X21[:, :, ::qs] if qs > 1 else X21
    D21q = D21[:, :, ::qs] if qs > 1 else D21
    wq = X21q.shape[2]
    nq = h * wq

    # 1) coarse descriptor correlation (MXU) on the stride-2 subgrid of
    # the (possibly column-strided) query grid
    D21qq = D21q[:, ::2, ::2].reshape(b, nq // 4, -1).astype(jnp.bfloat16)
    idx_c = coarse_correlate(D21qq, D11.astype(jnp.bfloat16), stride)
    # upsampled flow -> per-query integer warm start (full-res target
    # coordinates; query positions are their TRUE full-image pixels)
    pq = matching.lin_to_pixel(idx_c, w)              # (b, nq/4, 2)
    qpos = jnp.stack(
        jnp.meshgrid(jnp.arange(0, w, 2 * qs), jnp.arange(0, h, 2)),
        axis=-1).reshape(1, nq // 4, 2)               # query (u, v)
    flow = (pq - qpos).reshape(b, h // 2, wq // 2, 2)
    flow_up = jnp.repeat(jnp.repeat(flow, 2, axis=1), 2, axis=2)
    upos = jnp.stack(jnp.meshgrid(jnp.arange(0, w, qs), jnp.arange(h)),
                     axis=-1)[None]                   # (1, h, wq, 2)
    p0 = jnp.clip(upos + flow_up,
                  jnp.zeros((2,), jnp.int32),
                  jnp.asarray([w - 1, h - 1], jnp.int32))
    idx_init = matching.pixel_to_lin(p0.reshape(b, nq, 2), w)

    # 2) pyramidal LM polish + window refine + occlusion gate — the
    # tracking matcher, warm-started by the correlation
    idx_q, valid_q = matching.match(
        X11, X21q, D11, D21q, idx_1_to_2_init=idx_init,
        max_iter=0, coarse_iter=max(int(lm_iters), 1),
        lambda_init=lambda_init, convergence_thresh=convergence_thresh,
        dist_thresh=dist_thresh, radius=fine_radius,
        dilation_max=fine_dilation)
    if qs == 1:
        return idx_q, valid_q
    idx = jnp.zeros((b, n), jnp.int32)
    idx = idx.reshape(b, h, w).at[:, :, ::qs].set(
        idx_q.reshape(b, h, wq)).reshape(b, n)
    valid = jnp.zeros((b, n, 1), bool)
    valid = valid.reshape(b, h, w).at[:, :, ::qs].set(
        valid_q.reshape(b, h, wq)).reshape(b, n, 1)
    return idx, valid
