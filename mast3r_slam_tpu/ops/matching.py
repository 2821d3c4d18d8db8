"""Pixel-to-point matching ops (TPU-native).

Re-designs the two CUDA kernels of the reference matcher
(/root/reference/mast3r_slam/backend/src/matching_kernels.cu):

* ``iter_proj`` (:119-275): per-pixel 2-DoF Levenberg-Marquardt that projects
  a 3D ray direction onto the normalized-ray image of the other view. The
  CUDA kernel runs one thread per pixel with a *fixed* ``max_iter`` loop; we
  keep that structure but vectorize over all b*h*w pixels at once and run the
  LM iterations with ``lax.fori_loop`` — every step is a batched bilinear
  gather + a closed-form 2x2 solve, which XLA maps onto the VPU with the
  gathers batched along the minor dimension.

* ``refine_matches`` (:25-81): coarse-to-fine dilated window search
  maximizing a 24-D descriptor dot product. Expressed as a static python
  loop over dilation levels; each level gathers the (2r+1)^2 candidate
  descriptors and contracts against the query descriptors with one einsum
  (an MXU matmul of shape (P, W, 24) x (P, 24)).

The public entry point ``match`` mirrors
/root/reference/mast3r_slam/matching.py:8-90 (occlusion gating included).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .gradient import img_gradient


def pixel_to_lin(p, w):
    return p[..., 0] + w * p[..., 1]


def lin_to_pixel(idx, w):
    return jnp.stack([idx % w, idx // w], axis=-1)


def _normalize(x, axis=-1, eps=1e-12):
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, eps)


def prep_rays_grad(X11):
    """Normalized-ray image with Scharr gradients: (b,h,w,3) -> (b,h,w,9)."""
    rays = _normalize(X11)
    gx, gy = img_gradient(rays)
    return jnp.concatenate([rays, gx, gy], axis=-1)


def _unfold_pairs(img):
    """(b, h, w, c) -> (b, h*(w-1), 2c): row (v, u) holds
    [img[v, u], img[v, u+1]] so one bilinear sample costs 2 row gathers
    (v and v+1) instead of 4 corner gathers — TPU gathers are priced per
    gathered row, not per byte (DEVELOPMENT.md)."""
    b, h, w, c = img.shape
    U = jnp.concatenate([img[:, :, :-1, :], img[:, :, 1:, :]], axis=-1)
    return U.reshape(b, h * (w - 1), 2 * c)


def _unfold_quads(img):
    """(b, h, w, c) -> (b, (h-1)*(w-1), 4c): row (v, u) holds the 2x2 corner
    block [img[v,u], img[v,u+1], img[v+1,u], img[v+1,u+1]] so one bilinear
    sample is ONE row gather."""
    b, h, w, c = img.shape
    q = jnp.concatenate(
        [img[:, :-1, :-1], img[:, :-1, 1:], img[:, 1:, :-1], img[:, 1:, 1:]],
        axis=-1)
    return q.reshape(b, (h - 1) * (w - 1), 4 * c)


def _bilinear_gather_quad(quads, u, v, w, h, c):
    """Sample the quad-unfolded image at float pixel coords (b, n) with one
    row gather. Assumes u in [1, w-2], v in [1, h-2]."""
    u11 = jnp.floor(u)
    v11 = jnp.floor(v)
    du = (u - u11)[..., None]
    dv = (v - v11)[..., None]
    iu = u11.astype(jnp.int32)
    iv = v11.astype(jnp.int32)
    wu = w - 1
    q = jnp.take_along_axis(quads, (iv * wu + iu)[..., None], axis=1)
    top = q[..., 0 * c:1 * c] * (1.0 - du) + q[..., 1 * c:2 * c] * du
    bot = q[..., 2 * c:3 * c] * (1.0 - du) + q[..., 3 * c:4 * c] * du
    return top * (1.0 - dv) + bot * dv


def _bilinear_gather(unfolded, u, v, w, h, c):
    """Sample the pair-unfolded image at float pixel coords (b, n).

    Matches the CUDA kernel's weight/corner pairing
    (matching_kernels.cu:155-183). Assumes u in [1, w-2], v in [1, h-2]
    so all four neighbours are in-bounds.
    """
    u11 = jnp.floor(u)
    v11 = jnp.floor(v)
    du = (u - u11)[..., None]
    dv = (v - v11)[..., None]
    iu = u11.astype(jnp.int32)
    iv = v11.astype(jnp.int32)
    wu = w - 1
    base = iv * wu + iu

    def take(idx):
        return jnp.take_along_axis(unfolded, idx[..., None], axis=1)

    r0 = take(base)             # [img[v, u], img[v, u+1]]
    r1 = take(base + wu)        # [img[v+1, u], img[v+1, u+1]]
    top = r0[..., :c] * (1.0 - du) + r0[..., c:] * du
    bot = r1[..., :c] * (1.0 - du) + r1[..., c:] * du
    return top * (1.0 - dv) + bot * dv


@partial(jax.jit, static_argnames=("max_iter",))
def iter_proj(rays_with_grad_img, pts3d_norm, p_init, max_iter: int = 10,
              lambda_init: float = 1e-8, cost_thresh: float = 1e-6):
    """Vectorized per-pixel LM ray projection.

    Args:
      rays_with_grad_img: (b, h, w, 9) [ray, d(ray)/du, d(ray)/dv].
      pts3d_norm: (b, n, 3) unit target directions.
      p_init: (b, n, 2) float initial pixel guesses.
    Returns: (p_new (b, n, 2) float, converged (b, n) bool).
    """
    b, h, w, c = rays_with_grad_img.shape
    quads = _unfold_quads(rays_with_grad_img)

    u0 = jnp.clip(p_init[..., 0], 1.0, w - 2.0)
    v0 = jnp.clip(p_init[..., 1], 1.0, h - 2.0)

    def ray_cost(u, v):
        s = _bilinear_gather_quad(quads, u, v, w, h, c)
        r = _normalize(s[..., 0:3])
        err = r - pts3d_norm
        return s, err, jnp.sum(err * err, axis=-1)

    # ONE bilinear gather per LM iteration: the sample s (ray + gradients)
    # of the last ACCEPTED point is carried in the loop state, so each
    # iteration only evaluates the new trial point. The CUDA kernel
    # (matching_kernels.cu:119-275) — and the previous version of this
    # function — re-samples the accepted point every iteration, i.e. 2
    # gathers per iteration for the same LM trajectory; the gathers are
    # the dominant cost of this op on TPU (DEVELOPMENT.md).
    def body(_, state):
        s_a, cost_a, u_a, v_a, u_t, v_t, lam, conv = state
        s_t, _, cost_t = ray_cost(u_t, v_t)

        improved = cost_t < cost_a
        u_b = jnp.where(improved, u_t, u_a)
        v_b = jnp.where(improved, v_t, v_a)
        s_b = jnp.where(improved[..., None], s_t, s_a)
        cost_b = jnp.minimum(cost_t, cost_a)
        lam = jnp.where(improved, lam * 0.1, lam * 10.0)
        conv = cost_b < cost_thresh

        err_b = _normalize(s_b[..., 0:3]) - pts3d_norm
        gx = s_b[..., 3:6]
        gy = s_b[..., 6:9]
        A00 = jnp.sum(gx * gx, axis=-1) + lam
        A01 = jnp.sum(gx * gy, axis=-1)
        A11 = jnp.sum(gy * gy, axis=-1) + lam
        b0 = -jnp.sum(err_b * gx, axis=-1)
        b1 = -jnp.sum(err_b * gy, axis=-1)

        det = A00 * A11 - A01 * A01
        det_inv = 1.0 / det
        du = det_inv * (A11 * b0 - A01 * b1)
        dv = det_inv * (-A01 * b0 + A00 * b1)
        u_n = jnp.clip(u_b + du, 1.0, w - 2.0)
        v_n = jnp.clip(v_b + dv, 1.0, h - 2.0)
        return s_b, cost_b, u_b, v_b, u_n, v_n, lam, conv

    lam0 = jnp.full(u0.shape, lambda_init, dtype=u0.dtype)
    conv0 = jnp.zeros(u0.shape, dtype=bool)
    inf0 = jnp.full(u0.shape, jnp.inf, dtype=u0.dtype)
    s0 = jnp.zeros(u0.shape + (c,), dtype=rays_with_grad_img.dtype)
    state = (s0, inf0, u0, v0, u0, v0, lam0, conv0)
    # max_iter + 1 evaluations: the first consumes the init point (accepted
    # vs cost=inf), the remaining max_iter are LM proposals — the same
    # trajectory as the 2-gather-per-iteration formulation with max_iter.
    state = jax.lax.fori_loop(0, max_iter + 1, body, state)
    _, cost, u, v, _, _, _, conv = state
    return jnp.stack([u, v], axis=-1), conv


@partial(jax.jit, static_argnames=("radius", "dilation_max"))
def refine_matches(D11, D21, p1, radius: int = 3, dilation_max: int = 5):
    """Coarse-to-fine dilated descriptor search around integer pixels p1.

    Args:
      D11: (b, h, w, f) dense descriptor image of view 1.
      D21: (b, n, f) descriptors of view 2's points.
      p1: (b, n, 2) int pixel positions in view 1.
    Returns: refined (b, n, 2) int32 positions.
    """
    b, h, w, f = D11.shape
    flat = D11.reshape(b, h * w, f)
    cdt = jnp.promote_types(D11.dtype, D21.dtype)

    u0 = p1[..., 0].astype(jnp.int32)
    v0 = p1[..., 1].astype(jnp.int32)

    for d in range(dilation_max, 0, -1):
        rd = radius * d
        offs = jnp.arange(-rd, rd + 1, d, dtype=jnp.int32)
        ou = jnp.tile(offs, offs.shape[0])          # (k*k,) fast u
        ov = jnp.repeat(offs, offs.shape[0])        # (k*k,) slow v
        u = u0[..., None] + ou                      # (b, n, k*k)
        v = v0[..., None] + ov
        inside = (u >= 0) & (u < w) & (v >= 0) & (v < h)
        uc = jnp.clip(u, 0, w - 1)
        vc = jnp.clip(v, 0, h - 1)
        idx = vc * w + uc                           # (b, n, k*k)

        cand = jnp.take_along_axis(
            flat, idx.reshape(b, -1)[..., None], axis=1
        ).reshape(b, u.shape[1], -1, f)

        scores = jnp.einsum(
            "bnkf,bnf->bnk", cand.astype(cdt), D21.astype(cdt),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.where(inside, scores, -jnp.inf)
        best = jnp.argmax(scores, axis=-1)
        u0 = jnp.take_along_axis(uc, best[..., None], axis=-1)[..., 0]
        v0 = jnp.take_along_axis(vc, best[..., None], axis=-1)[..., 0]

    return jnp.stack([u0, v0], axis=-1)


def match(X11, X21, D11, D21, idx_1_to_2_init=None, max_iter: int = 10,
          lambda_init: float = 1e-8, convergence_thresh: float = 1e-6,
          dist_thresh: float = 1e-1, radius: int = 3, dilation_max: int = 5,
          subpixel: bool = False, coarse_iter: int = 0,
          separable_refine: bool = False, refine_dtype: str = "bfloat16",
          payload=None):
    """Full matcher: ray LM projection + occlusion gate + descriptor refine.

    Spec: matching.py:52-90. Shapes: X11/X21 (b,h,w,3), D11/D21 (b,h,w,f).
    Returns (idx_1_to_2 (b, h*w) int32, valid (b, h*w, 1) bool), plus — when
    ``subpixel`` — the float match positions p_sub (b, h*w, 2).

    ``subpixel`` goes beyond the reference (which truncates matches to
    integer pixels because its CUDA GN gathers by index,
    matching.py:67/p1.long()): after the integer descriptor refinement, a
    short LM polish re-runs from the refined position and the float result
    is returned so the tracker can interpolate correspondences, removing
    the half-pixel quantization floor from the pose residuals.

    ``coarse_iter`` > 0 enables a pyramidal (coarse-query) LM stage: the LM
    projection first runs ``coarse_iter`` iterations on a stride-2 subgrid
    of the queries (4x fewer per-pixel gathers — the dominant matcher cost
    on TPU, DEVELOPMENT.md), the resulting flow is upsampled to all queries,
    and only ``max_iter`` full-resolution iterations polish from there.
    The flow between a frame and the warm-started previous match is smooth
    at stride 2, so the trajectory is unchanged (oracle ATE regression).

    ``payload`` (b, h, w, p) fp32, requires radius > 0 and not subpixel:
    rides extra per-pixel channels inside the refine's window-row gathers
    (bit-exact) and changes the return to (idx, valid, payload_at_match) —
    the occlusion gate's point gather and the caller's at-match gathers
    are folded into the refine (see
    window_gather.refine_and_gather_full_unfold).

    X21/D21 may be a SUB-GRID of the full query image (shape (b, hq, wq,
    .) with hq/wq != h/w — e.g. every ``point_stride``-th column for BA
    edge matching, dense_matcher.match_dense(query_stride=...)): the
    target image and all returned indices stay full-resolution, only the
    query set shrinks. Requires an explicit ``idx_1_to_2_init`` (the
    identity init is only meaningful on the full grid).
    """
    b, h, w, _ = X11.shape
    hq, wq = X21.shape[1], X21.shape[2]
    n = hq * wq

    rays_grad = prep_rays_grad(X11)
    pts3d_norm = _normalize(X21.reshape(b, n, 3))
    if idx_1_to_2_init is None:
        if (hq, wq) != (h, w):
            raise ValueError(
                "sub-grid queries need an explicit idx_1_to_2_init "
                f"(X11 {h}x{w} vs X21 {hq}x{wq})")
        idx_1_to_2_init = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    p_init = lin_to_pixel(idx_1_to_2_init, w).astype(X11.dtype)

    if coarse_iter > 0 and (hq % 2 or wq % 2):
        raise ValueError(
            f"coarse_iter > 0 needs an even working resolution, got "
            f"{hq}x{wq}; set matching.coarse_iter: 0 for this image size "
            "(a silent fall-through would leave only max_iter LM "
            "iterations and quietly under-converge the projection)")
    valid_coarse = None
    if coarse_iter > 0:
        p_img = p_init.reshape(b, hq, wq, 2)
        t_img = pts3d_norm.reshape(b, hq, wq, 3)
        pc = p_img[:, ::2, ::2].reshape(b, n // 4, 2)
        tc = t_img[:, ::2, ::2].reshape(b, n // 4, 3)
        p_c, v_c = iter_proj(rays_grad, tc, pc, coarse_iter, lambda_init,
                             convergence_thresh)
        flow = (p_c - pc).reshape(b, hq // 2, wq // 2, 2)
        flow_up = jnp.repeat(jnp.repeat(flow, 2, axis=1), 2, axis=2)
        p_init = (p_img + flow_up).reshape(b, n, 2)
        v_img = v_c.reshape(b, hq // 2, wq // 2)
        valid_coarse = jnp.repeat(jnp.repeat(v_img, 2, axis=1), 2,
                                  axis=2).reshape(b, n)

    if max_iter == 0 and valid_coarse is not None:
        # pyramidal-only mode: the upsampled coarse flow IS the projection
        # (within ~1 px of the LM fixpoint for smooth flow) and the +-r
        # descriptor window absorbs the residual — skipping the full-res
        # evaluation saves one h*w row gather per frame, the single
        # largest matcher cost (one row ~ fixed latency; DEVELOPMENT.md)
        p1 = p_init
        valid_proj = valid_coarse
    else:
        p1, valid_proj = iter_proj(rays_grad, pts3d_norm, p_init, max_iter,
                                   lambda_init, convergence_thresh)
    p1i = jnp.clip(p1.astype(jnp.int32),
                   jnp.zeros((2,), jnp.int32),
                   jnp.asarray([w - 1, h - 1], jnp.int32))

    if refine_dtype not in ("bfloat16", "int8"):
        raise ValueError(
            f"refine_dtype must be 'bfloat16' or 'int8', got "
            f"{refine_dtype!r} (a silent fall-through would quietly run "
            "bf16 while the user believes the quantized search is active)")
    if payload is not None:
        if radius <= 0 or subpixel:
            raise ValueError("payload requires radius > 0 and not subpixel")
        if refine_dtype != "bfloat16":
            raise ValueError("payload rides bf16-bitcast rows; "
                             "refine_dtype='int8' is not supported with it")
        from .window_gather import refine_and_gather_full_unfold

        # one row gather per level carries descriptors + X11 + payload;
        # the occlusion gate reads X11 at the window center (== p1i) and
        # the caller's channels come back at the final match position
        full_pay = jnp.concatenate([X11, payload], axis=-1)
        p1i, pay_c, pay_m = refine_and_gather_full_unfold(
            D11, D21.reshape(b, n, -1), p1i, full_pay, radius, dilation_max)
        dists = jnp.linalg.norm(pay_c[..., :3] - X21.reshape(b, n, 3),
                                axis=-1)
        valid = valid_proj & (dists < dist_thresh)
        # pay_m[..., :3] = X11 at the match; [..., 3:] = caller payload
        return pixel_to_lin(p1i, w), valid[..., None], pay_m

    # occlusion gate: 3D distance between matched points
    lin = pixel_to_lin(p1i, w)
    X11_flat = X11.reshape(b, h * w, 3)
    X11_at = jnp.take_along_axis(X11_flat, lin[..., None], axis=1)
    dists = jnp.linalg.norm(X11_at - X21.reshape(b, n, 3), axis=-1)
    valid = valid_proj & (dists < dist_thresh)

    if radius > 0:
        from .window_gather import (refine_matches_full_unfold,
                                    refine_matches_separable,
                                    refine_matches_unfold)

        # half precision for the window search (reference uses fp16,
        # matching.py:80-86). Two equality-tested layouts: k row gathers
        # per level (unfold) vs ONE row gather per level over a
        # (2r+1)^2-wide unfold (full) — row gathers are latency-priced, so
        # fewer-but-wider wins whenever the (2r+1)^2 build traffic stays
        # small: measured on chip, full wins for >= 2 levels at any radius
        # AND for single-level r <= 2 (25x build, ~1.5x faster; see
        # DEVELOPMENT.md gather notes). ``separable_refine`` swaps in the
        # 2-gather axis-by-axis search (approximate; see
        # window_gather.refine_matches_separable).
        if separable_refine:
            refine = refine_matches_separable
        else:
            refine = (refine_matches_full_unfold
                      if dilation_max >= 2 or radius <= 2
                      else refine_matches_unfold)
        if refine_dtype == "int8":
            # descriptors are L2-normalized (components in [-1, 1]);
            # symmetric x127 quantization halves the gathered window-row
            # bytes (the refine's cost driver) and preserves the argmax to
            # quantization ties (oracle-ATE-validated; DEVELOPMENT.md)
            cast = lambda x: jnp.clip(
                jnp.round(x.astype(jnp.float32) * 127.0),
                -127, 127).astype(jnp.int8)
        else:
            cast = lambda x: x.astype(jnp.bfloat16)
        p1i = refine(cast(D11), cast(D21.reshape(b, n, -1)),
                     p1i, radius, dilation_max)

    if not subpixel:
        return pixel_to_lin(p1i, w), valid[..., None]

    p_sub, _ = iter_proj(rays_grad, pts3d_norm, p1i.astype(X11.dtype),
                         max(2, max_iter // 3), lambda_init,
                         convergence_thresh)
    return pixel_to_lin(p1i, w), valid[..., None], p_sub
