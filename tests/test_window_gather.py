import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import matching, window_gather


def test_phase_decimation_roundtrip():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (10, 14, 3))
    d, r = 3, 2
    P = window_gather.build_phase_decimation(img, d, r)
    # P[pv, pu, vv + r, uu + r] == img[vv*d + pv, uu*d + pu]
    for pv in range(d):
        for pu in range(d):
            for vv in range(10 // d):
                for uu in range(14 // d):
                    np.testing.assert_allclose(
                        np.asarray(P[pv, pu, vv + r, uu + r]),
                        np.asarray(img[vv * d + pv, uu * d + pu]))


def test_gather_dilated_windows_matches_direct():
    key = jax.random.PRNGKey(1)
    h, w, c = 24, 32, 4
    img = jax.random.normal(key, (h, w, c))
    d, r = 2, 3
    rng = np.random.default_rng(0)
    n = 40
    u0 = jnp.asarray(rng.integers(0, w, n), jnp.int32)
    v0 = jnp.asarray(rng.integers(0, h, n), jnp.int32)
    P = window_gather.build_phase_decimation(img, d, r)
    wnd = np.asarray(window_gather.gather_dilated_windows(P, u0, v0, d, r))
    for p in range(n):
        for i in range(2 * r + 1):
            for j in range(2 * r + 1):
                v = int(v0[p]) + (i - r) * d
                u = int(u0[p]) + (j - r) * d
                if 0 <= v < h and 0 <= u < w:
                    np.testing.assert_allclose(wnd[p, i, j],
                                               np.asarray(img[v, u]),
                                               err_msg=f"{p},{i},{j}")


def test_refine_window_equals_row_gather_impl():
    key = jax.random.PRNGKey(2)
    b, h, w, f = 1, 20, 28, 8
    D11 = jax.random.normal(key, (b, h, w, f))
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    n = h * w
    D21 = jax.random.normal(jax.random.fold_in(key, 1), (b, n, f))
    D21 = D21 / jnp.linalg.norm(D21, axis=-1, keepdims=True)
    rng = np.random.default_rng(3)
    p1 = jnp.asarray(
        np.stack([rng.integers(1, w - 1, n), rng.integers(1, h - 1, n)], -1)[None],
        jnp.int32)
    for radius, dil in [(3, 5), (2, 2), (1, 1)]:
        a = matching.refine_matches(D11, D21, p1, radius, dil)
        bwin = window_gather.refine_matches_window(D11, D21, p1, radius, dil)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bwin),
                                      err_msg=f"r={radius} d={dil}")


def test_refine_unfold_equals_row_gather_impl():
    key = jax.random.PRNGKey(4)
    b, h, w, f = 1, 20, 28, 8
    D11 = jax.random.normal(key, (b, h, w, f))
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    n = h * w
    D21 = jax.random.normal(jax.random.fold_in(key, 1), (b, n, f))
    D21 = D21 / jnp.linalg.norm(D21, axis=-1, keepdims=True)
    rng = np.random.default_rng(5)
    p1 = jnp.asarray(
        np.stack([rng.integers(1, w - 1, n), rng.integers(1, h - 1, n)], -1)[None],
        jnp.int32)
    for radius, dil in [(3, 5), (2, 2), (1, 1)]:
        a = matching.refine_matches(D11, D21, p1, radius, dil)
        u = window_gather.refine_matches_unfold(D11, D21, p1, radius, dil)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(u),
                                      err_msg=f"r={radius} d={dil}")


def test_refine_separable_exact_on_axis_peaks():
    """The separable (2-gather) search equals the full window argmax when
    the score peak lies on the start position's row (the coordinate-descent
    path sees it); elsewhere it is approximate — the oracle e2e regression
    showed it degrades trajectories, so it ships off-by-default
    (DEVELOPMENT.md). Queries are placed on a sparse grid so no window
    overlaps another query's peak."""
    key = jax.random.PRNGKey(6)
    b, h, w, f = 1, 24, 32, 8
    rng = np.random.default_rng(7)
    vs = np.arange(3, h - 3, 6)
    us = np.arange(3, w - 3, 6)
    v0, u_true = np.meshgrid(vs, us, indexing="ij")
    v0 = v0.ravel()
    u_true = u_true.ravel()
    n = v0.size
    u0 = np.clip(u_true + rng.integers(-2, 3, n), 2, w - 3)
    D11 = 0.01 * np.asarray(jax.random.normal(key, (b, h, w, f)))
    D21 = jax.random.normal(jax.random.fold_in(key, 1), (b, n, f))
    D21 = D21 / jnp.linalg.norm(D21, axis=-1, keepdims=True)
    D11[0, v0, u_true] = np.asarray(D21[0])
    D11 = jnp.asarray(D11)
    p1 = jnp.asarray(np.stack([u0, v0], -1)[None], jnp.int32)
    out = window_gather.refine_matches_separable(D11, D21, p1, 2, 1)
    full = matching.refine_matches(D11, D21, p1, 2, 1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(full))


def test_match_payload_mode_equals_plain():
    """match(..., payload=) returns identical idx/valid to plain match, and
    the payload comes back bit-exactly equal to explicit takes at the match
    indices (the fused single-gather path; ops.matching.match)."""
    key = jax.random.PRNGKey(8)
    b, h, w, f = 1, 24, 32, 8
    n = h * w
    uv = jnp.stack(jnp.meshgrid(jnp.linspace(-1, 1, w),
                                jnp.linspace(-0.75, 0.75, h),
                                indexing="xy"), -1)
    z = 2.0 + 0.3 * jnp.sin(uv[..., 0] * 3) * jnp.cos(uv[..., 1] * 2)
    X11 = jnp.concatenate([uv * z[..., None], z[..., None]], -1)[None]
    X21 = X11 + 0.01 * jax.random.normal(key, X11.shape)
    D = jax.random.normal(jax.random.fold_in(key, 1), (b, h, w, f))
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    payload = jax.random.normal(jax.random.fold_in(key, 2), (b, h, w, 5))

    for radius, dil in [(2, 1), (3, 2)]:
        kw = dict(max_iter=4, radius=radius, dilation_max=dil)
        idx_a, valid_a = matching.match(X11, X21, D, D, **kw)
        idx_b, valid_b, pm = matching.match(X11, X21, D, D, payload=payload,
                                            **kw)
        np.testing.assert_array_equal(np.asarray(idx_a), np.asarray(idx_b))
        np.testing.assert_array_equal(np.asarray(valid_a),
                                      np.asarray(valid_b))
        want_X = jnp.take_along_axis(X11.reshape(b, n, 3),
                                     idx_a[..., None], axis=1)
        want_p = jnp.take_along_axis(payload.reshape(b, n, 5),
                                     idx_a[..., None], axis=1)
        np.testing.assert_array_equal(np.asarray(pm[..., :3]),
                                      np.asarray(want_X))
        np.testing.assert_array_equal(np.asarray(pm[..., 3:]),
                                      np.asarray(want_p))


def test_patches_build_matches_slice_concat():
    """build_unfolded_windows_patches (conv im2col lowering) must hold the
    same window values as build_unfolded_windows, in channel-major (c,i,j)
    feature order (the refine consumer only re-indexes its einsum)."""
    key = jax.random.PRNGKey(11)
    h, w, c = 18, 22, 6
    img = jax.random.normal(key, (h, w, c), jnp.float32)
    for d, r in [(1, 2), (2, 1), (3, 3)]:
        a = np.asarray(window_gather.build_unfolded_windows(img, d, r))
        b = np.asarray(window_gather.build_unfolded_windows_patches(
            img, d, r))
        assert a.shape == b.shape
        k = 2 * r + 1
        bt = b.reshape(b.shape[:4] + (c, k, k)).transpose(
            0, 1, 2, 3, 5, 6, 4).reshape(a.shape)
        np.testing.assert_array_equal(a, bt)
