import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import gradient, matching


def test_img_gradient_matches_torch_conv():
    torch = __import__("torch")
    F = torch.nn.functional
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)

    gx, gy = gradient.img_gradient(jnp.asarray(img))

    # torch reference with grouped conv (reference image.py semantics)
    x = torch.from_numpy(img).permute(0, 3, 1, 2)
    kx = (1 / 32) * torch.tensor([[-3.0, 0, 3], [-10, 0, 10], [-3, 0, 3]])
    ky = (1 / 32) * torch.tensor([[-3.0, -10, -3], [0, 0, 0], [3, 10, 3]])
    kx = kx.repeat(3, 1, 1, 1)
    ky = ky.repeat(3, 1, 1, 1)
    xp = F.pad(x, (1, 1, 1, 1), mode="reflect")
    gx_t = F.conv2d(xp, kx, groups=3).permute(0, 2, 3, 1).numpy()
    gy_t = F.conv2d(xp, ky, groups=3).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(gx), gx_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), gy_t, atol=1e-5)


def _synthetic_pointmaps(key, h=24, w=32, shift=(2, 3)):
    """Two pointmaps where X21 is X11 shifted by integer pixels -> the true
    match of point (u,v) in view 2 is (u+shift_u, v+shift_v) in view 1."""
    du, dv = shift
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32), indexing="xy")
    # smooth depth surface
    z = 2.0 + 0.3 * jnp.sin(u / 7.0) + 0.2 * jnp.cos(v / 5.0)
    X = jnp.stack([(u - w / 2) / 20.0 * z, (v - h / 2) / 20.0 * z, z], axis=-1)
    X11 = X[None]
    # view2 points are view1 points at shifted pixels
    X21 = jnp.roll(X, shift=(-dv, -du), axis=(0, 1))[None]
    return X11, X21


def test_iter_proj_recovers_shift():
    key = jax.random.PRNGKey(0)
    h, w, du, dv = 24, 32, 2, 3
    X11, X21 = _synthetic_pointmaps(key, h, w, (du, dv))
    rays = matching.prep_rays_grad(X11)
    n = h * w
    pts = X21.reshape(1, n, 3)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    idx0 = jnp.arange(n, dtype=jnp.int32)[None]
    p_init = matching.lin_to_pixel(idx0, w).astype(jnp.float32)
    p, conv = matching.iter_proj(rays, pts, p_init, max_iter=10,
                                 lambda_init=1e-8, cost_thresh=1e-6)
    # interior pixels whose true match is also interior must land on it
    u0 = p_init[0, :, 0]
    v0 = p_init[0, :, 1]
    interior = (u0 + du >= 2) & (u0 + du < w - 2) & (v0 + dv >= 2) & (v0 + dv < h - 2)
    interior &= (u0 >= 2) & (v0 >= 2) & (u0 < w - 2) & (v0 < h - 2)
    err_u = np.abs(np.asarray(p[0, :, 0] - (u0 + du)))[np.asarray(interior)]
    err_v = np.abs(np.asarray(p[0, :, 1] - (v0 + dv)))[np.asarray(interior)]
    frac_ok = np.mean((err_u < 0.5) & (err_v < 0.5))
    assert frac_ok > 0.9, frac_ok


def _refine_reference(D11, D21, p1, radius, dilation_max):
    """Scalar reference with the exact CUDA search semantics
    (matching_kernels.cu:25-81): per dilation level, strict-> argmax over the
    dilated window, recentering between levels."""
    b, h, w, f = D11.shape
    out = p1.copy()
    for bi in range(b):
        for n in range(p1.shape[1]):
            u0, v0 = int(p1[bi, n, 0]), int(p1[bi, n, 1])
            for d in range(dilation_max, 0, -1):
                rd = radius * d
                best = -1e30
                un, vn = u0, v0
                for i in range(0, 2 * rd + 1, d):
                    for j in range(0, 2 * rd + 1, d):
                        u, v = u0 - rd + i, v0 - rd + j
                        if 0 <= u < w and 0 <= v < h:
                            s = float(np.dot(D21[bi, n], D11[bi, v, u]))
                            if s > best:
                                best = s
                                un, vn = u, v
                u0, v0 = un, vn
            out[bi, n] = [u0, v0]
    return out


def test_refine_matches_equals_scalar_reference():
    key = jax.random.PRNGKey(1)
    b, h, w, f = 1, 16, 20, 8
    D11 = jax.random.normal(key, (b, h, w, f))
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    rng = np.random.default_rng(2)
    n = 50
    us = rng.integers(0, w, n)
    vs = rng.integers(0, h, n)
    D21 = np.asarray(D11)[0, vs, us][None]
    p_init = np.stack([us, vs], axis=-1)[None] + rng.integers(-2, 3, (1, n, 2))
    p = matching.refine_matches(D11, jnp.asarray(D21), jnp.asarray(p_init),
                                radius=2, dilation_max=2)
    p_ref = _refine_reference(np.asarray(D11), D21, p_init.copy(), 2, 2)
    np.testing.assert_array_equal(np.asarray(p), p_ref)


def test_refine_matches_exact_hit_fine_only():
    # with dilation_max=1 and init within +-radius, the exact-descriptor
    # pixel is always inside the window and must win
    key = jax.random.PRNGKey(4)
    b, h, w, f = 1, 16, 20, 8
    D11 = jax.random.normal(key, (b, h, w, f))
    D11 = D11 / jnp.linalg.norm(D11, axis=-1, keepdims=True)
    rng = np.random.default_rng(5)
    n = 50
    us = rng.integers(0, w, n)
    vs = rng.integers(0, h, n)
    D21 = np.asarray(D11)[0, vs, us][None]
    p_init = np.stack([us, vs], axis=-1)[None] + rng.integers(-2, 3, (1, n, 2))
    p = matching.refine_matches(D11, jnp.asarray(D21), jnp.asarray(p_init),
                                radius=2, dilation_max=1)
    hit = np.mean((np.asarray(p[0, :, 0]) == us) & (np.asarray(p[0, :, 1]) == vs))
    assert hit == 1.0, hit


def test_match_end_to_end_shift():
    key = jax.random.PRNGKey(3)
    h, w, du, dv = 24, 32, 2, 1
    X11, X21 = _synthetic_pointmaps(key, h, w, (du, dv))
    # descriptors tied to geometry: same shift
    D = jax.random.normal(key, (h, w, 8))
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    D11 = D[None]
    D21 = jnp.roll(D, shift=(-dv, -du), axis=(0, 1))[None]
    idx, valid = matching.match(X11, X21, D11, D21, dist_thresh=0.5, radius=1,
                                dilation_max=1)
    n = h * w
    uv = matching.lin_to_pixel(jnp.arange(n, dtype=jnp.int32), w)
    expect_u = np.asarray(uv[:, 0]) + du
    expect_v = np.asarray(uv[:, 1]) + dv
    got = matching.lin_to_pixel(idx[0], w)
    interior = (
        (expect_u >= 2) & (expect_u < w - 2) & (expect_v >= 2) & (expect_v < h - 2)
        & (np.asarray(uv[:, 0]) >= 2) & (np.asarray(uv[:, 1]) >= 2)
        & (np.asarray(uv[:, 0]) < w - 2) & (np.asarray(uv[:, 1]) < h - 2)
    )
    acc = np.mean(
        (np.asarray(got[:, 0]) == expect_u)[interior]
        & (np.asarray(got[:, 1]) == expect_v)[interior]
    )
    assert acc > 0.9, acc
    assert np.asarray(valid)[0, interior].mean() > 0.9


def test_match_pyramidal_only_equals_polished():
    """coarse_iter>0 with max_iter=0 (pyramidal-only: the upsampled coarse
    flow feeds the descriptor window directly, skipping the full-res LM
    evaluation — one h*w row gather saved per frame) recovers the same
    matches as the polished path on a smooth-flow fixture."""
    key = jax.random.PRNGKey(3)
    h, w, du, dv = 24, 32, 2, 1
    X11, X21 = _synthetic_pointmaps(key, h, w, (du, dv))
    D = jax.random.normal(key, (h, w, 8))
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    D11 = D[None]
    D21 = jnp.roll(D, shift=(-dv, -du), axis=(0, 1))[None]

    kw = dict(dist_thresh=0.5, radius=2, dilation_max=1)
    idx_ref, val_ref = matching.match(X11, X21, D11, D21, coarse_iter=4,
                                      max_iter=1, **kw)
    idx_pyr, val_pyr = matching.match(X11, X21, D11, D21, coarse_iter=4,
                                      max_iter=0, **kw)
    n = h * w
    uv = matching.lin_to_pixel(jnp.arange(n, dtype=jnp.int32), w)
    interior = ((np.asarray(uv[:, 0]) >= 4) & (np.asarray(uv[:, 0]) < w - 4)
                & (np.asarray(uv[:, 1]) >= 4) & (np.asarray(uv[:, 1]) < h - 4))
    same = np.asarray(idx_ref[0] == idx_pyr[0])[interior]
    assert same.mean() > 0.95, same.mean()
    assert np.asarray(val_pyr)[0, interior].mean() > 0.9


def test_match_int8_refine_close_to_bf16():
    """refine_dtype=int8 (halved window-row bytes) recovers nearly the same
    matches as the bf16 search on the shift fixture; kept off by default
    (oracle rel-ATE +4-5%, DEVELOPMENT.md)."""
    key = jax.random.PRNGKey(3)
    h, w, du, dv = 24, 32, 2, 1
    X11, X21 = _synthetic_pointmaps(key, h, w, (du, dv))
    D = jax.random.normal(key, (h, w, 8))
    D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
    D11 = D[None]
    D21 = jnp.roll(D, shift=(-dv, -du), axis=(0, 1))[None]

    kw = dict(dist_thresh=0.5, radius=2, dilation_max=1, coarse_iter=4,
              max_iter=0)
    idx_bf, _ = matching.match(X11, X21, D11, D21,
                               refine_dtype="bfloat16", **kw)
    idx_i8, val = matching.match(X11, X21, D11, D21,
                                 refine_dtype="int8", **kw)
    same = float(np.asarray(idx_bf[0] == idx_i8[0]).mean())
    assert same > 0.95, same
    assert float(np.asarray(val).mean()) > 0.8   # matches remain valid

    import pytest

    with pytest.raises(ValueError, match="refine_dtype"):
        matching.match(X11, X21, D11, D21, refine_dtype="int4", **kw)
