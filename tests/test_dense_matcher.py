import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import dense_matcher, matching

from test_matching import _synthetic_pointmaps


def _shifted_world(key, h=32, w=48, du=9, dv=5, f=16):
    """Pointmaps + smooth descriptors under a LARGE integer shift (beyond
    the reference matcher's un-warm-started convergence basin)."""
    X11, X21 = _synthetic_pointmaps(key, h, w, (du, dv))
    # smooth descriptor field (so window refinement is meaningful)
    base = jax.random.normal(key, (h + 8, w + 8, f))
    k = jnp.ones((3, 3, 1)) / 9.0
    sm = jax.lax.conv_general_dilated(
        base.transpose(2, 0, 1)[:, None], jnp.ones((1, 1, 3, 3)) / 9.0,
        (1, 1), "SAME", dimension_numbers=("NCHW", "OIHW", "NCHW"))
    sm = sm[:, 0].transpose(1, 2, 0)[:h, :w]
    D = sm / jnp.maximum(jnp.linalg.norm(sm, axis=-1, keepdims=True), 1e-9)
    D11 = D[None]
    D21 = jnp.roll(D, shift=(-dv, -du), axis=(0, 1))[None]
    return X11, X21, D11, D21


def test_dense_matcher_recovers_large_shift():
    key = jax.random.PRNGKey(0)
    h, w, du, dv = 32, 48, 9, 5
    X11, X21, D11, D21 = _shifted_world(key, h, w, du, dv)
    idx, valid = dense_matcher.match_dense(X11, X21, D11, D21, stride=4,
                                           dist_thresh=0.5)
    n = h * w
    uv = matching.lin_to_pixel(jnp.arange(n, dtype=jnp.int32), w)
    expect_u = np.asarray(uv[:, 0]) + du
    expect_v = np.asarray(uv[:, 1]) + dv
    got = matching.lin_to_pixel(idx[0], w)
    interior = (
        (expect_u >= 4) & (expect_u < w - 4) & (expect_v >= 4)
        & (expect_v < h - 4)
        & (np.asarray(uv[:, 0]) >= 4) & (np.asarray(uv[:, 1]) >= 4)
        & (np.asarray(uv[:, 0]) < w - 4) & (np.asarray(uv[:, 1]) < h - 4)
    )
    err = np.abs(np.asarray(got[:, 0]) - expect_u)[interior] + np.abs(
        np.asarray(got[:, 1]) - expect_v)[interior]
    acc = np.mean(err <= 1)
    assert acc > 0.8, acc


def test_dense_matcher_large_motion_accuracy():
    """No warm start, large shift: the dense path localizes correspondences
    (real pointmaps are far less smooth than this fixture, which is where
    the coarse correlation earns its keep over identity-init LM)."""
    key = jax.random.PRNGKey(1)
    h, w, du, dv = 32, 48, 12, 7
    X11, X21, D11, D21 = _shifted_world(key, h, w, du, dv)

    idx_dn, valid_dn = dense_matcher.match_dense(X11, X21, D11, D21,
                                                 stride=4, dist_thresh=0.1)
    assert float(valid_dn.mean()) > 0.3
    n = h * w
    uv = matching.lin_to_pixel(jnp.arange(n, dtype=jnp.int32), w)
    expect = matching.pixel_to_lin(
        jnp.stack([uv[:, 0] + du, uv[:, 1] + dv], -1), w)
    interior = (
        (np.asarray(uv[:, 0]) + du < w - 4) & (np.asarray(uv[:, 1]) + dv < h - 4)
        & (np.asarray(uv[:, 0]) >= 4) & (np.asarray(uv[:, 1]) >= 4)
    )
    acc_dense = np.mean((np.asarray(idx_dn[0]) == np.asarray(expect))[interior])
    assert acc_dense > 0.5, acc_dense


def test_dense_matcher_query_stride():
    """query_stride=s matches only every s-th column (what BA reads at
    point_stride=s), scatters into full-size returns with valid False
    elsewhere, and keeps subset accuracy (factor_graph passes the BA
    stride; ba.py _edge_prep consumes idx/valid[:, ::s])."""
    key = jax.random.PRNGKey(0)
    h, w, du, dv = 32, 48, 9, 5
    X11, X21, D11, D21 = _shifted_world(key, h, w, du, dv)
    qs = 4
    idx, valid = dense_matcher.match_dense(X11, X21, D11, D21, stride=4,
                                           dist_thresh=0.5, query_stride=qs)
    assert idx.shape == (1, h * w) and valid.shape == (1, h * w, 1)
    v = np.asarray(valid[0, :, 0]).reshape(h, w)
    assert not v[:, np.arange(w) % qs != 0].any()      # off-subset False
    assert v[:, ::qs].mean() > 0.5                     # subset mostly valid

    n = h * w
    uv = matching.lin_to_pixel(jnp.arange(n, dtype=jnp.int32), w)
    expect_u = np.asarray(uv[:, 0]) + du
    expect_v = np.asarray(uv[:, 1]) + dv
    got = matching.lin_to_pixel(idx[0], w)
    sub = (np.asarray(uv[:, 0]) % qs == 0)
    interior = (
        (expect_u >= 4) & (expect_u < w - 4) & (expect_v >= 4)
        & (expect_v < h - 4)
        & (np.asarray(uv[:, 0]) >= 4) & (np.asarray(uv[:, 1]) >= 4)
        & (np.asarray(uv[:, 0]) < w - 4) & (np.asarray(uv[:, 1]) < h - 4)
    ) & sub
    err = np.abs(np.asarray(got[:, 0]) - expect_u)[interior] + np.abs(
        np.asarray(got[:, 1]) - expect_v)[interior]
    assert np.mean(err <= 1) > 0.8
