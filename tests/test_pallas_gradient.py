"""Pallas Scharr kernel == XLA stencil (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import gradient, pallas_gradient


def test_pallas_scharr_matches_xla_stencil():
    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (17, 33, 3))
    gx0, gy0 = gradient.img_gradient(img)
    gx1, gy1 = pallas_gradient.img_gradient_pallas(img, interpret=True)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy0), atol=1e-6)


def test_pallas_scharr_batched():
    key = jax.random.PRNGKey(1)
    img = jax.random.normal(key, (2, 8, 16, 3))
    gx0, gy0 = gradient.img_gradient(img)
    gx1, gy1 = pallas_gradient.img_gradient_pallas(img, interpret=True)
    assert gx1.shape == img.shape
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy0), atol=1e-6)
