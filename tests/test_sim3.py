import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.lie import sim3


def random_sim3(key, batch=()):
    k1, k2, k3 = jax.random.split(key, 3)
    xi = jnp.concatenate(
        [
            0.5 * jax.random.normal(k1, batch + (3,)),
            0.7 * jax.random.normal(k2, batch + (3,)),
            0.3 * jax.random.normal(k3, batch + (1,)),
        ],
        axis=-1,
    )
    return sim3.exp(xi), xi


def test_identity_act():
    T = sim3.identity()
    X = jnp.array([[1.0, 2.0, 3.0]])
    np.testing.assert_allclose(sim3.act(T, X), X, atol=1e-6)


def test_exp_log_roundtrip():
    key = jax.random.PRNGKey(0)
    T, xi = random_sim3(key, (16,))
    xi_back = sim3.log(T)
    np.testing.assert_allclose(np.asarray(xi_back), np.asarray(xi), atol=1e-4)


def test_exp_zero_is_identity():
    T = sim3.exp(jnp.zeros(7))
    np.testing.assert_allclose(np.asarray(T), np.asarray(sim3.identity()), atol=1e-7)


def test_inverse_compose():
    key = jax.random.PRNGKey(1)
    T, _ = random_sim3(key, (8,))
    I = sim3.mul(T, sim3.inv(T))
    np.testing.assert_allclose(
        np.asarray(I), np.asarray(sim3.identity((8,))), atol=1e-5
    )


def test_compose_matches_matrix():
    key = jax.random.PRNGKey(2)
    Ta, _ = random_sim3(jax.random.fold_in(key, 0))
    Tb, _ = random_sim3(jax.random.fold_in(key, 1))
    M = sim3.matrix(sim3.mul(Ta, Tb))
    M_ref = sim3.matrix(Ta) @ sim3.matrix(Tb)
    np.testing.assert_allclose(np.asarray(M), np.asarray(M_ref), atol=1e-5)


def test_act_matches_matrix():
    key = jax.random.PRNGKey(3)
    T, _ = random_sim3(key)
    X = jax.random.normal(jax.random.fold_in(key, 9), (5, 3))
    Y = sim3.act(T, X)
    Xh = jnp.concatenate([X, jnp.ones((5, 1))], axis=-1)
    Y_ref = (sim3.matrix(T) @ Xh.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(Y), np.asarray(Y_ref), atol=1e-5)


def test_retr_left_composition():
    key = jax.random.PRNGKey(4)
    T, _ = random_sim3(key)
    xi = 0.1 * jax.random.normal(jax.random.fold_in(key, 5), (7,))
    np.testing.assert_allclose(
        np.asarray(sim3.retr(T, xi)),
        np.asarray(sim3.mul(sim3.exp(xi), T)),
        atol=1e-6,
    )


def test_small_angle_stability():
    # tiny rotations / scales must not produce NaNs (Taylor branches)
    for eps in [0.0, 1e-10, 1e-7, 1e-5]:
        xi = jnp.array([0.1, -0.2, 0.3, eps, -eps, eps, eps])
        T = sim3.exp(xi)
        assert np.all(np.isfinite(np.asarray(T)))
        xi_back = sim3.log(T)
        np.testing.assert_allclose(np.asarray(xi_back), np.asarray(xi), atol=1e-5)


def test_adj_inv_numeric():
    """apply_adj_inv_T: row-vector v -> v @ Adj(T)^{-1}; check against the
    numerical adjoint built from exp/log."""
    key = jax.random.PRNGKey(6)
    T, _ = random_sim3(key)
    v = jax.random.normal(jax.random.fold_in(key, 7), (7,))

    # Adjoint via its definition: Adj(T) xi = log(T exp(xi) T^-1), linearized.
    def adj(xi):
        return sim3.log(sim3.mul(T, sim3.mul(sim3.exp(xi), sim3.inv(T))))

    A = jax.jacfwd(adj)(jnp.zeros(7))
    expected = jnp.linalg.solve(A.T, v)  # v @ A^{-1} = A^{-T} v
    got = sim3.apply_adj_inv_T(T, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4)


def test_jit_vmap():
    key = jax.random.PRNGKey(8)
    T, _ = random_sim3(key, (4,))
    X = jax.random.normal(key, (4, 10, 3))
    f = jax.jit(jax.vmap(sim3.act))
    Y = f(T, X)
    assert Y.shape == (4, 10, 3)


def test_exp_log_gradients_finite_at_small_angles():
    """grad through exp/log must stay finite near theta=0 / sigma=0 (the
    module's jit/vmap/grad contract)."""
    for eps in [0.0, 1e-9, 1e-6]:
        xi = jnp.array([0.1, -0.2, 0.3, eps, -eps, eps, eps])
        g = jax.grad(lambda x: jnp.sum(sim3.exp(x) ** 2))(xi)
        assert np.all(np.isfinite(np.asarray(g))), (eps, np.asarray(g))
        T = sim3.exp(jnp.array([0.1, -0.2, 0.3, 0.2, 0.1, -0.1, 0.05]))
        g2 = jax.grad(lambda t: jnp.sum(sim3.log(t) ** 2))(T)
        assert np.all(np.isfinite(np.asarray(g2)))
