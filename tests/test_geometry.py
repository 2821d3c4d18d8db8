import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu import geometry
from mast3r_slam_tpu.lie import sim3


def test_point_to_ray_dist_jacobian():
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (32, 3)) + jnp.array([0.0, 0.0, 3.0])
    rd, J = geometry.point_to_ray_dist(X, jacobian=True)
    J_num = jax.vmap(jax.jacfwd(lambda x: geometry.point_to_ray_dist(x)))(X)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_num), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(rd[:, 3]), np.linalg.norm(np.asarray(X), axis=-1), atol=1e-5
    )


def test_act_sim3_jacobian():
    key = jax.random.PRNGKey(1)
    T = sim3.exp(0.3 * jax.random.normal(key, (7,)))
    X = jax.random.normal(jax.random.fold_in(key, 1), (16, 3))
    Y, J = geometry.act_Sim3(T, X, jacobian=True)

    # numeric: d/dxi [exp(xi) T] X at xi=0
    def f(xi, x):
        return sim3.act(sim3.retr(T, xi), x)

    J_num = jax.vmap(lambda x: jax.jacfwd(f)(jnp.zeros(7), x))(X)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_num), atol=1e-4)


def test_project_calib_jacobian_and_validity():
    K = jnp.array([[300.0, 0.0, 256.0], [0.0, 300.0, 192.0], [0.0, 0.0, 1.0]])
    img_size = (384, 512)
    key = jax.random.PRNGKey(2)
    P = jax.random.normal(key, (64, 3)) * jnp.array([0.3, 0.3, 0.2]) + jnp.array(
        [0.0, 0.0, 2.0]
    )
    pz, J, valid = geometry.project_calib(P, K, img_size, jacobian=True)
    assert bool(valid.any())

    def f(p):
        return geometry.project_calib(p, K, img_size)[0]

    J_num = jax.vmap(jax.jacfwd(f))(P)
    np.testing.assert_allclose(np.asarray(J), np.asarray(J_num), atol=1e-3)


def test_project_invalid_depth_no_nan():
    K = jnp.eye(3)
    P = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 0.0]])
    pz, J, valid = geometry.project_calib(P, K, (10, 10), jacobian=True, z_eps=1e-6)
    assert not bool(valid.any())
    assert np.all(np.isfinite(np.asarray(pz)))
    assert np.all(np.isfinite(np.asarray(J)))


def test_backproject_project_roundtrip():
    K = jnp.array([[300.0, 0.0, 250.0], [0.0, 280.0, 190.0], [0.0, 0.0, 1.0]])
    p = jnp.array([[100.0, 50.0], [400.0, 300.0]])
    z = jnp.array([[2.0], [5.0]])
    P = geometry.backproject(p, z, K)
    pz, valid = geometry.project_calib(P, K, (384, 512))
    np.testing.assert_allclose(np.asarray(pz[:, :2]), np.asarray(p), atol=1e-4)
    np.testing.assert_allclose(np.asarray(pz[:, 2:]), np.log(np.asarray(z)), atol=1e-4)


def test_constrain_points_to_ray():
    K = jnp.array([[300.0, 0.0, 256.0], [0.0, 300.0, 192.0], [0.0, 0.0, 1.0]])
    img_size = (4, 6)
    key = jax.random.PRNGKey(3)
    X = jax.random.normal(key, (24, 3)) + jnp.array([0.0, 0.0, 4.0])
    Xc = geometry.constrain_points_to_ray(img_size, X, K)
    # depth preserved
    np.testing.assert_allclose(np.asarray(Xc[:, 2]), np.asarray(X[:, 2]), atol=1e-6)
    # constrained points project exactly to the pixel grid
    pz, _ = geometry.project_calib(Xc, K, img_size, border=-10000)
    uv = geometry.pixel_coords(img_size)
    np.testing.assert_allclose(np.asarray(pz[:, :2]), np.asarray(uv), atol=1e-3)


def test_closed_form_pose_jacobians_match_composed():
    """ray_dist_pose_jacobian / calib_pose_jacobian == J_h = f'(P) @ dP/dxi
    (the composed form used as spec)."""
    key = jax.random.PRNGKey(7)
    T = sim3.exp(0.3 * jax.random.normal(key, (7,)))
    X = jax.random.normal(jax.random.fold_in(key, 1), (32, 3)) + jnp.array(
        [0.0, 0.0, 3.0])
    Y, dX_dT = geometry.act_Sim3(T, X, jacobian=True)

    _, drd_dX = geometry.point_to_ray_dist(Y, jacobian=True)
    J_composed = jnp.einsum("nrk,nkm->nrm", drd_dX, dX_dT)
    J_closed = geometry.ray_dist_pose_jacobian(Y)
    # the composed form carries fp32 roundoff in the analytically-zero
    # scale column; the closed form is exact there
    np.testing.assert_allclose(np.asarray(J_closed), np.asarray(J_composed),
                               atol=3e-4)

    K = jnp.array([[300.0, 0.0, 256.0], [0.0, 280.0, 192.0], [0.0, 0.0, 1.0]])
    _, dpz_dX, _ = geometry.project_calib(Y, K, (384, 512), jacobian=True)
    Jc_composed = jnp.einsum("nrk,nkm->nrm", dpz_dX, dX_dT)
    Jc_closed = geometry.calib_pose_jacobian(Y, K)
    d = np.abs(np.asarray(Jc_closed) - np.asarray(Jc_composed))
    rel = d / (np.abs(np.asarray(Jc_composed)) + 1.0)
    assert rel.max() < 5e-4, rel.max()


def test_estimate_focal_recovers_truth():
    from mast3r_slam_tpu import geometry

    h, w = 48, 64
    f_true = 72.5
    K = jnp.array([[f_true, 0.0, w / 2.0],
                   [0.0, f_true, h / 2.0],
                   [0.0, 0.0, 1.0]])
    uv = geometry.pixel_coords((h, w))
    key = jax.random.PRNGKey(0)
    z = 2.0 + jax.random.uniform(key, (h * w, 1))
    X = geometry.backproject(uv, z, K)

    f = float(geometry.estimate_focal(X, (h, w)))
    assert abs(f - f_true) < 1e-3 * f_true

    # robust to noise + gross outliers, helped by confidence weights
    noise = 0.002 * jax.random.normal(jax.random.fold_in(key, 1), X.shape)
    Xn = X + noise
    out_mask = jax.random.uniform(jax.random.fold_in(key, 2),
                                  (h * w, 1)) < 0.05
    Xn = jnp.where(out_mask, Xn * jnp.asarray([3.0, 0.2, 1.0]), Xn)
    conf = jnp.where(out_mask[:, 0], 0.5, 2.0)
    f_n = float(geometry.estimate_focal(Xn, (h, w), conf=conf))
    assert abs(f_n - f_true) < 0.03 * f_true
