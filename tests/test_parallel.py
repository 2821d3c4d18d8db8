import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.parallel import dist_ba, mesh as mesh_mod
from mast3r_slam_tpu.slam import ba

from test_ba import _edges, _make_world


def test_distributed_gn_matches_single_device():
    assert jax.device_count() >= 8, "conftest should provide 8 cpu devices"
    key = jax.random.PRNGKey(0)
    n_kf, P = 5, 256
    T_true, Xs = _make_world(key, n_kf, P)
    Cs = jnp.full((n_kf, P), 5.0)
    ii, jj, idx, valid, Q, mask = _edges(n_kf, P, extra=[(0, n_kf - 1)])

    noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 7), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    cfg = ba.BAConfig(max_iters=5, point_chunk=256)
    T_local = ba.gauss_newton_rays(T_init, Xs, Cs, ii, jj, idx, valid, Q,
                                   mask, jnp.asarray(n_kf), cfg)

    m = mesh_mod.make_mesh(8)
    pad = lambda a, fill=0: mesh_mod.pad_to_multiple(a, 8, 0, fill)
    T_dist = dist_ba.gauss_newton_rays_dist(
        T_init, Xs, Cs, pad(ii), pad(jj), pad(idx), pad(valid, False),
        pad(Q), pad(mask), jnp.asarray(n_kf), m, cfg)

    np.testing.assert_allclose(np.asarray(T_dist), np.asarray(T_local),
                               atol=1e-4)


def test_dp_sharded_symmetric_decode():
    """Edge-batch decode sharded over the mesh equals the local result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mast3r_slam_tpu.models import TINY, init_params, mast3r

    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    h, w = cfg.img_size
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, h, w, 3))
    feat, pos = mast3r.encode(params, imgs, cfg)
    fi, fj = feat[0::2], feat[1::2]
    pi, pj = pos[0::2], pos[1::2]
    # pad edge batch 4 -> 8 for the 8-way mesh
    fi8 = jnp.concatenate([fi, fi]); fj8 = jnp.concatenate([fj, fj])
    pi8 = jnp.concatenate([pi, pi]); pj8 = jnp.concatenate([pj, pj])

    out_local = mast3r.inference_symmetric(params, fi8, pi8, fj8, pj8, cfg)

    m = mesh_mod.make_mesh(8)
    shard = NamedSharding(m, P("edge"))
    fi_s, pi_s, fj_s, pj_s = (jax.device_put(a, shard)
                              for a in (fi8, pi8, fj8, pj8))
    out_dist = mast3r.inference_symmetric(params, fi_s, pi_s, fj_s, pj_s, cfg)
    np.testing.assert_allclose(np.asarray(out_dist["Xii"]),
                               np.asarray(out_local["Xii"]), atol=2e-3)
    np.testing.assert_allclose(np.asarray(out_dist["Qji"]),
                               np.asarray(out_local["Qji"]), atol=2e-3)


def test_init_distributed_noop_and_2d_mesh():
    from mast3r_slam_tpu.parallel import mesh as mesh_mod

    assert mesh_mod.init_distributed(num_processes=1) is False
    m = mesh_mod.make_mesh_2d()
    assert m.devices.shape[0] == 1          # single host
    assert m.devices.size >= 1
    assert m.axis_names == ("host", "edge")


def test_kf_sharded_ba_matches_single_device():
    """Keyframe-sharded storage + one resharding prep + edge-local GN ==
    the single-device solver (SURVEY §5.7 map-sharding scale axis)."""
    key = jax.random.PRNGKey(3)
    n_kf, P = 5, 256
    T_true, Xs = _make_world(key, n_kf, P)
    Cs = jnp.full((n_kf, P), 5.0)
    ii, jj, idx, valid, Q, mask = _edges(n_kf, P, extra=[(0, n_kf - 1)])

    noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 7), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    cfg = ba.BAConfig(max_iters=5, point_chunk=256)
    T_local = ba.gauss_newton_rays(T_init, Xs, Cs, ii, jj, idx, valid, Q,
                                   mask, jnp.asarray(n_kf), cfg)

    m = mesh_mod.make_mesh(8)
    pad = lambda a, fill=0: mesh_mod.pad_to_multiple(a, 8, 0, fill)
    # keyframe maps live sharded; K=5 doesn't divide the mesh -> pad rows
    Xs_p = mesh_mod.pad_to_multiple(Xs, 8, 0)
    Cs_p = mesh_mod.pad_to_multiple(Cs, 8, 0)
    Xs_sh, Cs_sh = dist_ba.shard_keyframe_store(m, Xs_p, Cs_p)
    pre = dist_ba.prep_edges_kf_sharded(
        m, Xs_sh, Cs_sh, pad(ii), pad(jj), pad(idx), pad(valid, False))
    T_dist = dist_ba.gauss_newton_rays_dist_pre(
        T_init, pre, pad(ii), pad(jj), pad(valid, False), pad(Q), pad(mask),
        jnp.asarray(n_kf), m, cfg)

    np.testing.assert_allclose(np.asarray(T_dist), np.asarray(T_local),
                               atol=1e-4)
