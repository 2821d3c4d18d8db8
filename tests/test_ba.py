import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu import geometry
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.slam import ba


def _make_world(key, n_kf=5, P=512):
    """Ground-truth world: keyframe poses on a path + shared 3D structure.

    Each keyframe observes the same world points; canonical pointmaps are the
    world points in each camera's frame. Matches are identity (point p in
    every view is the same world point).
    """
    kw, kp = jax.random.split(key)
    pts_w = jax.random.normal(kp, (P, 3)) * jnp.array([1.0, 1.0, 0.5]) + jnp.array(
        [0.0, 0.0, 4.0]
    )
    T_true = [sim3.identity()]
    for i in range(1, n_kf):
        xi = 0.12 * jax.random.normal(jax.random.fold_in(kw, i), (7,))
        T_true.append(sim3.mul(T_true[-1], sim3.exp(xi)))
    T_true = jnp.stack(T_true)                       # (n_kf, 8) T_WC
    # canonical pointmaps: X_k = T_WC_k^{-1} world
    Xs = jax.vmap(lambda T: sim3.act(sim3.inv(T), pts_w))(T_true)
    return T_true, Xs


def _edges(n_kf, P, extra=()):
    pairs = [(i, i + 1) for i in range(n_kf - 1)] + list(extra)
    ii, jj = [], []
    for i, j in pairs:       # two-way (prep_two_way_edges)
        ii += [i, j]
        jj += [j, i]
    E = len(ii)
    ii = jnp.array(ii, dtype=jnp.int32)
    jj = jnp.array(jj, dtype=jnp.int32)
    idx = jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32), (E, P))
    valid = jnp.ones((E, P), dtype=bool)
    Q = jnp.full((E, P), 4.0)
    mask = jnp.ones((E,), dtype=jnp.float32)
    return ii, jj, idx, valid, Q, mask


def test_gn_rays_recovers_poses():
    key = jax.random.PRNGKey(0)
    n_kf, P = 5, 512
    T_true, Xs = _make_world(key, n_kf, P)
    Cs = jnp.full((n_kf, P), 5.0)
    ii, jj, idx, valid, Q, mask = _edges(n_kf, P, extra=[(0, n_kf - 1)])

    # perturb all but the pinned pose
    noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 7), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    cfg = ba.BAConfig(max_iters=20, point_chunk=256)
    T_opt = ba.gauss_newton_rays(T_init, Xs, Cs, ii, jj, idx, valid, Q, mask,
                                 jnp.asarray(n_kf), cfg)

    err = jax.vmap(lambda a, b: sim3.log(sim3.mul(sim3.inv(a), b)))(T_true, T_opt)
    max_err = float(jnp.abs(err).max())
    assert max_err < 1e-3, np.asarray(err)


def test_gn_rays_capacity_padding_invariance():
    """Padded capacity slots must not change the solution."""
    key = jax.random.PRNGKey(1)
    n_kf, P = 4, 256
    T_true, Xs = _make_world(key, n_kf, P)
    Cs = jnp.full((n_kf, P), 5.0)
    ii, jj, idx, valid, Q, mask = _edges(n_kf, P)

    noise = 0.04 * jax.random.normal(jax.random.fold_in(key, 3), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    cfg = ba.BAConfig(max_iters=10, point_chunk=128)
    T_small = ba.gauss_newton_rays(T_init, Xs, Cs, ii, jj, idx, valid, Q,
                                   mask, jnp.asarray(n_kf), cfg)

    # pad keyframes to 8, edges to 12
    K_cap, E_cap = 8, 12
    padK = lambda x: jnp.concatenate(
        [x, jnp.zeros((K_cap - n_kf,) + x.shape[1:], x.dtype)]
    )
    T_init_p = jnp.concatenate(
        [T_init, sim3.identity((K_cap - n_kf,))], axis=0
    )
    E = ii.shape[0]
    padE = lambda x, fill=0: jnp.concatenate(
        [x, jnp.full((E_cap - E,) + x.shape[1:], fill, x.dtype)]
    )
    T_big = ba.gauss_newton_rays(
        T_init_p, padK(Xs), padK(Cs),
        padE(ii), padE(jj), padE(idx), padE(valid, False), padE(Q),
        padE(mask), jnp.asarray(n_kf), cfg,
    )
    np.testing.assert_allclose(
        np.asarray(T_big[:n_kf]), np.asarray(T_small), atol=1e-4
    )


def test_gn_calib_recovers_poses():
    """Plane-raycast fixture: every keyframe's canonical points lie on its own
    pixel rays (as after constrain_points_to_ray) and correspondences are the
    true reprojections, so ground truth is the (near-)optimum."""
    key = jax.random.PRNGKey(2)
    n_kf = 4
    h, w = 32, 48
    P = h * w
    K_mat = jnp.array([[60.0, 0.0, 24.0], [0.0, 60.0, 16.0], [0.0, 0.0, 1.0]])
    uv = geometry.pixel_coords((h, w))
    dirs_cam = geometry.backproject(uv, jnp.ones((P, 1)), K_mat)  # K^-1 [u,v,1]

    # world sphere (center straight ahead): smooth non-planar depth, no
    # plane-homography ambiguity in the pose system
    center_w = jnp.array([0.0, 0.0, 5.0])
    radius = 3.0

    T_true = [sim3.identity()]
    for i in range(1, n_kf):
        xi = 0.03 * jax.random.normal(jax.random.fold_in(key, i), (7,))
        T_true.append(sim3.mul(T_true[-1], sim3.exp(xi)))
    T_true = jnp.stack(T_true)

    def raycast(T):
        t, q, s = sim3.parts(T)
        dir_w = s * sim3.quat_act(q, dirs_cam)   # scaled rotation of dirs
        oc = t - center_w
        a = jnp.sum(dir_w * dir_w, axis=-1)
        b = 2.0 * dir_w @ oc
        c = jnp.dot(oc, oc) - radius ** 2
        disc = jnp.maximum(b * b - 4 * a * c, 0.0)
        s_hit = (-b - jnp.sqrt(disc)) / (2 * a)
        X_w = t + s_hit[:, None] * dir_w
        return X_w, sim3.act(sim3.inv(T), X_w)   # world pts, canonical pts

    Xw_list, Xc_list = zip(*[raycast(T_true[k]) for k in range(n_kf)])
    Xs = jnp.stack(Xc_list)
    Cs = jnp.full((n_kf, P), 5.0)

    # edges + true correspondences: point p of kf j -> nearest pixel in kf i
    pairs = [(i, i + 1) for i in range(n_kf - 1)]
    ii_l, jj_l, idx_l, val_l = [], [], [], []
    for a, b in pairs:
        for (i, j) in [(a, b), (b, a)]:
            Xj_in_i = sim3.act(sim3.inv(T_true[i]), Xw_list[j])
            pz, valid_p = geometry.project_calib(Xj_in_i, K_mat, (h, w))
            u = jnp.clip(jnp.round(pz[:, 0]), 0, w - 1).astype(jnp.int32)
            v = jnp.clip(jnp.round(pz[:, 1]), 0, h - 1).astype(jnp.int32)
            ii_l.append(i)
            jj_l.append(j)
            idx_l.append(v * w + u)
            val_l.append(valid_p[:, 0])
    ii = jnp.array(ii_l, dtype=jnp.int32)
    jj = jnp.array(jj_l, dtype=jnp.int32)
    idx = jnp.stack(idx_l)
    valid = jnp.stack(val_l)
    E = ii.shape[0]
    Q = jnp.full((E, P), 4.0)
    mask = jnp.ones((E,), dtype=jnp.float32)

    noise = 0.02 * jax.random.normal(jax.random.fold_in(key, 9), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    cfg = ba.BAConfig(max_iters=20, point_chunk=128)
    T_opt = ba.gauss_newton_calib(T_init, Xs, Cs, K_mat, ii, jj, idx, valid,
                                  Q, mask, jnp.asarray(n_kf), (h, w), cfg)

    # the correspondence rounding (+-0.5 px) sets a nonzero cost floor and
    # displaces the optimum slightly from ground truth: assert the solver
    # (a) reaches that floor and (b) stays in the ground-truth basin
    def cost_at(T):
        total = 0.0
        for e in range(E):
            i, j = int(ii[e]), int(jj[e])
            Tij = sim3.rel(T[i], T[j])
            Xj_Ci = sim3.act(Tij, Xs[j])
            pz, vp = geometry.project_calib(Xj_Ci, K_mat, (h, w),
                                            border=cfg.pixel_border,
                                            z_eps=cfg.depth_eps)
            u_t = (idx[e] % w).astype(jnp.float32)
            v_t = (idx[e] // w).astype(jnp.float32)
            zi = Xs[i][idx[e], 2]
            err_e = pz - jnp.stack(
                [u_t, v_t, jnp.log(jnp.maximum(zi, 1e-9))], -1)
            wm = (valid[e] & vp[:, 0]).astype(jnp.float32)
            total += float(jnp.sum((err_e * wm[:, None]) ** 2))
        return total

    c_gt = cost_at(T_true)
    c_init = cost_at(T_init)
    c_opt = cost_at(T_opt)
    assert c_opt <= 1.05 * c_gt, (c_gt, c_init, c_opt)
    assert c_opt < 0.05 * c_init, (c_gt, c_init, c_opt)
    err = jax.vmap(lambda a, b: sim3.log(sim3.mul(sim3.inv(a), b)))(T_true, T_opt)
    assert float(jnp.abs(err).max()) < 0.15, np.asarray(err)


def test_gn_points_recovers_poses():
    """Point-difference residual variant (exported like the reference's
    point_align kernel)."""
    key = jax.random.PRNGKey(5)
    n_kf, P = 4, 256
    T_true, Xs = _make_world(key, n_kf, P)
    Cs = jnp.full((n_kf, P), 5.0)
    ii, jj, idx, valid, Q, mask = _edges(n_kf, P)

    noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 7), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    cfg = ba.BAConfig(max_iters=20, point_chunk=128)
    T_opt = ba.gauss_newton_points(T_init, Xs, Cs, ii, jj, idx, valid, Q,
                                   mask, jnp.asarray(n_kf), cfg)
    err = jax.vmap(lambda a, b: sim3.log(sim3.mul(sim3.inv(a), b)))(T_true, T_opt)
    assert float(jnp.abs(err).max()) < 1e-3, np.asarray(err)


def test_adj_inv_matrix_equals_map():
    """The per-edge 7x7 inverse-adjoint matrix reproduces the per-row map
    (the algebra behind hoisting the adjoint out of the point loop)."""
    import jax

    from mast3r_slam_tpu.lie import sim3
    from mast3r_slam_tpu.slam import ba as ba_mod

    key = jax.random.PRNGKey(0)
    E, r, C = 3, 4, 5
    T = jax.vmap(sim3.exp)(0.3 * jax.random.normal(key, (E, 7)))
    J = jax.random.normal(jax.random.fold_in(key, 1), (E, r, 7, C))
    y1 = ba_mod._apply_adj_inv_T_t(T, J)
    y2 = jnp.einsum("eij,erjc->eric", ba_mod._adj_inv_matrix(T), J)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_fp32_solver_matches_fp64_at_scale():
    """K=512 loop-chain graph: the production equilibrated-fp32 Cholesky
    tracks the fp64 host solve (the Eigen-precision debug fallback,
    BAConfig.solver='fp64_host') — validating the reference's fp64 CPU
    solve replacement (gn_kernels.cu:57-159) at full keyframe capacity
    with long loop chains, where fp32 normal equations are most fragile."""
    key = jax.random.PRNGKey(11)
    n_kf, P = 512, 32
    kw, kp = jax.random.split(key)
    pts_w = jax.random.normal(kp, (P, 3)) * jnp.array([1.0, 1.0, 0.5]) + \
        jnp.array([0.0, 0.0, 4.0])
    T_list = [sim3.identity()]
    for i in range(1, n_kf):
        xi = 0.02 * jax.random.normal(jax.random.fold_in(kw, i), (7,))
        T_list.append(sim3.mul(T_list[-1], sim3.exp(xi)))
    T_true = jnp.stack(T_list)
    Xs = jax.vmap(lambda T: sim3.act(sim3.inv(T), pts_w))(T_true)
    Cs = jnp.full((n_kf, P), 5.0)

    # consecutive chain + sparse long-range loop closures
    loops = [(i, i + 64) for i in range(0, n_kf - 64, 64)] + [(0, n_kf - 1)]
    ii, jj, idx, valid, Q, mask = _edges(n_kf, P, extra=loops)

    noise = 0.03 * jax.random.normal(jax.random.fold_in(key, 7), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    results = {}
    for solver in ("fp32", "fp64_host"):
        cfg = ba.BAConfig(max_iters=6, point_chunk=P, solver=solver)
        T_opt = ba.gauss_newton_rays(T_init, Xs, Cs, ii, jj, idx, valid, Q,
                                     mask, jnp.asarray(n_kf), cfg)
        err = jax.vmap(lambda a, b: sim3.log(sim3.mul(sim3.inv(a), b)))(
            T_true, T_opt)
        results[solver] = (np.asarray(T_opt), float(jnp.abs(err).max()))

    # both reach ground truth, and the fp32 solution is within a small
    # multiple of the fp64 one (the stated bound)
    assert results["fp64_host"][1] < 2e-3, results["fp64_host"][1]
    assert results["fp32"][1] < 2e-3, results["fp32"][1]
    diff = np.abs(results["fp32"][0] - results["fp64_host"][0]).max()
    assert diff < 1e-3, diff


def test_point_stride_subsample_matches_full():
    """BAConfig.point_stride (use every s-th measurement pixel in the
    Hessian accumulation — the ~1/s BA cost lever behind the tpu_fast
    preset) must recover the same poses as the full integration: the
    normal equations are a redundant sum of ~P rank-4 terms."""
    key = jax.random.PRNGKey(21)
    n_kf, P = 5, 512
    T_true, Xs = _make_world(key, n_kf, P)
    Cs = jnp.full((n_kf, P), 5.0)
    ii, jj, idx, valid, Q, mask = _edges(n_kf, P, extra=[(0, n_kf - 1)])
    # non-uniform validity so the stride interacts with masking
    valid = valid & (jax.random.uniform(jax.random.fold_in(key, 2),
                                        valid.shape) > 0.2)

    noise = 0.05 * jax.random.normal(jax.random.fold_in(key, 7), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    T_by_stride = {}
    for stride in (1, 4):
        cfg = ba.BAConfig(max_iters=20, point_chunk=256, point_stride=stride)
        T_by_stride[stride] = ba.gauss_newton_rays(
            T_init, Xs, Cs, ii, jj, idx, valid, Q, mask,
            jnp.asarray(n_kf), cfg)

    for stride, T_opt in T_by_stride.items():
        err = jax.vmap(lambda a, b: sim3.log(sim3.mul(sim3.inv(a), b)))(
            T_true, T_opt)
        assert float(jnp.abs(err).max()) < 1e-3, (stride, np.asarray(err))
    # calib variant smoke at stride 2 (odd P slicing path)
    cfg = ba.BAConfig(max_iters=5, point_chunk=128, point_stride=2)
    h, w = 16, 32
    K_mat = jnp.array([[40.0, 0.0, 16.0], [0.0, 40.0, 8.0], [0.0, 0.0, 1.0]])
    Xs_c = Xs[:, : h * w]
    T_c = ba.gauss_newton_calib(T_init, Xs_c, Cs[:, : h * w], K_mat, ii, jj,
                                idx[:, : h * w] % (h * w),
                                valid[:, : h * w], Q[:, : h * w], mask,
                                jnp.asarray(n_kf), (h, w), cfg)
    assert np.all(np.isfinite(np.asarray(T_c)))


def test_factor_graph_edge_growth():
    """Edge buffers double past the initial capacity with no drops
    (reference edges grow unboundedly, global_opt.py:89-96), and the solve
    still recovers poses at the grown size. A hard max_edge_capacity caps
    growth and counts drops."""
    from mast3r_slam_tpu.slam.factor_graph import (FactorGraph,
                                                   FactorGraphConfig,
                                                   MatchingConfig)
    from mast3r_slam_tpu.slam.frame import KeyframeStore

    key = jax.random.PRNGKey(12)
    n_kf, P = 9, 128
    T_true, Xs = _make_world(key, n_kf, P)
    extra = [(i, j) for i in range(n_kf) for j in range(i + 2, n_kf)]
    ii, jj, idx, valid, Q, mask = _edges(n_kf, P, extra=extra)
    E = int(ii.shape[0])

    noise = 0.04 * jax.random.normal(jax.random.fold_in(key, 5), (n_kf, 7))
    noise = noise.at[0].set(0.0)
    T_init = jax.vmap(sim3.retr)(T_true, noise)

    kfs = KeyframeStore(16, P, 4, 8, (8, 16), donate=False)
    kfs.n_size = n_kf
    kfs.T_WC = kfs.T_WC.at[:n_kf].set(T_init)
    kfs.X = kfs.X.at[:n_kf].set(Xs)
    kfs.C = kfs.C.at[:n_kf].set(5.0)
    kfs.N = kfs.N.at[:n_kf].set(1)

    fg = FactorGraph(None, None, kfs, FactorGraphConfig(edge_capacity=8),
                     ba.BAConfig(max_iters=10, point_chunk=P),
                     MatchingConfig())
    assert fg.capacity == 8
    for e in range(E):     # same grow-then-append path add_factors takes
        assert fg.ensure_capacity(fg.n_edges + 1)
        fg._append_edge(int(ii[e]), int(jj[e]), idx[e], valid[e], Q[e])
    assert fg.n_edges == E and fg.capacity >= E
    assert fg.capacity == 8 * 2 ** int(np.ceil(np.log2(E / 8)))
    assert fg.edges_dropped == 0
    assert fg.edge_mask.shape[0] == fg.capacity
    assert float(fg.edge_mask.sum()) == E

    fg.solve_GN_rays()
    err = jax.vmap(lambda a, b: sim3.log(sim3.mul(sim3.inv(a), b)))(
        T_true, fg.frames.T_WC[:n_kf])
    assert float(jnp.abs(err).max()) < 1e-3

    # hard cap: growth refused, drops counted
    fg2 = FactorGraph(None, None, kfs,
                      FactorGraphConfig(edge_capacity=8,
                                        max_edge_capacity=16),
                      ba.BAConfig(max_iters=2, point_chunk=P),
                      MatchingConfig())
    for e in range(E):
        if not fg2.ensure_capacity(fg2.n_edges + 1):
            fg2.edges_dropped += 1
            continue
        fg2._append_edge(int(ii[e]), int(jj[e]), idx[e], valid[e], Q[e])
    assert fg2.capacity == 16 and fg2.n_edges == 16
    assert fg2.edges_dropped == E - 16


def test_fused_add_factors_hard_cap_clamps_and_counts():
    """The single-dispatch add_factors path (factor_graph._add_factors_fused)
    must mirror its on-device OOB-drop clamping on the host: at a hard
    max_edge_capacity the appended rows, n_edges and edges_dropped all
    agree with what the program actually wrote."""
    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.models import oracle
    from mast3r_slam_tpu.models.mast3r import MASt3RConfig
    from mast3r_slam_tpu.slam.factor_graph import (FactorGraph,
                                                   FactorGraphConfig,
                                                   MatchingConfig)
    from mast3r_slam_tpu.slam.frame import KeyframeStore

    CFG = MASt3RConfig(img_size=(64, 96), enc_embed_dim=64, desc_dim=8,
                       dtype="float32")
    h, w = CFG.img_size
    n_kf = 4
    Ts = [sim3.identity()]
    for i in range(1, n_kf):
        Ts.append(sim3.mul(Ts[-1], sim3.exp(jnp.array(
            [0.18, 0.0, 0.04, 0.0, 0.06, 0.008, 0.0]))))
    traj = jnp.stack(Ts)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    kfs = KeyframeStore(8, h * w, CFG.num_patches, CFG.enc_embed_dim,
                        (h, w), donate=False)
    for i in range(n_kf):
        feat, pos = oracle.encode_fid(params, jnp.asarray([i]), CFG)
        kfs.feat = kfs.feat.at[i].set(feat[0].astype(kfs.feat.dtype))
        kfs.pos = kfs.pos.at[i].set(pos[0])
        kfs.T_WC = kfs.T_WC.at[i].set(traj[i])
    kfs.n_size = n_kf

    mcfg = MatchingConfig(dilation_max=1, radius=2, coarse_iter=3,
                          max_iter=0)
    fg = FactorGraph(params, CFG, kfs,
                     FactorGraphConfig(edge_capacity=4, max_edge_capacity=4,
                                       pad_edge_batch=True),
                     ba.BAConfig(max_iters=2, point_chunk=1024),
                     mcfg, model_module=oracle)

    # 3 consecutive candidate pairs (consecutive pairs bypass the frac
    # gate) -> 6 two-way edges wanted, only 4 fit: 2 pairs kept, 1 dropped
    ok = fg.add_factors([0, 1, 2], [1, 2, 3], min_match_frac=0.99)
    assert ok
    assert fg.n_edges == 4
    assert fg.edges_dropped == 2
    ii = np.asarray(fg.ii[:4]).tolist()
    jj = np.asarray(fg.jj[:4]).tolist()
    assert (ii, jj) == ([0, 1, 1, 2], [1, 0, 2, 1])
    # the dropped pair's rows were never written on device either
    assert np.asarray(fg.ii[4:]).sum() == 0

    # a second proposal at a full buffer drops everything and reports it
    ok2 = fg.add_factors([0], [2], min_match_frac=0.0)
    assert not ok2
    assert fg.n_edges == 4 and fg.edges_dropped == 4


def test_deferred_add_factors_equivalent_to_sync():
    """add_factors(defer=True) + flush must leave IDENTICAL edge state to
    the synchronous path (same buffers, n_edges, device count), and the
    dense solve's device-count mask must see the edges without a flush."""
    from mast3r_slam_tpu.models import oracle
    from mast3r_slam_tpu.models.mast3r import MASt3RConfig
    from mast3r_slam_tpu.slam.factor_graph import (FactorGraph,
                                                   FactorGraphConfig,
                                                   MatchingConfig)
    from mast3r_slam_tpu.slam.frame import KeyframeStore

    CFG = MASt3RConfig(img_size=(64, 96), enc_embed_dim=64, desc_dim=8,
                       dtype="float32")
    h, w = CFG.img_size
    n_kf = 4
    Ts = [sim3.identity()]
    for i in range(1, n_kf):
        Ts.append(sim3.mul(Ts[-1], sim3.exp(jnp.array(
            [0.18, 0.0, 0.04, 0.0, 0.06, 0.008, 0.0]))))
    traj = jnp.stack(Ts)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    def build():
        kfs = KeyframeStore(8, h * w, CFG.num_patches, CFG.enc_embed_dim,
                            (h, w), donate=False)
        for i in range(n_kf):
            feat, pos = oracle.encode_fid(params, jnp.asarray([i]), CFG)
            kfs.feat = kfs.feat.at[i].set(feat[0].astype(kfs.feat.dtype))
            kfs.pos = kfs.pos.at[i].set(pos[0])
            kfs.T_WC = kfs.T_WC.at[i].set(traj[i])
        kfs.n_size = n_kf
        mcfg = MatchingConfig(dilation_max=1, radius=2, coarse_iter=3,
                              max_iter=0)
        return FactorGraph(params, CFG, kfs,
                           FactorGraphConfig(edge_capacity=16),
                           ba.BAConfig(max_iters=2, point_chunk=1024),
                           mcfg, model_module=oracle)

    fg_s = build()
    fg_s.add_factors([0, 1], [1, 2], min_match_frac=0.1)
    fg_s.add_factors([2], [3], min_match_frac=0.1)

    fg_d = build()
    assert fg_d.add_factors([0, 1], [1, 2], min_match_frac=0.1, defer=True)
    assert fg_d.add_factors([2], [3], min_match_frac=0.1, defer=True)
    # before flush: host count lags, device count is ahead
    assert fg_d.n_edges == 0 and fg_d._pending
    assert int(fg_d.n_edges_dev) == fg_s.n_edges
    fg_d.flush()
    assert fg_d.n_edges == fg_s.n_edges and not fg_d._pending

    e = fg_s.n_edges
    np.testing.assert_array_equal(np.asarray(fg_s.ii[:e]),
                                  np.asarray(fg_d.ii[:e]))
    np.testing.assert_array_equal(np.asarray(fg_s.jj[:e]),
                                  np.asarray(fg_d.jj[:e]))
    np.testing.assert_array_equal(np.asarray(fg_s.idx_ii2jj[:e]),
                                  np.asarray(fg_d.idx_ii2jj[:e]))
    np.testing.assert_array_equal(np.asarray(fg_s.valid_match[:e]),
                                  np.asarray(fg_d.valid_match[:e]))
    np.testing.assert_array_equal(np.asarray(fg_s.Q[:e]),
                                  np.asarray(fg_d.Q[:e]))

    # deferred dispatch + immediate solve (no flush in between): the
    # device-count mask must make the solve act on the new edges
    fg_d2 = build()
    fg_d2.add_factors([0, 1, 2], [1, 2, 3], min_match_frac=0.1, defer=True)
    T_before = np.asarray(fg_d2.frames.T_WC[:n_kf]).copy()
    fg_d2.frames.T_WC = fg_d2.frames.T_WC.at[1].set(
        sim3.retr(traj[1], 0.05 * jnp.ones(7)))
    fg_d2.solve_GN_rays()
    T_after = np.asarray(fg_d2.frames.T_WC[:n_kf])
    assert np.abs(T_after[1] - np.asarray(fg_d2.frames.T_WC[1])).max() == 0
    assert np.abs(T_after - T_before).max() > 1e-4   # solve DID move poses


def test_add_tracked_edge_inversion_and_counts():
    """FactorGraph.add_tracked_edge must write the two-way consecutive edge
    from a tracker match with the correct index semantics: row (ii=j, jj=i)
    carries idx_j_per_i directly, row (ii=i, jj=j) its deterministic
    scatter-inverse (smallest source pixel wins a collision), and the
    host/device edge counts advance without any readback."""
    from mast3r_slam_tpu.slam.factor_graph import (FactorGraph,
                                                   FactorGraphConfig,
                                                   MatchingConfig)
    from mast3r_slam_tpu.slam.frame import KeyframeStore

    P = 8
    kfs = KeyframeStore(4, P, 4, 8, (2, 4), donate=False)
    kfs.n_size = 2
    fg = FactorGraph(None, None, kfs, FactorGraphConfig(edge_capacity=8),
                     ba.BAConfig(max_iters=1, point_chunk=P),
                     MatchingConfig())

    #                  i-pixel:   0  1  2  3  4  5  6  7
    idx = jnp.asarray([3, 3, 0, 1, 5, 6, 7, 2], jnp.int32)
    valid = jnp.asarray([1, 1, 1, 0, 1, 1, 1, 1], bool)   # pixel 3 invalid
    Q = jnp.arange(P, dtype=jnp.float32) + 10.0
    fg.add_tracked_edge(0, 1, idx, valid, Q)

    assert fg.n_edges == 2 and int(fg.n_edges_dev) == 2
    assert np.asarray(fg.ii[:2]).tolist() == [1, 0]
    assert np.asarray(fg.jj[:2]).tolist() == [0, 1]
    # forward row: the tracker match verbatim
    np.testing.assert_array_equal(np.asarray(fg.idx_ii2jj[0]),
                                  np.asarray(idx))
    np.testing.assert_array_equal(np.asarray(fg.valid_match[0]),
                                  np.asarray(valid))
    np.testing.assert_array_equal(np.asarray(fg.Q[0]), np.asarray(Q))
    # inverse row: j-pixel -> smallest i-pixel that mapped to it; j pixels
    # 3 (from i=0, collision with i=1), 0 (i=2), 5..7 (i=4..6), 2 (i=7)
    # are covered; j pixels 1 (only via invalid i=3) and 4 are not
    inv = np.asarray(fg.idx_ii2jj[1])
    vinv = np.asarray(fg.valid_match[1])
    qinv = np.asarray(fg.Q[1])
    expect_inv = {3: 0, 0: 2, 5: 4, 6: 5, 7: 6, 2: 7}
    for jpix in range(P):
        if jpix in expect_inv:
            assert vinv[jpix]
            assert inv[jpix] == expect_inv[jpix]
            assert qinv[jpix] == 10.0 + expect_inv[jpix]
        else:
            assert not vinv[jpix]
            assert qinv[jpix] == 0.0

    # a second tracked edge keeps counts in lockstep
    fg.add_tracked_edge(1, 2, idx, valid, Q)
    assert fg.n_edges == 4 and int(fg.n_edges_dev) == 4
    assert np.asarray(fg.ii[2:4]).tolist() == [2, 1]


def test_add_tracked_edge_atomic_pair_at_odd_capacity():
    """With one slot left (odd capacity), the device must drop the WHOLE
    pair — not half-write one row — so host and device counts agree."""
    from mast3r_slam_tpu.slam.factor_graph import (FactorGraph,
                                                   FactorGraphConfig,
                                                   MatchingConfig)
    from mast3r_slam_tpu.slam.frame import KeyframeStore

    P = 8
    kfs = KeyframeStore(8, P, 4, 8, (2, 4), donate=False)
    kfs.n_size = 5
    fg = FactorGraph(None, None, kfs,
                     FactorGraphConfig(edge_capacity=7, max_edge_capacity=7),
                     ba.BAConfig(max_iters=1, point_chunk=P),
                     MatchingConfig())
    idx = jnp.arange(P, dtype=jnp.int32)
    valid = jnp.ones((P,), bool)
    Q = jnp.full((P,), 2.0)
    for k in range(3):
        fg.add_tracked_edge(k, k + 1, idx, valid, Q)
    assert fg.n_edges == 6 and int(fg.n_edges_dev) == 6
    fg.add_tracked_edge(3, 4, idx, valid, Q)   # only 1 slot left
    assert fg.n_edges == 6 and int(fg.n_edges_dev) == 6
    assert fg.edges_dropped == 2
    # the leftover slot was never half-written
    assert int(fg.ii[6]) == 0 and not bool(fg.valid_match[6].any())
