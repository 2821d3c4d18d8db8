import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import TINY, init_params, mast3r


def test_tiny_model_shapes_and_activations():
    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    h, w = cfg.img_size
    img = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, 3))

    feat, pos = mast3r.encode(params, img, cfg)
    n = cfg.num_patches
    assert feat.shape == (1, n, cfg.enc_embed_dim)
    assert pos.shape == (1, n, 2)
    # (y, x) positions in row-major patch order
    nw = w // cfg.patch_size
    assert int(pos[0, 1, 1]) == 1 and int(pos[0, nw, 0]) == 1

    res1, res2 = mast3r.decode_pair(params, feat, pos, feat, pos, cfg)
    for res in (res1, res2):
        assert res["pts3d"].shape == (1, h, w, 3)
        assert res["conf"].shape == (1, h, w)
        assert res["desc"].shape == (1, h, w, cfg.desc_dim)
        assert res["desc_conf"].shape == (1, h, w)
        assert np.all(np.isfinite(np.asarray(res["pts3d"])))
        # conf mode ('exp', 1, inf) -> conf > 1; desc_conf ('exp', 0, inf) > 0
        assert float(res["conf"].min()) > 1.0
        assert float(res["desc_conf"].min()) > 0.0
        # descriptors are L2-normalized
        norms = np.linalg.norm(np.asarray(res["desc"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_symmetric_batches_both_directions():
    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    h, w = cfg.img_size
    imgs = jax.random.normal(jax.random.PRNGKey(2), (2, h, w, 3))
    feat, pos = mast3r.encode(params, imgs, cfg)
    fi, fj = feat[0:1], feat[1:2]
    pi, pj = pos[0:1], pos[1:2]
    out = mast3r.inference_symmetric(params, fi, pi, fj, pj, cfg)
    # direction (i|j) head1 output must equal a direct decode_pair call
    r1, r2 = mast3r.decode_pair(params, fi, pi, fj, pj, cfg)
    np.testing.assert_allclose(
        np.asarray(out["Xii"]), np.asarray(r1["pts3d"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["Xji"]), np.asarray(r2["pts3d"]), atol=2e-3
    )
    # and (j|i): head1 on j
    r1b, r2b = mast3r.decode_pair(params, fj, pj, fi, pi, cfg)
    np.testing.assert_allclose(
        np.asarray(out["Xjj"]), np.asarray(r1b["pts3d"]), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["Xij"]), np.asarray(r2b["pts3d"]), atol=2e-3
    )


def test_mono_inference():
    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    h, w = cfg.img_size
    img = jax.random.normal(jax.random.PRNGKey(3), (1, h, w, 3))
    feat, pos = mast3r.encode(params, img, cfg)
    X, C = mast3r.inference_mono(params, feat, pos, cfg)
    assert X.shape == (1, h * w, 3)
    assert C.shape == (1, h * w, 1)


def test_encode_uint8_matches_host_normalized():
    """uint8 frames normalized ON DEVICE (mast3r.encode) reproduce the
    host-normalized float path to float32 fusion tolerance (~1e-6 — XLA
    fuses the ((x/255)-0.5)/0.5 expression into the patch embed, so the
    intermediate is not rounded identically to the host's). The ingest path
    ships 1 byte/channel (system.run windowed/per-frame)."""
    cfg = TINY
    params = init_params(jax.random.PRNGKey(0), cfg)
    h, w = cfg.img_size
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, h, w, 3), dtype=np.uint8)
    host_norm = (u8.astype(np.float32) / 255.0 - 0.5) / 0.5

    fa, pa = mast3r.encode(params, jnp.asarray(host_norm), cfg)
    fb, pb = mast3r.encode(params, jnp.asarray(u8), cfg)
    np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    np.testing.assert_allclose(np.asarray(fa, np.float32),
                               np.asarray(fb, np.float32), atol=1e-4)


def test_export_released_checkpoint_roundtrip(tmp_path):
    """export_state_dict must be the exact inverse of convert_state_dict,
    and save/load_released_checkpoint must round-trip a NON-default
    architecture (the args string carries the extra head sizes)."""
    import numpy as np

    from mast3r_slam_tpu.models import TINY, convert, init_params

    params = init_params(jax.random.PRNGKey(3), TINY)
    sd = convert.export_state_dict(params, TINY)
    assert all(isinstance(v, np.ndarray) for v in sd.values())
    back = convert.convert_state_dict(sd, TINY)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for k, va in flat_a:
        np.testing.assert_array_equal(np.asarray(va),
                                      np.asarray(flat_b[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))

    path = tmp_path / "tiny_released.pth"
    convert.save_released_checkpoint(params, TINY, path)
    cfg2, params2 = convert.load_released_checkpoint(path,
                                                     img_size=TINY.img_size,
                                                     dtype="float32")
    for f in ("enc_depth", "enc_embed_dim", "enc_num_heads", "dec_depth",
              "dec_embed_dim", "dec_num_heads", "desc_dim", "patch_size",
              "feature_dim", "last_dim", "layer_dims"):
        assert getattr(cfg2, f) == getattr(TINY, f), f
    for (k, va), vb in zip(jax.tree_util.tree_leaves_with_path(params),
                           jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb),
                                      err_msg=jax.tree_util.keystr(k))
