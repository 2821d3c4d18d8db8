import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.slam import retrieval


def _db(use_native, nfeat=32, dim=64, n_words=128, seed=0):
    key = jax.random.PRNGKey(seed)
    rparams = retrieval.init_retrieval_params(
        key, backbone_dim=dim, proj_dim=dim, codebook_size=n_words)
    cfg = retrieval.RetrievalConfig(nfeat=nfeat)
    return retrieval.RetrievalDatabase(rparams, cfg, use_native=use_native)


def _frames(n, n_tokens=64, dim=64, seed=1):
    key = jax.random.PRNGKey(seed)
    # distinct base patterns + slightly perturbed revisits
    base = jax.random.normal(key, (n, n_tokens, dim))
    return base


@pytest.mark.parametrize("use_native", [False, True])
def test_retrieval_self_similarity(use_native):
    db = _db(use_native)
    if use_native and db.native is None:
        pytest.skip("native lib not built")
    frames = _frames(6)
    for i in range(6):
        inds = db.update(frames[i], add_after_query=True, k=3, min_thresh=0.0)
    # query a near-duplicate of frame 2 (small noise)
    noisy = frames[2] + 0.01 * jax.random.normal(jax.random.PRNGKey(9),
                                                 frames[2].shape)
    inds = db.update(noisy, add_after_query=False, k=3, min_thresh=0.0)
    assert len(inds) > 0
    assert inds[0] == 2, inds


def test_native_matches_numpy():
    db_np = _db(False)
    db_nat = _db(True)
    if db_nat.native is None:
        pytest.skip("native lib not built")
    frames = _frames(5, seed=3)
    for i in range(5):
        a = db_np.update(frames[i], add_after_query=True, k=3, min_thresh=0.0)
        b = db_nat.update(frames[i], add_after_query=True, k=3, min_thresh=0.0)
        assert a == b, (i, a, b)


def test_native_hamming_matches_numpy():
    from mast3r_slam_tpu import native

    if native.load() is None:
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    des = rng.standard_normal((16, 96)).astype(np.float32)
    packed64 = native.binarize_pack64(des)
    # reference via numpy packbits
    packed8 = retrieval.binarize_pack(des)
    nh_np = retrieval.hamming_cdist_packed(packed8, packed8, 96)

    import ctypes

    lib = native.load()
    out = np.zeros((16, 16), dtype=np.float32)
    lib.asmk_hamming_cdist(
        packed64.ctypes.data_as(ctypes.c_void_p), 16,
        packed64.ctypes.data_as(ctypes.c_void_p), 16, 96,
        out.ctypes.data_as(ctypes.c_void_p))
    np.testing.assert_allclose(out, nh_np, atol=1e-6)


def test_vectorized_aggregation_matches_reference_loop():
    """The scatter-add aggregation equals the reference's per-unique-word
    loop (kernel.py:26-39 semantics incl. once-per-feature dedup when the
    same word appears in several ma columns)."""
    rng = np.random.default_rng(3)
    n, dim, ma, n_words = 50, 16, 5, 24
    des = rng.standard_normal((n, dim)).astype(np.float32)
    centroids = rng.standard_normal((n_words, dim)).astype(np.float32)
    # force duplicate columns in some rows
    words = rng.integers(0, n_words, size=(n, ma))
    words[:10, 1] = words[:10, 0]
    words[5:15, 4] = words[5:15, 2]

    ades, ids = retrieval.aggregate_residuals(des, words, centroids)

    # reference loop (the round-1 implementation)
    ref_ids = np.unique(words)
    ref = np.empty((ref_ids.shape[0], dim), dtype=np.float32)
    for i, word in enumerate(ref_ids):
        sel = (words == word).any(axis=1)
        ref[i] = (des[sel] - centroids[word]).sum(0)

    np.testing.assert_array_equal(ids, ref_ids)
    np.testing.assert_allclose(ades, ref, atol=1e-4)


def test_prefetch_matches_inline():
    """prefetch() handles must give the bit-identical query/build results
    the inline dispatch produces (system.backend_prefetch relies on this;
    the prefetched path always quantizes to top-max(ma_query, ma_build)
    and slices, including for the very first keyframe)."""
    db_a = _db(False, seed=5)
    db_b = _db(False, seed=5)
    frames = _frames(6, seed=7)
    for i in range(6):
        a = db_a.update(frames[i], add_after_query=True, k=3,
                        min_thresh=0.0)
        pref = db_b.prefetch(frames[i])
        b = db_b.update(None, add_after_query=True, k=3, min_thresh=0.0,
                        prefetched=pref)
        assert a == b, (i, a, b)
    # and a no-insert query through both paths
    q = frames[3] + 0.01
    a = db_a.update(q, add_after_query=False, k=3, min_thresh=0.0)
    b = db_b.update(None, add_after_query=False, k=3, min_thresh=0.0,
                    prefetched=db_b.prefetch(q))
    assert a == b


@pytest.mark.parametrize("use_native", [False, True])
def test_ivf_flat_state_roundtrip(use_native):
    """state_dict/load_state_dict must reproduce identical query results —
    the O(1) checkpoint-resume path (no per-keyframe replay)."""
    db = _db(use_native)
    if use_native and db.native is None:
        pytest.skip("native lib not built")
    frames = _frames(6)
    for i in range(6):
        db.update(frames[i], add_after_query=True, k=3)

    st = db.state_dict()
    # simulate npz round trip (arrays only, no pickled objects)
    st_np = {k: np.asarray(v) for k, v in st.items()}
    for v in st_np.values():
        assert v.dtype != object

    db2 = _db(use_native)
    assert db2.load_state_dict(st_np)
    assert db2.kf_counter == db.kf_counter

    for i in range(6):
        a = db.update(frames[i], add_after_query=False, k=3)
        b = db2.update(frames[i], add_after_query=False, k=3)
        assert a == b

    # continued inserts behave identically too
    extra = _frames(2, seed=9)
    a = db.update(extra[0], add_after_query=True, k=3)
    b = db2.update(extra[0], add_after_query=True, k=3)
    assert a == b and db.kf_counter == db2.kf_counter


def test_ivf_kind_mismatch_falls_back():
    """A native-IVF snapshot restored into a numpy-IVF database (or vice
    versa) must be REFUSED (packings differ) so the caller replays."""
    db_np = _db(False)
    frames = _frames(3)
    for i in range(3):
        db_np.update(frames[i], add_after_query=True, k=2)
    st = {k: np.asarray(v) for k, v in db_np.state_dict().items()}

    db_nat = _db(True)
    if db_nat.native is not None:
        assert not db_nat.load_state_dict(st)

    st_bad = dict(st, kind=np.asarray("unknown"))
    assert not _db(False).load_state_dict(st_bad)
