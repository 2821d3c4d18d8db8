"""Live HTTP viewer: scene wire format, endpoints, pause/step control.

The server replaces the reference's viz process + WindowMsg queues
(/root/reference/mast3r_slam/visualization.py:324-332, main.py:170-171).
"""

import threading
import time
import types
import urllib.error
import urllib.request

import numpy as np


def _toy_keyframes(n=3, h=8, w=12):
    import jax.numpy as jnp

    from mast3r_slam_tpu.slam.frame import KeyframeStore

    P = h * w
    kfs = KeyframeStore(4, P, 6, 16, (h, w), donate=False)
    rng = np.random.default_rng(0)
    kfs.n_size = n
    X = rng.standard_normal((n, P, 3)).astype(np.float32) + [0, 0, 3]
    kfs.X = kfs.X.at[:n].set(jnp.asarray(X))
    kfs.C = kfs.C.at[:n].set(5.0)
    kfs.N = kfs.N.at[:n].set(1)
    T = np.tile([0, 0, 0, 0, 0, 0, 1, 1.0], (n, 1)).astype(np.float32)
    T[:, 0] = np.arange(n) * 0.1
    kfs.T_WC = kfs.T_WC.at[:n].set(jnp.asarray(T))
    kfs.uimg[:n] = rng.uniform(0, 1, (n, h, w, 3)).astype(np.float32)
    return kfs


def test_pack_unpack_roundtrip():
    from mast3r_slam_tpu import viz
    from mast3r_slam_tpu.viz_server import pack_scene, unpack_scene

    kfs = _toy_keyframes()
    scene = viz.build_scene(kfs, c_conf_threshold=1.0)
    blob = pack_scene(scene, n_kf=3, frame=17, paused=True)
    out = unpack_scene(blob)
    assert out["n_kf"] == 3 and out["frame"] == 17 and out["paused"]
    np.testing.assert_array_equal(out["pts"], scene["pts"])
    np.testing.assert_array_equal(out["cols"], scene["cols"])
    np.testing.assert_array_equal(out["lpts"], scene["lpts"])
    np.testing.assert_array_equal(out["lcols"], scene["lcols"])
    assert out["scale"] > 0


def test_build_scene_respects_budget_and_threshold():
    from mast3r_slam_tpu import viz

    kfs = _toy_keyframes()
    full = viz.build_scene(kfs, c_conf_threshold=1.0)
    assert len(full["pts"]) == 3 * 8 * 12
    capped = viz.build_scene(kfs, c_conf_threshold=1.0, max_points=60)
    assert 0 < len(capped["pts"]) <= 60
    none = viz.build_scene(kfs, c_conf_threshold=100.0)
    assert len(none["pts"]) == 0
    assert np.isfinite(full["pts"]).all()


def test_live_server_endpoints_and_pause_step():
    from mast3r_slam_tpu.viz_server import LiveViewer, unpack_scene

    viewer = LiveViewer(port=0, c_conf_threshold=1.0, refresh_s=0.0).start()
    try:
        base = f"http://127.0.0.1:{viewer.port}"
        html = urllib.request.urlopen(f"{base}/", timeout=5).read().decode()
        assert "webgl" in html and "/scene" in html and "pauseb" in html
        assert viewer.token in html and 'method:"POST"' in html

        # empty scene before the first update
        blob = urllib.request.urlopen(f"{base}/scene", timeout=5).read()
        assert unpack_scene(blob)["n_kf"] == 0

        system = types.SimpleNamespace(keyframes=_toy_keyframes(),
                                       factor_graph=None, last_frame_idx=9)
        viewer.update(system, force=True)
        out = unpack_scene(
            urllib.request.urlopen(f"{base}/scene", timeout=5).read())
        assert out["n_kf"] == 3 and out["frame"] == 9
        assert len(out["pts"]) == 3 * 8 * 12

        def ctrl(q, token=None):
            tok = viewer.token if token is None else token
            req = urllib.request.Request(f"{base}/ctrl?{q}&t={tok}",
                                         method="POST")
            return urllib.request.urlopen(req, timeout=5)

        # control requires POST + the per-run token (CSRF hardening)
        with np.testing.assert_raises(urllib.error.HTTPError):
            ctrl("pause=1", token="wrong")
        assert not viewer.paused
        try:
            urllib.request.urlopen(
                f"{base}/ctrl?pause=1&t={viewer.token}", timeout=5)  # GET
        except urllib.error.HTTPError:
            pass
        assert not viewer.paused

        # a step posted while RUNNING must not latch past a later pause
        ctrl("step=1")
        assert not viewer._step.is_set()

        # pause via HTTP; wait_if_paused blocks until a step is queued
        ctrl("pause=1")
        assert viewer.paused
        released = threading.Event()

        def waiter():
            viewer.wait_if_paused()
            released.set()

        t = threading.Thread(target=waiter, daemon=True)
        t.start()
        time.sleep(0.15)
        assert not released.is_set()   # genuinely blocked
        ctrl("step=1")
        assert released.wait(timeout=5.0)   # one frame released
        assert viewer.paused               # still paused after the step
        ctrl("toggle=1")
        assert not viewer.paused
        viewer.wait_if_paused()            # returns immediately
    finally:
        viewer.stop()


def test_run_loop_viewer_hook():
    """system.run drives the viewer: updates arrive and the final forced
    snapshot reflects the terminal keyframe count."""
    import jax

    from mast3r_slam_tpu import config as config_mod
    from mast3r_slam_tpu.models import TINY, init_params
    from mast3r_slam_tpu.slam.system import SLAMSystem
    from mast3r_slam_tpu.viz_server import LiveViewer, unpack_scene

    h, w = TINY.img_size
    cfg = config_mod.load_config("configs/base.yaml")
    cfg["single_thread"] = True
    params = init_params(jax.random.PRNGKey(0), TINY)
    system = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=4,
                        edge_capacity=8)

    class DS:
        img_size = 512
        save_results = False

        def __len__(self):
            return 3

        def __getitem__(self, i):
            rng = np.random.default_rng(i)
            return float(i), rng.standard_normal((h, w, 3)).astype(np.float32)

    # frames are already at the TINY resolution; bypass the 512 resize
    from mast3r_slam_tpu.io import image as image_mod

    orig = image_mod.resize_img
    image_mod.resize_img = lambda img, size=512, **kw: {
        "img": img, "unnormalized": img * 0.5 + 0.5,
        "true_shape": img.shape[:2]}
    viewer = LiveViewer(port=0, c_conf_threshold=-1e9, refresh_s=0.0).start()
    try:
        system.run(DS(), viewer=viewer)
        out = unpack_scene(viewer._blob)
        assert out["n_kf"] == len(system.keyframes) >= 1
        assert len(out["pts"]) > 0
    finally:
        image_mod.resize_img = orig
        viewer.stop()


def test_runtime_conf_threshold_ctrl():
    """/ctrl?conf=<v> must change the served scene WITHOUT a new run-loop
    update (the reference viewer's C_conf_threshold slider,
    visualization.py:324-332) — including while paused."""
    from mast3r_slam_tpu.viz_server import LiveViewer, unpack_scene

    viewer = LiveViewer(port=0, c_conf_threshold=1.0, refresh_s=0.0).start()
    try:
        base = f"http://127.0.0.1:{viewer.port}"
        html = urllib.request.urlopen(f"{base}/", timeout=5).read().decode()
        assert "confs" in html and "conf=" in html   # slider wired to /ctrl

        system = types.SimpleNamespace(keyframes=_toy_keyframes(),
                                       factor_graph=None, last_frame_idx=1)
        viewer.update(system, force=True)
        full = unpack_scene(
            urllib.request.urlopen(f"{base}/scene", timeout=5).read())
        assert len(full["pts"]) == 3 * 8 * 12   # C=5 > 1.0 -> all points

        def ctrl(q):
            req = urllib.request.Request(
                f"{base}/ctrl?{q}&t={viewer.token}", method="POST")
            return urllib.request.urlopen(req, timeout=5)

        ctrl("pause=1")          # slider must work while paused too
        ctrl("conf=100")
        assert viewer.c_conf_threshold == 100.0
        empty = unpack_scene(
            urllib.request.urlopen(f"{base}/scene", timeout=5).read())
        assert len(empty["pts"]) == 0   # threshold above all confidences

        ctrl("conf=0.5")
        back = unpack_scene(
            urllib.request.urlopen(f"{base}/scene", timeout=5).read())
        assert len(back["pts"]) == 3 * 8 * 12
        ctrl("conf=notafloat")   # ignored, not a 500
        assert viewer.c_conf_threshold == 0.5
    finally:
        viewer.stop()
