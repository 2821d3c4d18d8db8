import numpy as np

import jax

from mast3r_slam_tpu import config as config_mod
from mast3r_slam_tpu.models import TINY, init_params
from mast3r_slam_tpu.slam.system import SLAMSystem


def test_img_downsample_pipeline():
    """img_downsample=2 halves the working resolution of pointmaps/matching
    while the model still runs at full input resolution (spec:
    mast3r_utils.downsample :43-52 + create_frame :117-120)."""
    cfg = dict(config_mod.default_config())
    cfg["dataset"] = dict(cfg["dataset"])
    cfg["dataset"]["img_downsample"] = 2
    params = init_params(jax.random.PRNGKey(0), TINY)
    h, w = TINY.img_size
    system = SLAMSystem(params, TINY, cfg, (h, w), keyframe_capacity=4,
                        edge_capacity=8)
    assert system.keyframes.X.shape[1] == (h // 2) * (w // 2)

    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.standard_normal((h, w, 3)).astype(np.float32)
        frame = system.make_frame(i, img)
        system.process_frame(frame)
        while system.backend_step():
            pass
    assert len(system.keyframes) >= 1
    assert system.keyframes.uimg.shape[1:] == (h // 2, w // 2, 3)
    T = np.asarray(system.keyframes.T_WC[: len(system.keyframes)])
    assert np.all(np.isfinite(T))
