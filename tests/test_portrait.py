"""Portrait (h > w) input support through the full SLAM pipeline.

The reference handles portrait via PatchEmbedDust3R + landscape_only=False
at load (mast3r/model.py:25-30, dust3r/patch_embed.py:19-29). Here every
stage is shape-parameterized, so portrait is just img_size=(h, w) with
h > w; this exercises the whole stack (matcher pixel math, tracker,
factor graph, BA, export) at a portrait resolution with the oracle
predictor."""

import numpy as np

import jax.numpy as jnp

from mast3r_slam_tpu import config as config_mod
from mast3r_slam_tpu.eval import ate
from mast3r_slam_tpu.lie import sim3
from mast3r_slam_tpu.models import oracle
from mast3r_slam_tpu.models.mast3r import MASt3RConfig
from mast3r_slam_tpu.slam.system import SLAMSystem

CFG = MASt3RConfig(img_size=(96, 64), enc_embed_dim=64, desc_dim=8,
                   dtype="float32")


def _gt_trajectory(n):
    Ts = [sim3.identity()]
    for i in range(1, n):
        xi = jnp.array([0.18, 0.04 * np.sin(i / 3), 0.04,
                        0.0, 0.06, 0.008, 0.0])
        Ts.append(sim3.mul(Ts[-1], sim3.exp(xi)))
    return jnp.stack(Ts)


def test_portrait_oracle_e2e():
    n_frames = 8
    h, w = CFG.img_size
    assert h > w
    traj = _gt_trajectory(n_frames)
    params = oracle.make_params(traj, desc_dim=CFG.desc_dim)

    cfg = dict(config_mod.default_config())
    cfg["tracking"] = dict(cfg["tracking"])
    cfg["tracking"]["match_frac_thresh"] = 0.95

    system = SLAMSystem(params, CFG, cfg, (h, w), keyframe_capacity=16,
                        edge_capacity=64, model_module=oracle)
    for i in range(n_frames):
        frame = system.make_frame(i, oracle.make_frame_image(i, h, w))
        system.process_frame(frame)
        while system.backend_step():
            pass

    n = len(system.keyframes)
    assert n >= 3, f"expected several keyframes, got {n}"
    assert system.stats["skipped"] == 0

    ids = np.asarray(system.keyframes.dataset_idx[:n])
    T_est = np.asarray(system.keyframes.T_WC[:n])
    T_gt = np.asarray(traj)[ids]
    s, R, t = ate.umeyama_alignment(T_est[:, :3], T_gt[:, :3])
    aligned = (s * (R @ T_est[:, :3].T)).T + t
    err = np.linalg.norm(aligned - T_gt[:, :3], axis=1)
    rmse = float(np.sqrt((err ** 2).mean()))
    extent = float(np.linalg.norm(T_gt[:, :3].max(0) - T_gt[:, :3].min(0)))
    assert rmse < 0.06 * max(extent, 1e-6), (rmse, extent, ids)


def test_portrait_resize_path():
    """A portrait source image resizes to a portrait working resolution
    (reference resize semantics: long side 512, 16-px-multiple crop)."""
    from mast3r_slam_tpu.io.image import resize_img

    img = np.zeros((640, 480, 3), np.uint8)
    out = resize_img(img, 512)
    hh, ww = out["img"].shape[:2]
    assert hh > ww and hh == 512 and ww % 16 == 0
