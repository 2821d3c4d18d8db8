"""Trajectory / reconstruction export.

Spec: /root/reference/mast3r_slam/evaluate.py — TUM-format trajectory
(Sim3 -> SE3, drop scale), confidence-thresholded world point-cloud PLY
(hand-rolled binary little-endian writer; no plyfile dependency), keyframe
image dump.
"""

from __future__ import annotations

import pathlib

import numpy as np

from ..lie import sim3


def save_traj(logdir, logfile, timestamps, keyframes):
    """Write TUM trajectory `t x y z qx qy qz qw` per keyframe.

    Spec: evaluate.py:23-44 (as_SE3 drops the Sim3 scale).
    """
    logdir = pathlib.Path(logdir)
    logdir.mkdir(exist_ok=True, parents=True)
    path = logdir / logfile
    n = len(keyframes)
    T = np.asarray(keyframes.T_WC[:n])
    ids = np.asarray(keyframes.dataset_idx[:n])
    with open(path, "w") as f:
        for i in range(n):
            t = timestamps[int(ids[i])]
            x, y, z, qx, qy, qz, qw = T[i, :7]
            f.write(f"{t} {x} {y} {z} {qx} {qy} {qz} {qw}\n")
    return path


def save_ply(filename, points: np.ndarray, colors: np.ndarray):
    """Binary little-endian PLY with x,y,z float32 + rgb uchar."""
    filename = pathlib.Path(filename)
    filename.parent.mkdir(exist_ok=True, parents=True)
    n = len(points)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    )
    rec = np.empty(n, dtype=[("x", "<f4"), ("y", "<f4"), ("z", "<f4"),
                             ("red", "u1"), ("green", "u1"), ("blue", "u1")])
    rec["x"], rec["y"], rec["z"] = points.astype(np.float32).T
    rec["red"], rec["green"], rec["blue"] = colors.astype(np.uint8).T
    with open(filename, "wb") as f:
        f.write(header.encode("ascii"))
        rec.tofile(f)
    return filename


def save_reconstruction(savedir, filename, keyframes, c_conf_threshold):
    """Confidence-thresholded world point cloud (spec: evaluate.py:47-70)."""
    import jax.numpy as jnp

    n = len(keyframes)
    pts_all, col_all = [], []
    avg_C = np.asarray(keyframes.average_confs()[:n])
    for i in range(n):
        T = keyframes.T_WC[i]
        pW = np.asarray(sim3.act(T, keyframes.X[i]))
        color = (np.asarray(keyframes.uimg[i]).reshape(-1, 3) * 255)
        valid = avg_C[i].reshape(-1) > c_conf_threshold
        pts_all.append(pW[valid])
        col_all.append(color[valid])
    pts = np.concatenate(pts_all, axis=0) if pts_all else np.zeros((0, 3))
    cols = np.concatenate(col_all, axis=0) if col_all else np.zeros((0, 3))
    return save_ply(pathlib.Path(savedir) / filename, pts, cols)


def save_keyframes(savedir, timestamps, keyframes):
    """Dump keyframe RGB images (spec: evaluate.py:73-85)."""
    import PIL.Image

    savedir = pathlib.Path(savedir)
    savedir.mkdir(exist_ok=True, parents=True)
    n = len(keyframes)
    ids = np.asarray(keyframes.dataset_idx[:n])
    for i in range(n):
        t = timestamps[int(ids[i])]
        img = (np.asarray(keyframes.uimg[i]) * 255).astype(np.uint8)
        PIL.Image.fromarray(img).save(savedir / f"{t}.png")
