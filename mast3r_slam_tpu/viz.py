"""Reconstruction / trajectory visualization (headless-friendly).

The reference ships a moderngl+imgui live viewer
(/root/reference/mast3r_slam/visualization.py) rendering surfels, frustums
and graph edges. On a TPU host there is typically no GL stack, so this
module renders the same content offline with matplotlib: trajectory plots,
confidence-thresholded point-cloud projections, camera frustums and
factor-graph edges — written as PNGs during or after a run. The exported
PLY (io/export.py) remains the high-fidelity path for external viewers.
"""

from __future__ import annotations

import pathlib

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_trajectory(keyframes, out_path, gt_file=None):
    """Top-down + side trajectory plot from keyframe poses."""
    plt = _mpl()
    n = len(keyframes)
    T = np.asarray(keyframes.T_WC[:n])
    t = T[:, :3]
    fig, axes = plt.subplots(1, 2, figsize=(10, 5))
    for ax, (i, j), name in zip(axes, [(0, 2), (0, 1)], ["x-z", "x-y"]):
        ax.plot(t[:, i], t[:, j], "b.-", ms=3, lw=0.8, label="estimate")
        if gt_file is not None:
            from .eval.ate import load_tum_trajectory

            _, gt_t, _ = load_tum_trajectory(gt_file)
            ax.plot(gt_t[:, i], gt_t[:, j], "g-", lw=0.8, label="gt")
        ax.set_xlabel(name.split("-")[0])
        ax.set_ylabel(name.split("-")[1])
        ax.axis("equal")
        ax.legend()
    fig.suptitle(f"trajectory ({n} keyframes)")
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def render_pointcloud(keyframes, out_path, c_conf_threshold=1.5,
                      max_points=400_000, factor_graph=None):
    """Orthographic scatter render of the fused world point cloud with
    frustum centers and graph edges (surfelmap.glsl stand-in)."""
    from .lie import sim3

    plt = _mpl()
    n = len(keyframes)
    pts_all, col_all = [], []
    avg_C = np.asarray(keyframes.average_confs()[:n])
    for i in range(n):
        pW = np.asarray(sim3.act(keyframes.T_WC[i], keyframes.X[i]))
        col = np.asarray(keyframes.uimg[i]).reshape(-1, 3)
        valid = avg_C[i].reshape(-1) > c_conf_threshold
        pts_all.append(pW[valid])
        col_all.append(col[valid])
    pts = np.concatenate(pts_all, 0) if pts_all else np.zeros((0, 3))
    cols = np.concatenate(col_all, 0) if col_all else np.zeros((0, 3))
    if len(pts) > max_points:
        sel = np.random.default_rng(0).choice(len(pts), max_points,
                                              replace=False)
        pts, cols = pts[sel], cols[sel]

    T = np.asarray(keyframes.T_WC[:n])
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    for ax, (i, j) in zip(axes, [(0, 2), (0, 1)]):
        if len(pts):
            ax.scatter(pts[:, i], pts[:, j], s=0.1, c=np.clip(cols, 0, 1),
                       linewidths=0)
        ax.plot(T[:, i], T[:, j], "r.-", ms=4, lw=1.0)
        if factor_graph is not None and factor_graph.n_edges:
            ii = np.asarray(factor_graph.ii[: factor_graph.n_edges])
            jj = np.asarray(factor_graph.jj[: factor_graph.n_edges])
            for a, b in zip(ii, jj):
                ax.plot([T[a, i], T[b, i]], [T[a, j], T[b, j]], "y-",
                        lw=0.4, alpha=0.5)
        ax.set_aspect("equal")
        ax.set_facecolor("black")
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def keyframe_mosaic(keyframes, out_path, max_tiles=16):
    """Grid of keyframe images (debug view)."""
    plt = _mpl()
    n = min(len(keyframes), max_tiles)
    if n == 0:
        return None
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.2 * rows))
    axes = np.atleast_1d(axes).ravel()
    for i in range(n):
        axes[i].imshow(np.clip(np.asarray(keyframes.uimg[i]), 0, 1))
        axes[i].set_title(f"kf {i}", fontsize=8)
    for ax in axes:
        ax.axis("off")
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path
