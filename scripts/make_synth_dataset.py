#!/usr/bin/env python
"""Generate a synthetic RGB-dir dataset for smoke/perf runs.

Writes N PNG frames of a smoothed random texture under a drifting crop —
enough parallax-like image motion for the pipeline to exercise matching,
keyframing and (with --estimate-calib) the calibrated path, with no real
data in the environment. Loaded by the RGBFiles adapter
(io/datasets.py); used by the e2e smoke in CLAUDE.md:

    python scripts/make_synth_dataset.py [out_dir] [n_frames]
    python main.py --dataset .synth_ds --config configs/base.yaml \
        --no-viz --max-frames 8
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import PIL.Image


def _box_blur(x, k=9):
    """Separable k x k box blur via cumulative sums (numpy only — the smoke
    path must not depend on the optional scipy extra). Same-size output;
    edges use the truncated window (close enough for texture synthesis)."""
    r = k // 2
    for ax in (0, 1):
        pad = [(0, 0)] * x.ndim
        pad[ax] = (r + 1, r)
        c = np.cumsum(np.pad(x, pad, mode="edge"), axis=ax)
        x = (np.take(c, range(k, c.shape[ax]), axis=ax)
             - np.take(c, range(0, c.shape[ax] - k), axis=ax)) / k
    return x


def make(out_dir=".synth_ds", n_frames=16, h=480, w=640, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, (h + 3 * n_frames - 2,
                                w + 5 * n_frames - 4, 3)).astype(np.float32)
    base = _box_blur(base)
    base = (base - base.min()) / (np.ptp(base) + 1e-9) * 255

    out = pathlib.Path(out_dir)
    out.mkdir(exist_ok=True, parents=True)
    for stale in out.glob("*.png"):   # a smaller rerun must not keep tails
        stale.unlink()
    for i in range(n_frames):
        crop = base[i * 3:i * 3 + h, i * 5:i * 5 + w]
        PIL.Image.fromarray(crop.astype(np.uint8)).save(out / f"{i:04d}.png")
    return out


if __name__ == "__main__":
    out = make(sys.argv[1] if len(sys.argv) > 1 else ".synth_ds",
               int(sys.argv[2]) if len(sys.argv) > 2 else 16)
    print(f"wrote {len(list(out.glob('*.png')))} frames to {out}")
