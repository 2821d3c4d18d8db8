"""Host-side image preprocessing (dataset decode path).

Mirrors the reference's resize/crop/normalize exactly so trajectories are
comparable: long side to 512 with LANCZOS/BICUBIC, center crop to 16-pixel
multiples, (x - 0.5)/0.5 normalization (spec: mast3r_utils.resize_img
:244-278 and dust3r ImgNorm, dust3r/utils/image.py:23).
"""

from __future__ import annotations

import numpy as np
import PIL.Image


def _resize_pil(img: PIL.Image.Image, long_edge: int) -> PIL.Image.Image:
    S = max(img.size)
    interp = PIL.Image.LANCZOS if S > long_edge else PIL.Image.BICUBIC
    new_size = tuple(int(round(x * long_edge / S)) for x in img.size)
    return img.resize(new_size, interp)


def resize_img(img: np.ndarray, size: int = 512, return_transformation=False):
    """img: (H, W, 3) float [0, 1] or uint8. Returns dict with
    ``img`` (h, w, 3) normalized float32, ``unnormalized`` (h, w, 3) float32
    in [0, 1], and ``true_shape`` (h, w)."""
    if img.dtype != np.uint8:
        img = np.uint8(np.clip(img, 0.0, 1.0) * 255)
    pil = PIL.Image.fromarray(img)
    W1, H1 = pil.size
    pil = _resize_pil(pil, size)
    W, H = pil.size
    cx, cy = W // 2, H // 2
    halfw, halfh = ((2 * cx) // 16) * 8, ((2 * cy) // 16) * 8
    if W == H:
        halfh = 3 * halfw // 4
    pil = pil.crop((cx - halfw, cy - halfh, cx + halfw, cy + halfh))

    u8 = np.asarray(pil)
    arr = u8.astype(np.float32) / 255.0
    res = {
        "img": (arr - 0.5) / 0.5,
        # raw pixels for cheap host->device transfer; models.mast3r.encode
        # normalizes uint8 inputs on device with the identical expression
        "img_u8": u8,
        "unnormalized": arr,
        "true_shape": (arr.shape[0], arr.shape[1]),
    }
    if return_transformation:
        scale_w = W1 / W
        scale_h = H1 / H
        half_crop_w = (W - pil.size[0]) / 2
        half_crop_h = (H - pil.size[1]) / 2
        return res, (scale_w, scale_h, half_crop_w, half_crop_h)
    return res
