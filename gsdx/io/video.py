"""Video/image writing (replaces the reference's ffmpeg subprocess calls,
`src/predict.py:149-159`, `src/real_world/gs/trainer.py:20-35`)."""

from __future__ import annotations

import os

import numpy as np


def write_video(path: str, frames, fps: int = 15) -> None:
    """frames: iterable of (H, W, 3) float [0,1] or uint8 arrays."""
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with imageio.get_writer(path, fps=fps, macro_block_size=1) as w:
        for f in frames:
            f = np.asarray(f)
            if f.dtype != np.uint8:
                f = (np.clip(f, 0, 1) * 255).astype(np.uint8)
            w.append_data(f)


def write_image(path: str, im) -> None:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    im = np.asarray(im)
    if im.dtype != np.uint8:
        im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
    imageio.imwrite(path, im)


def chw_to_hwc(im) -> np.ndarray:
    return np.asarray(im).transpose(1, 2, 0)
