"""Video/image writing (replaces the reference's ffmpeg subprocess calls,
`src/predict.py:149-159`, `src/real_world/gs/trainer.py:20-35`)."""

from __future__ import annotations

import os

import numpy as np


def write_video(path: str, frames, fps: int = 15) -> str:
    """frames: iterable of (H, W, 3) float [0,1] or uint8 arrays.

    Prefers mp4 (imageio-ffmpeg / system ffmpeg); falls back to an animated
    GIF with the same basename when no mp4 encoder exists. Returns the path
    actually written.
    """
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames = [
        (np.clip(np.asarray(f), 0, 1) * 255).astype(np.uint8)
        if np.asarray(f).dtype != np.uint8 else np.asarray(f)
        for f in frames
    ]
    try:
        with imageio.get_writer(path, fps=fps, macro_block_size=1) as w:
            for f in frames:
                w.append_data(f)
        return path
    except (ValueError, ImportError):
        gif_path = os.path.splitext(path)[0] + ".gif"
        imageio.mimsave(gif_path, frames, duration=1.0 / fps, loop=0)
        return gif_path


def write_image(path: str, im) -> None:
    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    im = np.asarray(im)
    if im.dtype != np.uint8:
        im = (np.clip(im, 0, 1) * 255).astype(np.uint8)
    imageio.imwrite(path, im)


def chw_to_hwc(im) -> np.ndarray:
    return np.asarray(im).transpose(1, 2, 0)
