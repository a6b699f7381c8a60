"""Preprocessing: unit-push extraction + trajectory downsampling.

Re-implements `src/preprocess.py` for the gsdx pipeline. Produces, per
episode, the frame-pair table consumed by the graph dataset and the
FPS-downsampled, smoothed particle trajectories.
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from gsdx.io.episodes import (
    eef_world_positions,
    frame_indices_from_metadata,
    load_actions,
    load_metadata,
)
from gsdx.kernels.fps import farthest_point_sampling

GRIPPER_Z_PREPROCESS = 0.18  # `src/preprocess.py:23`


def test_validity(data_dir: str, output_dir: str) -> bool:
    """Reject episodes whose action log is >10 frames short
    (`src/preprocess.py:35-58`)."""
    if not os.path.exists(os.path.join(output_dir, "params.npz")):
        raise ValueError(f"params.npz not found in {output_dir}")
    meta = load_metadata(os.path.join(output_dir, "metadata.json"))
    num_frames = len(frame_indices_from_metadata(meta))
    lines = load_actions(data_dir)
    if len(lines) - num_frames < -10:
        return False
    return True


def extract_pushes(eef_xyz: np.ndarray, dist_thresh: float, n_his: int,
                   n_future: int) -> np.ndarray:
    """Frame-pair rows from an eef trajectory (`src/preprocess.py:107-193`).

    For every frame, walk backward collecting up to n_his frames spaced by
    >= dist_thresh of eef motion (padding by repetition), then forward for
    n_future (the last frame accepts 0.75x the threshold). Returns
    (num_frames, n_his + n_future) int array.
    """
    eef = np.asarray(eef_xyz).reshape(len(eef_xyz), -1)[:, :3]
    num_frames = len(eef)
    rows = []
    for curr in range(num_frames):
        traj = [curr]
        anchor = eef[curr]
        fi = curr
        while fi >= 0 and len(traj) < n_his:
            d = np.linalg.norm(anchor - eef[fi])
            if d >= dist_thresh:
                traj.append(fi)
                anchor = eef[fi]
            fi -= 1
        traj = traj + [traj[-1]] * (n_his - len(traj))
        traj = traj[::-1]

        anchor = eef[curr]
        fi = curr
        while fi < num_frames and len(traj) < n_his + n_future:
            d = np.linalg.norm(anchor - eef[fi])
            if d >= dist_thresh or (fi == num_frames - 1 and d >= 0.75 * dist_thresh):
                traj.append(fi)
                anchor = eef[fi]
            fi += 1
        traj = traj + [traj[-1]] * (n_his + n_future - len(traj))
        rows.append(traj)
    return np.asarray(rows, np.int64)


def median_outlier_mask(data: np.ndarray, m: float = 3.0) -> np.ndarray:
    """Median-absolute-deviation outlier test (`src/preprocess.py:209-214`)."""
    d = np.abs(data - np.median(data))
    mdev = np.median(d)
    s = d / mdev if mdev else np.zeros(len(d))
    return s < m


def downsample_trajectories(params: dict, n_downsample: int = 1000,
                            smooth_iters: int = 10) -> np.ndarray:
    """params.npz -> (T, n_downsample, 3) (`downsample`, `src/preprocess.py:196-230`):
    opacity filter, motion-sum MAD outlier removal, frame-0 FPS (indices
    reused across frames), 10x moving-average smoothing."""
    xyz = np.asarray(params["means3D"], np.float32)  # (T, N, 3)
    logit_op = np.asarray(params["logit_opacities"])
    opacity_mask = (logit_op > 0).reshape(-1)
    xyz = xyz[:, opacity_mask]

    motion_sum = np.linalg.norm(np.diff(xyz, axis=0), axis=-1).sum(axis=0)
    xyz = xyz[:, median_outlier_mask(motion_sum, m=3.0)]
    if xyz.shape[1] < n_downsample:
        raise ValueError(
            f"only {xyz.shape[1]} valid particles < {n_downsample}"
        )

    fps_idx = np.asarray(
        farthest_point_sampling(jnp.asarray(xyz[0]), n_downsample, start_idx=0)
    )
    xyz = xyz[:, fps_idx]

    for _ in range(smooth_iters):
        xyz[1:-1] = (xyz[:-2] + xyz[1:-1] + xyz[2:]) / 3.0
    return xyz


def preprocess_episode(data_dir: str, output_dir: str, save_dir: str,
                       dist_thresh: float, n_his: int, n_future: int,
                       episode_idx: int = 0,
                       n_downsample: int = 1000) -> Optional[np.ndarray]:
    """Full per-episode preprocessing (`preprocess`, `src/preprocess.py:233-294`).

    Writes frame_pairs/{episode_idx}.txt and param_downsampled.npy; returns
    the frame-pair rows, or None if the episode is invalid.
    """
    if not test_validity(data_dir, output_dir):
        return None
    meta = load_metadata(os.path.join(output_dir, "metadata.json"))
    eef = eef_world_positions(data_dir, meta, gripper_z=GRIPPER_Z_PREPROCESS)
    rows = extract_pushes(eef[:, 0], dist_thresh, n_his, n_future)

    os.makedirs(os.path.join(save_dir, "frame_pairs"), exist_ok=True)
    np.savetxt(
        os.path.join(save_dir, "frame_pairs", f"{episode_idx}.txt"),
        rows, fmt="%d",
    )

    params = dict(np.load(os.path.join(output_dir, "params.npz")))
    xyz = downsample_trajectories(params, n_downsample=n_downsample)
    np.save(os.path.join(output_dir, "param_downsampled.npy"), xyz)

    with open(os.path.join(save_dir, "metadata.txt"), "w") as f:
        f.write(f"{dist_thresh},{n_future},{n_his}")
    return rows
