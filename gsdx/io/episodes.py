"""Episode file IO: params.npz, metadata, images, actions, .splat export.

Data layout follows the reference (`assets/datasets.md`, SURVEY.md §1):
  episode dir: camera_{i}/{color}_{n}.jpg, seg/, depth/, actions.txt,
               calibration_handeye_result.pkl
  tracking output: params.npz (stacked per-timestep Gaussian params,
               `save_params`, `src/tracking/helpers.py:150-158`)
  metadata: train_meta.json / metadata.json {w, h, k, w2c, fn, cam_id}
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Sequence

import numpy as np


def rpy_to_rotation_matrix(roll, pitch, yaw):
    """Degrees -> rotation matrix, Rz @ Ry @ Rx
    (`src/real_world/utils/pcd_utils.py:80-91`)."""
    roll, pitch, yaw = (np.deg2rad(a) for a in (roll, pitch, yaw))
    cr, sr = np.cos(roll), np.sin(roll)
    cp, sp = np.cos(pitch), np.sin(pitch)
    cy, sy = np.cos(yaw), np.sin(yaw)
    Rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    Ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    Rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def save_params(output_params: Sequence[dict], path: str) -> None:
    """Stack per-timestep snapshots into one npz (`helpers.py:150-158`):
    keys present in all timesteps are stacked over time; t=0-only keys are
    stored once."""
    to_save = {}
    keys0 = output_params[0].keys()
    shared = keys0 if len(output_params) == 1 else output_params[1].keys()
    for k in keys0:
        if k in shared:
            to_save[k] = np.stack([p[k] for p in output_params])
        else:
            to_save[k] = output_params[0][k]
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **to_save)


def load_params(path: str) -> dict:
    return dict(np.load(path))


def load_metadata(path: str) -> dict:
    """metadata.json / train_meta.json with fields w, h, k, w2c, fn, cam_id."""
    with open(path) as f:
        return json.load(f)


def load_actions(data_dir: str):
    """Parse actions.txt (one JSON per frame with joint_angles + pose)."""
    with open(os.path.join(data_dir, "actions.txt")) as f:
        lines = f.read().rstrip("\n").split("\n")
    return lines


def load_calibration(data_dir: str) -> dict:
    with open(os.path.join(data_dir, "calibration_handeye_result.pkl"), "rb") as f:
        return pickle.load(f)


def frame_indices_from_metadata(meta: dict) -> np.ndarray:
    """Frame numbers parsed from camera-0 filenames
    (`src/preprocess.py:70-77`)."""
    fn = np.array(meta["fn"])
    out = []
    for i in range(len(fn)):
        name = fn[i][0] if fn.ndim > 1 else fn[i]
        out.append(int(str(name).split("/")[-1].split("_")[1].split(".")[0]))
    return np.array(out)


def eef_world_positions(data_dir: str, meta: dict,
                        gripper_z: float = 0.17) -> np.ndarray:
    """Per-frame gripper point in world coordinates (`load_eef_pos`,
    `src/data/dataset.py:25-86`). gripper_z: 0.17 in the dataset loader,
    0.18 in preprocess, 0.175 on the robot — a documented reference
    inconsistency (SURVEY.md §7.5); parameterized here."""
    frame_idx = frame_indices_from_metadata(meta)
    num_frames = len(frame_idx)
    lines = load_actions(data_dir)
    if len(lines) != num_frames:
        lines = [lines[0]] * (int(frame_idx.max()) + 1 - len(lines)) + lines
    if len(lines) - num_frames > 10:
        lines = lines[:num_frames]
    calib = load_calibration(data_dir)
    gripper_point = np.array([0.0, 0.0, gripper_z])

    out = np.zeros((num_frames, 1, 3), np.float32)
    for i, fi in enumerate(frame_idx):
        try:
            act = json.loads(lines[fi])
        except (IndexError, json.JSONDecodeError):
            act = json.loads(lines[-1])
        pose = np.asarray(act["pose"], np.float64)
        R_g2b = rpy_to_rotation_matrix(*pose[3:6])
        t_g2b = pose[:3] / 1000.0
        R_b2w = calib["R_base2world"]
        t_b2w = calib["t_base2world"]
        R_g2w = R_b2w @ R_g2b
        t_g2w = R_b2w @ t_g2b + t_b2w
        out[i, 0] = (R_g2w @ gripper_point + t_g2w).astype(np.float32)
    return out


def load_episode_images(seq_dir: str, meta: dict, t: int):
    """(cams, ims (C,3,H,W) in [0,1], segs (C,3,H,W)) for timestep t —
    `get_custom_dataset` (`src/tracking/train_utils.py:32-79`). seg images
    become (seg, 0, 1-seg) color targets."""
    from PIL import Image

    ims, segs = [], []
    for c in range(len(meta["fn"][t])):
        fn = meta["fn"][t][c]
        im = np.asarray(Image.open(os.path.join(seq_dir, fn)), np.float32) / 255.0
        directory, filename = fn.rsplit("/", 1)
        number = int(filename.split("_")[-1].split(".")[0])
        seg_path = os.path.join(
            seq_dir, directory.rsplit("/", 1)[0], "seg", f"seg_{number:06d}.png"
        )
        seg = np.asarray(Image.open(seg_path), np.float32)
        if seg.ndim == 3:
            seg = seg[..., 0]
        seg_col = np.stack([seg, np.zeros_like(seg), 1.0 - seg], axis=0)
        ims.append(im.transpose(2, 0, 1))
        segs.append(seg_col)
    return np.stack(ims), np.stack(segs)


def save_to_splat(pts, colors, scales, quats, opacities, output_file: str):
    """Binary .splat export for web viewers (`src/real_world/gs/convert.py:23-51`):
    per splat [pos f32x3 | scale f32x3 | rgba u8x4 | quat u8x4], scene
    centered and rotated -90 deg about x. Vectorized (the reference writes a
    python loop per splat)."""
    pts = np.asarray(pts, np.float32)
    pts = pts - pts.mean(axis=0)
    rot_x = np.array([[1, 0, 0], [0, 0, 1], [0, -1, 0]], np.float32)  # inv(x+90)
    pts = pts @ rot_x.T

    w = np.sqrt(np.maximum(1 + np.trace(rot_x), 1e-8)) / 2
    rq = np.array([
        w,
        (rot_x[2, 1] - rot_x[1, 2]) / (4 * w),
        (rot_x[0, 2] - rot_x[2, 0]) / (4 * w),
        (rot_x[1, 0] - rot_x[0, 1]) / (4 * w),
    ], np.float32)
    q = np.asarray(quats, np.float32)
    w1, x1, y1, z1 = rq
    w2, x2, y2, z2 = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    q_rot = np.stack([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ], axis=1)
    q_rot = q_rot / np.maximum(np.linalg.norm(q_rot, axis=1, keepdims=True), 1e-9)

    n = pts.shape[0]
    rgba = np.clip(
        np.concatenate([np.asarray(colors), np.asarray(opacities).reshape(n, 1)],
                       axis=1) * 255, 0, 255
    ).astype(np.uint8)
    quat_u8 = np.clip(q_rot * 128 + 128, 0, 255).astype(np.uint8)

    rec = np.zeros(n, dtype=[("pos", "<f4", 3), ("scale", "<f4", 3),
                             ("rgba", "u1", 4), ("quat", "u1", 4)])
    rec["pos"] = pts
    rec["scale"] = np.asarray(scales, np.float32)
    rec["rgba"] = rgba
    rec["quat"] = quat_u8
    with open(output_file, "wb") as f:
        f.write(rec.tobytes())
