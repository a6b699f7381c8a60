"""End-to-end test of the offline mask/init-pcd/metadata tools
(`gsdx/apps/masks.py` — working replacements for the reference's broken
`src/tracking/utils/*` CLIs) on a synthetic two-camera episode."""

import json
import os
import pickle

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from gsdx.apps.masks import (  # noqa: E402
    build_init_pcd,
    build_metadata,
    merge_mask,
    obtain_mask,
)
from gsdx.utils.seeding import set_seed  # noqa: E402

W, H = 64, 48
N_CAMS = 2
BG = np.array([0.7, 0.7, 0.7]) * 255  # ThresholdSegmenter background


def _make_episode(root):
    """Two cameras, two frames: a red square on the bg color + flat depth."""
    k = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)
    for c in range(N_CAMS):
        os.makedirs(os.path.join(root, f"camera_{c}"), exist_ok=True)
        os.makedirs(os.path.join(root, f"camera_{c}", "depth"), exist_ok=True)
        for t in range(2):
            img = np.full((H, W, 3), BG, np.uint8)
            img[18:30, 24 + c * 4:36 + c * 4] = (200, 30, 30)
            Image.fromarray(img).save(
                os.path.join(root, f"camera_{c}", f"color_{t:06d}.png"))
            depth = np.full((H, W), 800, np.uint16)  # 0.8 m in mm
            Image.fromarray(depth).save(
                os.path.join(root, f"camera_{c}", "depth",
                             f"depth_{t:06d}.png"))
    calib = {
        "intrinsics": np.stack([k] * N_CAMS),
        "R_cam2world": np.stack([np.eye(3, dtype=np.float32)] * N_CAMS),
        "t_cam2world": np.stack([np.zeros(3, np.float32),
                                 np.array([0.05, 0, 0], np.float32)]),
    }
    calib_path = os.path.join(root, "calib.pkl")
    with open(calib_path, "wb") as f:
        pickle.dump(calib, f)
    return calib_path


def test_masks_pipeline_end_to_end(tmp_path):
    set_seed(0)
    root = str(tmp_path)
    calib_path = _make_episode(root)

    obtain_mask(root, "object", n_cameras=N_CAMS)
    for c in range(N_CAMS):
        seg = np.asarray(Image.open(
            os.path.join(root, f"camera_{c}", "seg", "seg_000000.png")))
        assert seg.shape == (H, W)
        # the red square is foreground, the bg-colored field is not
        assert seg[24, 30 + c * 4] > 0
        assert seg[4, 4] == 0

    merge_mask(root, n_cameras=N_CAMS)
    fg = np.asarray(Image.open(
        os.path.join(root, "camera_0", "foreground", "fg_000000.png")))
    assert fg[4, 4].max() == 0  # background zeroed
    assert fg[24, 30, 0] > 150  # object kept

    data = build_init_pcd(root, calib_path, n_cameras=N_CAMS,
                          voxel_size=0.01, max_points=4096)
    assert data.shape[1] == 7 and len(data) > 0
    assert np.isfinite(data).all()
    # depth plane at 0.8 m in both (identity-rotation) cameras
    assert np.all(np.abs(data[:, 2] - 0.8) < 0.05)
    # some foreground-labeled points exist, and fg points are reddish
    fg_pts = data[data[:, 6] > 0.5]
    assert len(fg_pts) > 0
    assert fg_pts[:, 3].mean() > fg_pts[:, 4].mean()
    saved = np.load(os.path.join(root, "init_pt_cld.npz"))["data"]
    np.testing.assert_array_equal(saved, data)

    meta = build_metadata(root, calib_path, n_cameras=N_CAMS,
                          width=W, height=H)
    on_disk = json.load(open(os.path.join(root, "train_meta.json")))
    assert on_disk["w"] == W and on_disk["h"] == H
    assert len(meta["fn"]) == 2 and len(meta["fn"][0]) == N_CAMS
    # w2c inverts cam->world: camera 1 sits at x=+5cm
    w2c1 = np.asarray(meta["w2c"][0][1])
    np.testing.assert_allclose(w2c1[:3, 3], [-0.05, 0, 0], atol=1e-6)


def test_set_seed_reproducible():
    key1 = set_seed(123)
    a1 = np.random.uniform(size=3)
    key2 = set_seed(123)
    a2 = np.random.uniform(size=3)
    np.testing.assert_array_equal(a1, a2)
    np.testing.assert_array_equal(np.asarray(key1), np.asarray(key2))
