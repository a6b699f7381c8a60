"""Point-cloud geometry ops + preprocessing + episode IO."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.core.pointcloud import (
    depth2fgpcd,
    iterative_statistical_outliers,
    segment_plane,
    statistical_outlier_mask,
    voxel_downsample,
)
from gsdx.io.episodes import save_params, save_to_splat
from gsdx.io.preprocess import (
    downsample_trajectories,
    extract_pushes,
    median_outlier_mask,
)


def test_voxel_downsample_merges_points(rng):
    base = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
    # duplicate each point with tiny jitter -> same voxel at vs=0.2
    pts = np.concatenate([base, base + 0.001])
    out, mask = voxel_downsample(jnp.asarray(pts), 0.2, max_points=128)
    n_vox = int(np.asarray(mask).sum())
    assert n_vox <= 50  # duplicates merged
    # every input point is near some voxel centroid
    d = np.linalg.norm(
        pts[:, None] - np.asarray(out)[None, :n_vox], axis=-1).min(1)
    assert d.max() < 0.2 * np.sqrt(3)


def test_statistical_outlier_mask(rng):
    pts = rng.normal(scale=0.05, size=(200, 3)).astype(np.float32)
    pts[0] = [10.0, 10.0, 10.0]  # gross outlier
    keep = np.asarray(statistical_outlier_mask(jnp.asarray(pts), 10, 2.0))
    assert not keep[0]
    assert keep[1:].mean() > 0.9


def test_iterative_outliers(rng):
    pts = rng.normal(scale=0.05, size=(300, 3)).astype(np.float32)
    pts[:5] += 5.0
    idx = iterative_statistical_outliers(pts, nb_neighbors=20)
    assert (idx >= 5).all()
    assert len(idx) > 250


def test_depth2fgpcd():
    k = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    depth = jnp.full((48, 64), 2.0)
    mask = jnp.ones((48, 64), bool)
    pts, valid = depth2fgpcd(depth, mask, k)
    assert bool(valid.all())
    center = np.asarray(pts).reshape(48, 64, 3)[24, 32]
    np.testing.assert_allclose(center, [0, 0, 2.0], atol=1e-5)


def test_segment_plane(rng):
    n = 400
    plane_pts = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    plane_pts[:, 2] = 0.5 + rng.normal(scale=0.002, size=n)
    noise = rng.uniform(-1, 1, size=(60, 3)).astype(np.float32)
    pts = np.concatenate([plane_pts, noise])
    plane, inliers = segment_plane(
        jnp.asarray(pts), 0.01, jax.random.PRNGKey(0))
    plane = np.asarray(plane)
    # normal ~ +-z, offset ~ -+0.5
    assert abs(abs(plane[2]) - 1.0) < 0.05
    assert np.asarray(inliers)[:n].mean() > 0.9


def test_extract_pushes_semantics():
    # eef moves 0.02/frame for frames 0..4 then stops
    eef = np.zeros((10, 3), np.float32)
    for t in range(1, 5):
        eef[t] = eef[t - 1] + [0.02, 0, 0]
    eef[5:] = eef[4]
    rows = extract_pushes(eef, dist_thresh=0.015, n_his=2, n_future=2)
    assert rows.shape == (10, 4)
    # row for frame 2: history [1, 2], future picks moving frames [3, 4]
    np.testing.assert_array_equal(rows[2], [1, 2, 3, 4])
    # frame 8 (static): no future motion -> padded with itself
    np.testing.assert_array_equal(rows[8][2:], [8, 8])
    # history frames are sorted and <= current
    assert (np.diff(rows, axis=1) >= 0).all()


def test_median_outlier_mask():
    data = np.array([1.0, 1.1, 0.9, 1.05, 50.0])
    mask = median_outlier_mask(data, m=3)
    assert mask[:4].all() and not mask[4]


def test_downsample_trajectories(rng):
    T, N = 6, 1500
    base = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
    xyz = np.stack([base + 0.01 * t for t in range(T)])
    params = {
        "means3D": xyz,
        "logit_opacities": np.ones((N, 1), np.float32),
    }
    out = downsample_trajectories(params, n_downsample=400)
    assert out.shape == (T, 400, 3)
    # rigid translation preserved (after smoothing interior frames average)
    np.testing.assert_allclose(out[0].mean(0) + 0.05 * 1,
                               out[5].mean(0), atol=1e-2)


def test_save_params_and_splat(tmp_path, rng):
    p0 = {"means3D": rng.normal(size=(10, 3)).astype(np.float32),
          "rgb_colors": rng.uniform(size=(10, 3)).astype(np.float32),
          "unnorm_rotations": rng.normal(size=(10, 4)).astype(np.float32),
          "log_scales": rng.normal(size=(10, 3)).astype(np.float32),
          "logit_opacities": rng.normal(size=(10, 1)).astype(np.float32)}
    p1 = {k: p0[k] for k in ["means3D", "rgb_colors", "unnorm_rotations"]}
    path = os.path.join(tmp_path, "params.npz")
    save_params([p0, p1], path)
    loaded = dict(np.load(path))
    assert loaded["means3D"].shape == (2, 10, 3)
    assert loaded["log_scales"].shape == (10, 3)  # t=0-only key unstacked

    splat_path = os.path.join(tmp_path, "scene.splat")
    save_to_splat(p0["means3D"], p0["rgb_colors"], np.exp(p0["log_scales"]),
                  p0["unnorm_rotations"], np.abs(p0["logit_opacities"]),
                  splat_path)
    assert os.path.getsize(splat_path) == 10 * 32  # 32 bytes per splat
