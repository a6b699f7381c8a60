"""Point-cloud geometry ops — device-native Open3D replacement (SURVEY §2.7 N3).

The reference leans on Open3D's C++ KDTree/filters from the host
(`src/tracking/helpers.py:97-138`, `src/real_world/utils/pcd_utils.py:5-77`,
`src/render/dynamics_module.py:197-211`). Every op here is fixed-shape JAX
(masks instead of compaction) so it can live inside jit pipelines on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.kernels.knn import knn

_GRID = 2048  # voxel grid span per axis (ids fit int32 for 2048^3 via 2 keys)


@functools.partial(jax.jit, static_argnames=("max_points",))
def voxel_downsample(points: jnp.ndarray, voxel_size, max_points: int,
                     valid: jnp.ndarray | None = None):
    """Average points per voxel (o3d `voxel_down_sample` semantics).

    Returns (points (max_points, 3), mask (max_points,)). Voxels beyond
    max_points are dropped (lowest voxel ids kept).
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    vs = jnp.asarray(voxel_size, jnp.float32)
    origin = jnp.min(jnp.where(valid[:, None], points, 1e9), axis=0)
    ij = jnp.floor((points - origin) / vs).astype(jnp.int32)
    ij = jnp.clip(ij, 0, _GRID - 1)
    # _GRID^3 overflows int32, so sort on a collision-free key pair instead
    vid = jnp.where(valid, ij[:, 0] * _GRID + ij[:, 1], jnp.iinfo(jnp.int32).max)
    vid2 = jnp.where(valid, ij[:, 2], jnp.iinfo(jnp.int32).max)

    order = jnp.lexsort((vid2, vid))
    v1s, v2s = vid[order], vid2[order]
    pts_s = points[order]
    valid_s = valid[order]
    new_vox = (
        (v1s != jnp.roll(v1s, 1)) | (v2s != jnp.roll(v2s, 1))
    ).at[0].set(True) & valid_s
    seg = jnp.cumsum(new_vox) - 1  # voxel rank per point
    seg = jnp.where(valid_s, seg, max_points)  # drop invalid
    sums = jax.ops.segment_sum(
        pts_s * valid_s[:, None], seg, num_segments=max_points + 1
    )[:max_points]
    cnts = jax.ops.segment_sum(
        valid_s.astype(jnp.float32), seg, num_segments=max_points + 1
    )[:max_points]
    mask = cnts > 0
    out = sums / jnp.maximum(cnts[:, None], 1.0)
    return out, mask


@functools.partial(jax.jit, static_argnames=("nb_neighbors",))
def statistical_outlier_mask(points: jnp.ndarray, nb_neighbors: int,
                             std_ratio, valid: jnp.ndarray | None = None):
    """Inlier mask, o3d `remove_statistical_outlier` semantics: keep points
    whose mean k-NN distance is below mean + std_ratio * std."""
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    sq, _ = knn(points, nb_neighbors, valid=valid)
    mean_d = jnp.mean(jnp.sqrt(jnp.maximum(sq, 0.0)), axis=1)
    vf = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(vf), 1.0)
    mu = jnp.sum(mean_d * vf) / denom
    var = jnp.sum((mean_d - mu) ** 2 * vf) / denom
    thresh = mu + jnp.asarray(std_ratio, jnp.float32) * jnp.sqrt(var)
    return (mean_d <= thresh) & valid


@functools.partial(jax.jit, static_argnames=("nb_points",))
def radius_outlier_mask(points: jnp.ndarray, nb_points: int, radius,
                        valid: jnp.ndarray | None = None):
    """o3d `remove_radius_outlier`: keep points with >= nb_points neighbors
    within radius."""
    sq, _ = knn(points, nb_points, valid=valid)
    r2 = jnp.asarray(radius, jnp.float32) ** 2
    cnt = jnp.sum(sq <= r2, axis=1)
    keep = cnt >= nb_points
    return keep & (valid if valid is not None else True)


def iterative_statistical_outliers(points: np.ndarray, nb_neighbors: int = 50,
                                   std_start: float = 2.0,
                                   std_step: float = 0.5,
                                   max_iters: int = 10) -> np.ndarray:
    """Escalating outlier removal until convergence
    (`src/render/dynamics_module.py:197-211`). Host loop, device steps.
    Returns inlier indices into the original array."""
    pts = jnp.asarray(points)
    valid = jnp.ones((pts.shape[0],), bool)
    for it in range(max_iters):
        new_valid = statistical_outlier_mask(
            pts, nb_neighbors, std_start + it * std_step, valid=valid
        )
        if bool(jnp.all(new_valid == valid)):
            break
        valid = new_valid
    return np.nonzero(np.asarray(valid))[0]


def depth2fgpcd(depth: jnp.ndarray, mask: jnp.ndarray, k: jnp.ndarray):
    """Unproject a masked depth map to camera-frame points
    (`src/real_world/utils/pcd_utils.py` depth2fgpcd). Returns (H*W, 3)
    points with a validity mask (fixed shape)."""
    H, W = depth.shape
    fx, fy, cx, cy = k[0, 0], k[1, 1], k[0, 2], k[1, 2]
    ys, xs = jnp.mgrid[0:H, 0:W]
    z = depth
    x = (xs - cx) * z / fx
    y = (ys - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    valid = (mask & (depth > 0)).reshape(-1)
    return pts, valid


@functools.partial(jax.jit, static_argnames=("n_iters",))
def segment_plane(points: jnp.ndarray, dist_thresh, key,
                  valid: jnp.ndarray | None = None, n_iters: int = 256):
    """RANSAC plane fit (o3d `segment_plane`): returns (plane (4,), inlier
    mask). Fixed n_iters candidate triplets evaluated in one batch."""
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    idx = jax.random.randint(key, (n_iters, 3), 0, n)
    p0, p1, p2 = (points[idx[:, i]] for i in range(3))
    normal = jnp.cross(p1 - p0, p2 - p0)
    normal = normal / jnp.maximum(
        jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9
    )
    d = -jnp.sum(normal * p0, axis=-1)  # (n_iters,)
    dist = jnp.abs(points @ normal.T + d[None, :])  # (n, n_iters)
    inl = (dist <= dist_thresh) & valid[:, None]
    scores = jnp.sum(inl, axis=0)
    best = jnp.argmax(scores)
    plane = jnp.concatenate([normal[best], d[best][None]])
    return plane, inl[:, best]
