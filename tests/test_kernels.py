import jax.numpy as jnp
import numpy as np

from gsdx.kernels.fps import farthest_point_sampling, fps_rad_idx
from gsdx.kernels.knn import knn


def test_knn_matches_bruteforce(rng):
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(pts), k=5, row_chunk=64)
    d, i = np.asarray(d), np.asarray(i)
    full = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(full, np.inf)
    ref_i = np.argsort(full, axis=1)[:, :5]
    ref_d = np.sort(full, axis=1)[:, :5]
    np.testing.assert_allclose(d, ref_d, atol=1e-4)
    # indices can differ on ties; check distances via gathered values
    gathered = np.take_along_axis(full, i, axis=1)
    np.testing.assert_allclose(gathered, ref_d, atol=1e-4)


def test_knn_respects_valid_mask(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    valid = np.zeros(64, bool)
    valid[:32] = True
    _, i = knn(jnp.asarray(pts), k=3, valid=jnp.asarray(valid), row_chunk=32)
    assert np.asarray(i)[:32].max() < 32


def test_fps_spreads_points(rng):
    # two well-separated clusters: FPS must pick from both immediately
    a = rng.normal(size=(50, 3)).astype(np.float32) * 0.01
    b = rng.normal(size=(50, 3)).astype(np.float32) * 0.01 + 10.0
    pts = np.concatenate([a, b])
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), 10, start_idx=0))
    assert (idx < 50).any() and (idx >= 50).any()
    assert idx[0] == 0
    assert len(np.unique(idx)) == 10


def test_fps_rad_idx_stops_at_radius(rng):
    pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    idx, keep = fps_rad_idx(jnp.asarray(pts), radius=0.4, max_samples=64)
    idx, keep = np.asarray(idx), np.asarray(keep)
    kept = pts[idx[keep]]
    # every point within radius of some kept sample
    d = np.linalg.norm(pts[:, None] - kept[None], axis=-1).min(1)
    assert d.max() <= 0.4 + 1e-5
    # and the sample count is far below max (radius stops early)
    assert keep.sum() < 64
