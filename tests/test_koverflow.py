"""K-overflow approximation bound: nosort vs sort on a DENSE scene.

Above N=8192 `binning="auto"` uses the sort-free "nosort" path whose
overflow tiles keep an approximately-nearest-K cover subset (256-bucket
depth threshold) where the CUDA reference keeps all covers. This pins the
image-level effect at reduced scale: a deliberately overflow-heavy scene
(many gaussians concentrated on few tiles at K=128) must stay visually
identical to the exact "sort" binning. The production-scale measurement on
the real demo fit lives in `benchmarks/drive_koverflow.py` (PARITY.md).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gsdx.core.cameras import make_camera
from gsdx.render.rasterize import RasterizeConfig, rasterize
from gsdx.track.losses import calc_psnr


@pytest.mark.slow
def test_nosort_overflow_close_to_exact_sort(rng):
    H, W = 64, 256
    n = 4096
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                      bg=(0.1, 0.2, 0.3))
    # concentrate the cloud so per-tile covers far exceed K=128
    means = rng.normal(0, 0.12, size=(n, 3)).astype(np.float32)
    means[:, 2] = np.abs(means[:, 2]) * 0.8 + 2.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.full((n, 3), 0.02, np.float32)
    opac = rng.uniform(0.2, 0.9, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))

    out_sort = rasterize(*args, cam, RasterizeConfig(binning="sort",
                                                     max_per_tile=128))
    out_nosort = rasterize(*args, cam, RasterizeConfig(binning="nosort",
                                                       max_per_tile=128))
    im_s, im_n = np.asarray(out_sort.im), np.asarray(out_nosort.im)
    psnr = float(calc_psnr(jnp.asarray(im_n), jnp.asarray(im_s)))
    # Approximate-nearest-K keeps the closest covers; dropped covers are
    # heavily occluded, so the pair PSNR should be far above visibility.
    assert psnr > 40.0, f"nosort vs sort PSNR {psnr:.2f} dB"
    assert float(np.mean(np.abs(im_s - im_n))) < 2e-3


@pytest.mark.slow
def test_depth_buckets_tighten_overflow_approximation(rng):
    """More depth buckets -> nosort closer to exact sort on overflow tiles
    (RasterizeConfig.depth_buckets; the production-scale sweep lives in
    benchmarks/drive_koverflow.py)."""
    H, W = 64, 256
    n = 4096
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                      bg=(0.1, 0.2, 0.3))
    means = rng.normal(0, 0.12, size=(n, 3)).astype(np.float32)
    means[:, 2] = np.abs(means[:, 2]) * 0.8 + 2.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.full((n, 3), 0.02, np.float32)
    opac = rng.uniform(0.2, 0.9, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))

    im_s = np.asarray(rasterize(*args, cam, RasterizeConfig(
        binning="sort", max_per_tile=128)).im)
    mses = []
    for buckets in (16, 256):
        im_n = np.asarray(rasterize(*args, cam, RasterizeConfig(
            binning="nosort", max_per_tile=128, depth_buckets=buckets)).im)
        mses.append(float(np.mean((im_s - im_n) ** 2)))
    # 16 coarse buckets leave a fat boundary bucket (index-order keep);
    # 256 must strictly tighten the approximation on this scene.
    assert mses[1] < mses[0], mses
