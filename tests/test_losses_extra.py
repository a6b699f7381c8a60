"""Loss-level parity: fused vs two-pass tracking loss, SSIM filter forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdx.core.gaussians import init_gaussian_params, init_tracking_variables
from gsdx.kernels.knn import knn
from gsdx.render.rasterize import RasterizeConfig
from gsdx.track.losses import LossWeights, _filter2d, calc_ssim, tracking_loss

from test_tracking import CFG_RASTER, make_cams, make_gt_scene, render_targets


def test_filter2d_matches_direct_conv(rng):
    """Banded-matmul blur == zero-padded depthwise 11x11 convolution."""
    img = jnp.asarray(rng.uniform(size=(3, 40, 56)).astype(np.float32))
    out = np.asarray(_filter2d(img))
    # direct reference: explicit zero-padded 2D convolution
    from gsdx.track.losses import _WINDOW

    pad = np.pad(np.asarray(img), ((0, 0), (5, 5), (5, 5)))
    ref = np.zeros_like(np.asarray(img))
    for dy in range(11):
        for dx in range(11):
            ref += _WINDOW[dy, dx] * pad[:, dy:dy + 40, dx:dx + 56]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_ssim_identical_images():
    img = jnp.ones((3, 32, 48)) * 0.5
    assert float(calc_ssim(img, img)) > 0.999


@pytest.mark.slow
def test_fused_matches_two_pass_loss(rng):
    pt_cld = make_gt_scene(rng, n=40)
    cams = make_cams()
    ims, segs = render_targets(pt_cld, cams)
    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1), capacity=64)
    variables = init_tracking_variables(64, num_knn=4, scene_radius=1.0)
    cam0 = jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") and x.ndim else x,
                        cams)
    m2d = jnp.zeros((64, 2))
    w = LossWeights()

    def lf(p, fused):
        l, _ = tracking_loss(p, m2d, cam0, ims[0], segs[0], variables, w,
                             True, CFG_RASTER, fused=fused)
        return l

    # one jitted value_and_grad per variant (eager grad costs ~16 s in
    # hundreds of per-op compiles; jitted: ~2.5 s)
    l_fused, g1 = jax.jit(jax.value_and_grad(
        lambda p: lf(p, True)))(params)
    l_two, g2 = jax.jit(jax.value_and_grad(
        lambda p: lf(p, False)))(params)
    np.testing.assert_allclose(float(l_fused), float(l_two), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g1.means3d), np.asarray(g2.means3d),
                               atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g1.logit_opacities), np.asarray(g2.logit_opacities),
        atol=1e-5)
