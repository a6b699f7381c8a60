"""Pallas compositor kernels (interpret mode) vs the XLA twin and the oracle.

On CPU the kernels run through the Pallas interpreter — same program, same
semantics as the Mosaic-compiled TPU path. Real-TPU execution is covered by
bench.py and the driver compile check.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.core.cameras import make_camera
from gsdx.render.rasterize import RasterizeConfig, rasterize
from gsdx.render.reference import render_reference

H, W = 24, 160  # 3x2 grid of 8x128 tiles (with cropping in x)


def make_scene(rng, n=80):
    means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    means[:, 2] = means[:, 2] * 0.5 + 3.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.02, 0.10, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return means, quats, scales, opac, colors


def make_cam():
    k = np.array([[70.0, 0, W / 2], [0, 70.0, H / 2], [0, 0, 1]], np.float32)
    return make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                       bg=(0.1, 0.4, 0.2))


PALLAS = RasterizeConfig(tile_h=8, tile_w=128, max_per_tile=128, chunk=128,
                         backend="pallas_interpret")
XLA = PALLAS._replace(backend="xla")


def test_pallas_fwd_matches_xla(rng):
    means, quats, scales, opac, colors = make_scene(rng)
    cam = make_cam()
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))
    out_p = rasterize(*args, cam, PALLAS)
    out_x = rasterize(*args, cam, XLA)
    np.testing.assert_allclose(np.asarray(out_p.im), np.asarray(out_x.im), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p.depth), np.asarray(out_x.depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_p.final_t), np.asarray(out_x.final_t), atol=1e-5)


def test_pallas_bwd_matches_reference_grads(rng):
    means, quats, scales, opac, colors = make_scene(rng, n=40)
    cam = make_cam()
    target = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)).astype(np.float32))
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))
    m2d = jnp.zeros((40, 2))

    def loss(cfg, means, quats, scales, opac, colors, m2d):
        out = rasterize(means, quats, scales, opac, colors, cam, cfg,
                        mean2d_offset=m2d)
        return (jnp.abs(out.im - target).mean()
                + 0.1 * jnp.abs(out.depth).mean()
                + 0.05 * out.final_t.mean())

    g_p = jax.grad(lambda *a: loss(PALLAS, *a), argnums=tuple(range(6)))(*args, m2d)

    def loss_ref(means, quats, scales, opac, colors, m2d):
        im, _, depth, final_t = render_reference(
            means, quats, scales, opac, colors, cam,
            mean2d_offset=m2d, strict_t_stop=False)
        return (jnp.abs(im - target).mean() + 0.1 * jnp.abs(depth).mean()
                + 0.05 * final_t.mean())

    g_r = jax.grad(loss_ref, argnums=tuple(range(6)))(*args, m2d)

    names = ["means3d", "quats", "scales", "opacities", "colors", "mean2d"]
    for name, gp, gr in zip(names, g_p, g_r):
        gp, gr = np.asarray(gp), np.asarray(gr)
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gr / scale, atol=1e-3,
                                   err_msg=f"pallas grad mismatch: {name}")


def test_nosort_inkernel_presort_matches_sorted(rng):
    """binning="nosort" (unordered lists + in-kernel depth-rank one-hot
    sort) matches the sort-binning reference exactly — outputs and grads,
    through both the Pallas interpreter and the XLA twin."""
    means, quats, scales, opac, colors = make_scene(rng, n=60)
    cam = make_cam()
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))
    target = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)).astype(np.float32))

    def loss(cfg, *a):
        out = rasterize(*a, cam, cfg)
        return (jnp.abs(out.im - target).mean()
                + 0.1 * jnp.abs(out.depth).mean()
                + 0.05 * out.final_t.mean())

    ref_cfg = XLA._replace(binning="sort")
    out_ref = rasterize(*args, cam, ref_cfg)
    g_ref = jax.grad(lambda *a: loss(ref_cfg, *a),
                     argnums=tuple(range(5)))(*args)

    for cfg in (XLA._replace(binning="nosort"),
                PALLAS._replace(binning="nosort"),
                PALLAS._replace(binning="nosort", sub_chunk=64)):
        out = rasterize(*args, cam, cfg)
        np.testing.assert_allclose(np.asarray(out.im), np.asarray(out_ref.im),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth),
                                   np.asarray(out_ref.depth), atol=1e-4)
        g = jax.grad(lambda *a: loss(cfg, *a), argnums=tuple(range(5)))(*args)
        for gp, gr in zip(g, g_ref):
            scale = np.abs(np.asarray(gr)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(gp) / scale,
                                       np.asarray(gr) / scale, atol=1e-3)


def test_pallas_subchunk_matches_xla(rng):
    """Sub-128 compute granules (aligned loads + switch slices) stay exact."""
    means, quats, scales, opac, colors = make_scene(rng, n=60)
    cam = make_cam()
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))
    sub = PALLAS._replace(sub_chunk=64)
    out_p = rasterize(*args, cam, sub)
    out_x = rasterize(*args, cam, XLA)
    np.testing.assert_allclose(np.asarray(out_p.im), np.asarray(out_x.im),
                               atol=1e-5)

    target = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)).astype(np.float32))

    def loss(cfg, *a):
        out = rasterize(*a, cam, cfg)
        return jnp.abs(out.im - target).mean() + 0.05 * out.final_t.mean()

    g_s = jax.grad(lambda *a: loss(sub, *a), argnums=(0, 1, 2))(*args)
    g_x = jax.grad(lambda *a: loss(XLA, *a), argnums=(0, 1, 2))(*args)
    for gp, gr in zip(g_s, g_x):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gp) / scale,
                                   np.asarray(gr) / scale, atol=1e-3)
