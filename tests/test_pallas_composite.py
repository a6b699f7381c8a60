"""Pallas compositor kernels (interpret mode) vs the XLA twin and the oracle.

On CPU the kernels run through the Pallas interpreter — same program, same
semantics as the Mosaic-compiled TPU path. Real-TPU execution is covered by
bench.py and the driver compile check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
    out_p = jax.jit(lambda *a: rasterize(*a, cam, PALLAS))(*args)
    out_x = jax.jit(lambda *a: rasterize(*a, cam, XLA))(*args)
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

    g_p = jax.jit(jax.grad(lambda *a: loss(PALLAS, *a), argnums=tuple(range(6))))(*args, m2d)

    def loss_ref(means, quats, scales, opac, colors, m2d):
        im, _, depth, final_t = render_reference(
            means, quats, scales, opac, colors, cam,
            mean2d_offset=m2d, strict_t_stop=False)
        return (jnp.abs(im - target).mean() + 0.1 * jnp.abs(depth).mean()
                + 0.05 * final_t.mean())

    g_r = jax.jit(jax.grad(loss_ref, argnums=tuple(range(6))))(*args, m2d)

    names = ["means3d", "quats", "scales", "opacities", "colors", "mean2d"]
    for name, gp, gr in zip(names, g_p, g_r):
        gp, gr = np.asarray(gp), np.asarray(gr)
        scale = np.abs(gr).max() + 1e-8
        np.testing.assert_allclose(gp / scale, gr / scale, atol=1e-3,
                                   err_msg=f"pallas grad mismatch: {name}")


def test_nosort_parity_fast(rng):
    """Fast-tier coverage of the production binning path (nosort is
    auto-selected for N>8192): reduced-size fwd+bwd exactness of the Pallas
    in-kernel depth-rank sort vs the sort-binning reference. The full
    multi-config sweep (XLA twin + sub_chunk variants) stays @slow."""
    means, quats, scales, opac, colors = make_scene(rng, n=40)
    cam = make_cam()
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))
    target = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)).astype(np.float32))

    def loss_with_im(cfg, *a):
        out = rasterize(*a, cam, cfg)
        return (jnp.abs(out.im - target).mean()
                + 0.1 * jnp.abs(out.depth).mean()), out.im

    ref_cfg = XLA._replace(binning="sort")
    cfg = PALLAS._replace(binning="nosort")
    # one compile per config: value+grad+image together
    (_, im_ref), g_ref = jax.jit(jax.value_and_grad(
        lambda *a: loss_with_im(ref_cfg, *a), argnums=tuple(range(5)),
        has_aux=True))(*args)
    (_, im), g = jax.jit(jax.value_and_grad(
        lambda *a: loss_with_im(cfg, *a), argnums=tuple(range(5)),
        has_aux=True))(*args)
    np.testing.assert_allclose(np.asarray(im), np.asarray(im_ref), atol=1e-5)
    for gp, gr in zip(g, g_ref):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gp) / scale,
                                   np.asarray(gr) / scale, atol=1e-3)


@pytest.mark.slow
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
    out_ref = jax.jit(lambda *a: rasterize(*a, cam, ref_cfg))(*args)
    g_ref = jax.jit(jax.grad(lambda *a: loss(ref_cfg, *a),
                             argnums=tuple(range(5))))(*args)

    for cfg in (XLA._replace(binning="nosort"),
                PALLAS._replace(binning="nosort"),
                PALLAS._replace(binning="nosort", sub_chunk=64)):
        out = jax.jit(lambda *a: rasterize(*a, cam, cfg))(*args)
        np.testing.assert_allclose(np.asarray(out.im), np.asarray(out_ref.im),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth),
                                   np.asarray(out_ref.depth), atol=1e-4)
        g = jax.jit(jax.grad(lambda *a: loss(cfg, *a), argnums=tuple(range(5))))(*args)
        for gp, gr in zip(g, g_ref):
            scale = np.abs(np.asarray(gr)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(gp) / scale,
                                       np.asarray(gr) / scale, atol=1e-3)


@pytest.mark.slow
def test_early_stop_fires_and_grads_match(rng):
    """Tile-level early termination: on a saturating scene the kernel stops
    early (nproc < nchunks), outputs stay within the 1e-4 reference bound of
    the no-stop render, and pallas/twin agree on the stopped primal+grads."""
    from gsdx.kernels.composite import composite_tiles_pallas

    n = 120
    # splats spread across the view, each big enough to blanket whole tiles:
    # every pixel stacks dozens of alpha~0.9 covers -> T < 1e-4 mid-list
    means = np.stack([
        rng.uniform(-3.0, 3.0, size=n),
        rng.uniform(-0.5, 0.5, size=n),
        rng.uniform(2.8, 3.2, size=n),
    ], axis=1).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = np.full((n, 3), 1.5, np.float32)  # huge splats cover tiles
    opac = np.full((n, 1), 0.95, np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))
    cam = make_cam()
    target = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)).astype(np.float32))

    cfg_stop = PALLAS._replace(sub_chunk=32)
    cfg_xla = XLA._replace(sub_chunk=32)
    cfg_full = cfg_stop._replace(early_stop=False)

    out_p = jax.jit(lambda *a: rasterize(*a, cam, cfg_stop))(*args)
    out_x = jax.jit(lambda *a: rasterize(*a, cam, cfg_xla))(*args)
    out_f = jax.jit(lambda *a: rasterize(*a, cam, cfg_full))(*args)
    # pallas == twin on the stopped primal (same exit rule, same granularity)
    np.testing.assert_allclose(np.asarray(out_p.im), np.asarray(out_x.im),
                               atol=1e-5)
    # stopped vs full: bounded by the residual transmittance 1e-4
    np.testing.assert_allclose(np.asarray(out_p.im), np.asarray(out_f.im),
                               atol=2e-4)

    def loss(cfg, *a):
        out = rasterize(*a, cam, cfg)
        return jnp.abs(out.im - target).mean() + 0.05 * out.final_t.mean()

    g_p = jax.jit(jax.grad(lambda *a: loss(cfg_stop, *a), argnums=(0, 2, 3)))(*args)
    g_x = jax.jit(jax.grad(lambda *a: loss(cfg_xla, *a), argnums=(0, 2, 3)))(*args)
    for gp, gx in zip(g_p, g_x):
        scale = np.abs(np.asarray(gx)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gp) / scale,
                                   np.asarray(gx) / scale, atol=1e-4)

    # the stop actually fires: some covered tile processes fewer sub-chunks
    # than its count requires
    from gsdx.render.binning import TileGrid, bin_gaussians
    from gsdx.render.projection import project_gaussians
    grid = TileGrid(height=H, width=W, tile_h=8, tile_w=128)
    proj = project_gaussians(*args[:3], cam)
    bins = bin_gaussians(proj.mean2d, proj.radius, proj.depth, proj.mask,
                         grid, max_per_tile=128, max_dup=16)
    feats = jnp.zeros((n, 16), jnp.float32)
    feats = feats.at[:, 0:2].set(proj.mean2d).at[:, 2:5].set(proj.conic)
    feats = feats.at[:, 5].set(jnp.asarray(opac[:, 0]) * proj.mask)
    feats = feats.at[:, 6:9].set(jnp.asarray(colors))
    feats = feats.at[:, 9].set(proj.depth)
    tf = feats[bins.gauss_idx].transpose(0, 2, 1)
    _, _, nproc = composite_tiles_pallas(
        tf, bins.counts, tiles_x=grid.tiles_x, tile_h=8, tile_w=128,
        chunk=128, sub_chunk=32, interpret=True)
    nchunks = np.ceil(np.asarray(bins.counts) / 32)
    assert (np.asarray(nproc) < nchunks).any(), "early stop never fired"


def test_pallas_subchunk_matches_xla(rng):
    """Sub-128 compute granules (aligned loads + switch slices) stay exact."""
    means, quats, scales, opac, colors = make_scene(rng, n=60)
    cam = make_cam()
    args = tuple(map(jnp.asarray, (means, quats, scales, opac, colors)))
    sub = PALLAS._replace(sub_chunk=64)
    out_p = jax.jit(lambda *a: rasterize(*a, cam, sub))(*args)
    out_x = jax.jit(lambda *a: rasterize(*a, cam, XLA))(*args)
    np.testing.assert_allclose(np.asarray(out_p.im), np.asarray(out_x.im),
                               atol=1e-5)

    target = jnp.asarray(rng.uniform(0, 1, size=(3, H, W)).astype(np.float32))

    def loss(cfg, *a):
        out = rasterize(*a, cam, cfg)
        return jnp.abs(out.im - target).mean() + 0.05 * out.final_t.mean()

    g_s = jax.jit(jax.grad(lambda *a: loss(sub, *a), argnums=(0, 1, 2)))(*args)
    g_x = jax.jit(jax.grad(lambda *a: loss(XLA, *a), argnums=(0, 1, 2)))(*args)
    for gp, gr in zip(g_s, g_x):
        scale = np.abs(np.asarray(gr)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(gp) / scale,
                                   np.asarray(gr) / scale, atol=1e-3)
