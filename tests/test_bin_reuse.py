"""Block-frozen bin reuse: stale-coverage rendering parity + tracking use.

`compute_bins(margin_px=m)` must yield bins whose coverage is a superset of
the true coverage for any drift up to m pixels, so rendering with frozen
bins matches fresh-bins rendering exactly (extra covers composite with
alpha ~ 0) wherever no tile overflows K.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdx.core.cameras import make_camera
from gsdx.render.rasterize import RasterizeConfig, compute_bins, rasterize


def _scene(rng, n=600):
    means = rng.uniform(-0.5, 0.5, size=(n, 3)).astype(np.float32)
    means[:, 2] = means[:, 2] * 0.3 + 2.5
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.01, 0.03, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))


def test_frozen_bins_match_fresh_under_drift(rng):
    H, W = 96, 256
    k = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], np.float32)
    cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                      bg=(0.2, 0.3, 0.4))
    cfg = RasterizeConfig(binning="nosort")
    means, quats, scales, opac, colors = _scene(rng)

    # bins at step 0 with a 4 px margin
    bins0 = jax.jit(lambda *a: compute_bins(
        *a, cam, cfg, margin_px=4.0))(means, quats, scales)

    # drift positions by ~2 px (focal 120, depth 2.5: 1 px ~ 0.021 world)
    drift = jnp.asarray(
        rng.uniform(-0.04, 0.04, size=means.shape).astype(np.float32)
    ) * jnp.asarray([1.0, 1.0, 0.0])
    moved = means + drift

    out_frozen = jax.jit(lambda m, b: rasterize(
        m, quats, scales, opac, colors, cam, cfg, bins=b))(moved, bins0)
    out_fresh = jax.jit(lambda m: rasterize(
        m, quats, scales, opac, colors, cam, cfg))(moved)
    np.testing.assert_allclose(
        np.asarray(out_frozen.im), np.asarray(out_fresh.im),
        atol=5e-5, rtol=0,
    )
    np.testing.assert_allclose(
        np.asarray(out_frozen.depth), np.asarray(out_fresh.depth),
        atol=5e-4, rtol=0,
    )

    # gradients flow and are finite through the frozen-bins path
    def loss(m):
        o = rasterize(m, quats, scales, opac, colors, cam, cfg, bins=bins0)
        return o.im.mean()

    g = jax.jit(jax.grad(loss))(moved)
    assert bool(jnp.isfinite(g).all())


def test_live_tile_compaction_matches_full(rng, monkeypatch):
    """Frozen-bin live-tile compaction: outputs and grads identical to the
    full-grid path, in BOTH cond branches (n_live <= cap and the fallback)."""
    import importlib

    R = importlib.import_module("gsdx.render.rasterize")
    H, W = 96, 256  # 12 tiles at 16x128
    k = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]], np.float32)
    cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                      bg=(0.2, 0.3, 0.4))
    cfg = RasterizeConfig(binning="nosort")
    means, quats, scales, opac, colors = _scene(rng, n=300)
    # concentrate the scene so some tiles stay empty
    means = means * jnp.asarray([0.3, 0.3, 1.0])
    bins = jax.jit(lambda *a: compute_bins(
        *a, cam, cfg, margin_px=4.0))(means, quats, scales)
    n_live = int(bins.n_live)
    assert 0 < n_live < 12

    def run(cap):
        monkeypatch.setattr(R, "LIVE_COMPACT_CAP", cap)

        def loss(m):
            o = R.rasterize(m, quats, scales, opac, colors, cam, cfg,
                            bins=bins)
            return o.im.mean() + o.final_t.mean(), o
        (v, o), g = jax.jit(jax.value_and_grad(loss, has_aux=True))(means)
        return o, g

    o_full, g_full = run(10**6)  # cap > T: compaction disabled entirely
    o_comp, g_comp = run(n_live)  # compact branch fires (n_live <= cap < T)
    o_fall, g_fall = run(max(1, n_live - 1))  # fallback branch (live > cap)
    for o, g in ((o_comp, g_comp), (o_fall, g_fall)):
        np.testing.assert_allclose(np.asarray(o.im), np.asarray(o_full.im),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(o.final_t),
                                   np.asarray(o_full.final_t), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_full),
                                   atol=1e-6)


@pytest.mark.slow  # convergence-quality e2e; the drift-parity test is fast
def test_tracking_fit_frozen_vs_fresh_psnr(rng):
    """t>0 fit with bin_refresh reuse converges like the per-iter-rebuild
    path (same scene, same schedule; PSNR within 0.2 dB)."""
    from gsdx.core.gaussians import init_gaussian_params
    from gsdx.kernels.knn import knn
    from gsdx.track.optimizer import GroupAdam, tracking_lrs
    from gsdx.track.trainer import (
        TrackingConfig,
        camera_order,
        initialize_post_first_timestep,
        make_fit_timestep,
    )
    from gsdx.core.gaussians import init_tracking_variables

    H, W = 64, 128
    n = 256
    pt_cld = np.concatenate(
        [
            rng.uniform(-0.3, 0.3, size=(n, 3)).astype(np.float32)
            + np.array([0, 0, 2.0], np.float32),
            rng.uniform(0.2, 0.8, size=(n, 3)).astype(np.float32),
            np.ones((n, 1), np.float32),
        ],
        axis=1,
    )
    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    k = np.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], np.float32)
    cams = [
        make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                    cam_id=i, bg=(0, 0, 0))
        for i in range(2)
    ]
    cams = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    ims = jnp.asarray(rng.uniform(size=(2, 3, H, W)).astype(np.float32))
    segs = jnp.ones((2, 3, H, W), jnp.float32) * jnp.asarray(
        [1.0, 0.0, 0.0])[None, :, None, None]

    num_iters = 24
    results = {}
    for refresh in (1, 8):
        params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1),
                                      capacity=n)
        variables = init_tracking_variables(n, num_knn=4, scene_radius=1.0)
        variables = initialize_post_first_timestep(params, variables,
                                                   num_knn=4)
        adam = GroupAdam()
        opt_state = adam.init(params)
        lrs = tracking_lrs(1.0, post_first_timestep=True)
        cfg = TrackingConfig(num_knn=4, bin_refresh=refresh)
        fit = make_fit_timestep(cfg, is_initial=False, num_iters=num_iters)
        order = camera_order(num_iters, 2, np.random.default_rng(0))
        _, _, _, logs = fit(params, opt_state, variables, lrs, cams, ims,
                            segs, order, jax.random.PRNGKey(0))
        results[refresh] = np.asarray(logs["psnr"])
        assert np.isfinite(results[refresh]).all()

    assert abs(results[1][-1] - results[8][-1]) < 0.2, (
        results[1][-1], results[8][-1])
