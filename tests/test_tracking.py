"""Tracking optimizer end-to-end on a tiny synthetic scene.

Mirrors the reference quality signal: PSNR on a train view must rise during
optimization (`report_progress`, `src/tracking/train_utils.py:377-384`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdx.core.cameras import make_camera
from gsdx.core.gaussians import init_gaussian_params, init_tracking_variables
from gsdx.kernels.knn import knn
from gsdx.render.rasterize import RasterizeConfig, rasterize
from gsdx.render.renderer import params_to_rendervar
from gsdx.track.densify import DensifyConfig
from gsdx.track.losses import LossWeights, calc_psnr
from gsdx.track.optimizer import GroupAdam, tracking_lrs
from gsdx.track.trainer import (
    TrackingConfig,
    camera_order,
    compact_params,
    initialize_per_timestep,
    initialize_post_first_timestep,
    make_fit_timestep,
)

H, W = 32, 64
CFG_RASTER = RasterizeConfig(tile_h=8, tile_w=128, max_per_tile=128, backend="xla")


def make_cams():
    k = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    cams = []
    for ang in [0.0, 0.4, -0.4]:
        c, s = np.cos(ang), np.sin(ang)
        w2c = np.eye(4, dtype=np.float32)
        w2c[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        w2c[2, 3] = 0.0
        cams.append(make_camera(k, w2c, width=W, height=H, bg=(0, 0, 0), cam_id=len(cams)))
    return jax.tree.map(lambda *x: jnp.stack(x), *cams)


def make_gt_scene(rng, n=60):
    pts = rng.uniform(-0.4, 0.4, size=(n, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.3 + 3.0
    rgb = rng.uniform(0.1, 0.9, size=(n, 3)).astype(np.float32)
    seg = (rng.uniform(size=n) > 0.3).astype(np.float32)
    return np.concatenate([pts, rgb, seg[:, None]], axis=1)


def render_targets(pt_cld, cams, scales=0.05):
    n = pt_cld.shape[0]
    ims, segs = [], []
    seg_colors = np.stack(
        [pt_cld[:, 6], np.zeros(n), 1 - pt_cld[:, 6]], axis=-1
    ).astype(np.float32)
    for ci in range(3):
        cam = jax.tree.map(lambda x: x[ci], cams)
        args = dict(
            means3d=jnp.asarray(pt_cld[:, :3]),
            quats=jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
            scales=jnp.full((n, 3), scales),
            opacities=jnp.full((n, 1), 0.95),
            camera=cam,
            cfg=CFG_RASTER,
        )
        ims.append(rasterize(colors=jnp.asarray(pt_cld[:, 3:6]), **args).im)
        segs.append(rasterize(colors=jnp.asarray(seg_colors), **args).im)
    return jnp.stack(ims), jnp.stack(segs)


def test_fit_initial_timestep_improves_psnr(rng):
    pt_cld = make_gt_scene(rng)
    cams = make_cams()
    ims, segs = render_targets(pt_cld, cams)

    # init from the true cloud with perturbed positions
    noisy = pt_cld.copy()
    noisy[:, :3] += rng.normal(scale=0.01, size=(len(pt_cld), 3)).astype(np.float32)
    d, _ = knn(jnp.asarray(noisy[:, :3]), 3)
    params = init_gaussian_params(noisy, np.asarray(d).mean(-1), capacity=256)
    variables = init_tracking_variables(params.capacity, num_knn=8, scene_radius=1.0)

    cfg = TrackingConfig(
        iters_first=90, iters_rest=25, num_knn=8,
        raster=CFG_RASTER,
        densify=DensifyConfig(),
    )
    adam = GroupAdam()
    opt_state = adam.init(params)
    lrs = tracking_lrs(1.0, post_first_timestep=False)
    fit = make_fit_timestep(cfg, is_initial=True, num_iters=cfg.iters_first)
    order = camera_order(cfg.iters_first, 3, np.random.default_rng(0))
    key = jax.random.PRNGKey(0)

    params2, opt_state2, variables2, logs = fit(
        params, opt_state, variables, lrs, cams, ims, segs, order, key
    )
    psnr = np.asarray(logs["psnr"])
    assert np.isfinite(psnr).all()
    assert psnr[-10:].mean() > psnr[:10].mean() + 1.0, (
        f"PSNR did not improve: {psnr[:10].mean()} -> {psnr[-10:].mean()}"
    )

    # second timestep machinery: compaction, KNN tables, warm start, rigidity
    params3, variables3 = compact_params(params2, variables2)
    assert params3.capacity <= params2.capacity
    variables3 = initialize_post_first_timestep(params3, variables3, num_knn=8)
    params4, variables4, opt_state4 = initialize_per_timestep(
        params3, variables3, adam.init(params3)
    )
    fit_rest = make_fit_timestep(cfg, is_initial=False, num_iters=cfg.iters_rest)
    lrs_rest = tracking_lrs(1.0, post_first_timestep=True)
    order = camera_order(cfg.iters_rest, 3, np.random.default_rng(1))
    params5, _, _, logs5 = fit_rest(
        params4, opt_state4, variables4, lrs_rest, cams, ims, segs, order, key
    )
    assert np.isfinite(np.asarray(logs5["loss"])).all()
    # frozen params must not move after the first timestep
    np.testing.assert_array_equal(
        np.asarray(params5.logit_opacities), np.asarray(params4.logit_opacities)
    )
    np.testing.assert_array_equal(
        np.asarray(params5.log_scales), np.asarray(params4.log_scales)
    )


def test_segmented_fit_matches_single_dispatch(rng):
    """max_dispatch_iters segmentation: the t>0 fit uses no PRNG, so a
    segmented fit must be BIT-identical to the single-dispatch one."""
    pt_cld = make_gt_scene(rng)
    cams = make_cams()
    ims, segs = render_targets(pt_cld, cams)
    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1), capacity=64)
    variables = init_tracking_variables(params.capacity, num_knn=8,
                                        scene_radius=1.0)
    variables = initialize_post_first_timestep(params, variables, num_knn=8)
    adam = GroupAdam()
    lrs = tracking_lrs(1.0, post_first_timestep=True)
    order = camera_order(24, 3, np.random.default_rng(0))
    key = jax.random.PRNGKey(0)

    outs = []
    for max_disp in (0, 8):  # 0 = unsegmented; 8 -> 3 segments
        cfg = TrackingConfig(num_knn=8, raster=CFG_RASTER, bin_refresh=4,
                             max_dispatch_iters=max_disp)
        fit = make_fit_timestep(cfg, is_initial=False, num_iters=24)
        p, _, _, logs = fit(params, adam.init(params), variables, lrs, cams,
                            ims, segs, order, key)
        outs.append((p, logs))
    (p_a, logs_a), (p_b, logs_b) = outs
    np.testing.assert_array_equal(np.asarray(p_a.means3d),
                                  np.asarray(p_b.means3d))
    np.testing.assert_array_equal(np.asarray(logs_a["loss"]),
                                  np.asarray(logs_b["loss"]))
    assert logs_b["loss"].shape == (24,)


@pytest.mark.slow
def test_ragged_segmented_fit_matches_single_dispatch(rng):
    """num_iters with no divisor near the cap (23 prime) splits as 8+8+7 —
    a shorter final segment, NOT degenerate one-iteration dispatches — and
    stays bit-identical to the unsegmented fit (t>0 uses no PRNG).
    Slow-marked (fast-tier budget): the even-segment path stays fast via
    test_segmented_fit_matches_single_dispatch."""
    pt_cld = make_gt_scene(rng)
    cams = make_cams()
    ims, segs = render_targets(pt_cld, cams)
    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1), capacity=64)
    variables = init_tracking_variables(params.capacity, num_knn=8,
                                        scene_radius=1.0)
    variables = initialize_post_first_timestep(params, variables, num_knn=8)
    adam = GroupAdam()
    lrs = tracking_lrs(1.0, post_first_timestep=True)
    order = camera_order(23, 3, np.random.default_rng(0))
    key = jax.random.PRNGKey(0)

    outs = []
    # bin_refresh=1: the refresh divisor depends on segment length, so only
    # per-iteration binning is comparable bit-for-bit across segmentations
    for max_disp in (0, 8):  # 0 = unsegmented; 8 -> segments 8, 8, 7
        cfg = TrackingConfig(num_knn=8, raster=CFG_RASTER, bin_refresh=1,
                             max_dispatch_iters=max_disp)
        fit = make_fit_timestep(cfg, is_initial=False, num_iters=23)
        p, _, _, logs = fit(params, adam.init(params), variables, lrs, cams,
                            ims, segs, order, key)
        outs.append((p, logs))
    (p_a, logs_a), (p_b, logs_b) = outs
    np.testing.assert_array_equal(np.asarray(p_a.means3d),
                                  np.asarray(p_b.means3d))
    np.testing.assert_array_equal(np.asarray(logs_a["loss"]),
                                  np.asarray(logs_b["loss"]))
    assert logs_b["loss"].shape == (23,)


def test_densify_schedule_knobs(rng):
    """DensifyConfig.{start,interval,end,reset_interval} drive the trainer's
    densify/reset gating (reference hard-codes 500/100/5000/3000,
    `external.py:243-293`; the knobs exist for denser-than-production
    stress fits, e.g. benchmarks/drive_koverflow.py)."""
    pt_cld = make_gt_scene(rng)
    cams = make_cams()
    ims, segs = render_targets(pt_cld, cams)
    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1), capacity=256)
    variables = init_tracking_variables(params.capacity, num_knn=8,
                                        scene_radius=1.0)
    adam = GroupAdam()
    lrs = tracking_lrs(1.0, post_first_timestep=False)
    order = camera_order(25, 3, np.random.default_rng(0))
    key = jax.random.PRNGKey(0)

    def fit_with(dcfg):
        cfg = TrackingConfig(iters_first=25, num_knn=8, raster=CFG_RASTER,
                             densify=dcfg)
        fit = make_fit_timestep(cfg, is_initial=True, num_iters=25)
        return fit(params, adam.init(params), variables, lrs, cams, ims,
                   segs, order, key)

    # reset fires at i=20 (reset_interval=20 <= end) -> all live opacities
    # snap to logit(0.01) and stay near it 5 iters later
    p_reset, _, _, _ = fit_with(DensifyConfig(
        start=10, interval=10, end=24, reset_interval=20,
        grad_thresh=1e9))  # grad_thresh huge: no clone/split noise
    opac = jax.nn.sigmoid(np.asarray(p_reset.logit_opacities)[:, 0])
    live = np.asarray(p_reset.live) > 0
    assert opac[live].max() < 0.05, opac[live].max()


@pytest.mark.slow
def test_densify_schedule_knobs_extended(rng):
    """Each DensifyConfig variant is a separate fit compile (~7s) — the
    reset-fires case stays in the fast tier above; these two are slow."""
    pt_cld = make_gt_scene(rng)
    cams = make_cams()
    ims, segs = render_targets(pt_cld, cams)
    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1), capacity=256)
    variables = init_tracking_variables(params.capacity, num_knn=8,
                                        scene_radius=1.0)
    adam = GroupAdam()
    lrs = tracking_lrs(1.0, post_first_timestep=False)
    order = camera_order(25, 3, np.random.default_rng(0))
    key = jax.random.PRNGKey(0)

    def fit_with(dcfg):
        cfg = TrackingConfig(iters_first=25, num_knn=8, raster=CFG_RASTER,
                             densify=dcfg)
        fit = make_fit_timestep(cfg, is_initial=True, num_iters=25)
        return fit(params, adam.init(params), variables, lrs, cams, ims,
                   segs, order, key)

    # reset_interval=0 disables the reset entirely: opacities keep training
    p_nores, _, _, _ = fit_with(DensifyConfig(
        start=10, interval=10, end=24, reset_interval=0, grad_thresh=1e9))
    opac2 = jax.nn.sigmoid(np.asarray(p_nores.logit_opacities)[:, 0])
    live2 = np.asarray(p_nores.live) > 0
    assert opac2[live2].max() > 0.5, opac2[live2].max()

    # a window that never opens (start > num_iters) leaves the live count
    # at the init value even with a zero grad threshold
    p_closed, _, _, _ = fit_with(DensifyConfig(
        start=100, interval=10, end=24, reset_interval=0, grad_thresh=0.0))
    assert int(np.asarray(p_closed.live).sum()) == len(pt_cld)


def test_densify_step_gating(rng):
    """Unit-level gating of densify_step (no fit compile): big-point prune
    starts at `big_point_start` (NOT reset_interval — ADVICE r4), and the
    aggressive final threshold lands on the last interval multiple <= end
    even when end % interval != 0."""
    from gsdx.track.densify import densify_step

    pt_cld = make_gt_scene(rng)
    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1), capacity=256)
    # one oversized live gaussian (scale > big_point_ws * scene_radius)
    params = params.replace(
        log_scales=params.log_scales.at[0].set(jnp.log(0.5)))
    variables = init_tracking_variables(params.capacity, num_knn=8,
                                        scene_radius=1.0)
    adam = GroupAdam()
    opt_state = adam.init(params)
    key = jax.random.PRNGKey(0)

    step = jax.jit(densify_step, static_argnames="cfg")

    # reset_interval=0 must NOT enable big-point pruning from iter 0
    cfg0 = DensifyConfig(reset_interval=0, grad_thresh=1e9)
    p0, _, _ = step(params, variables, opt_state, key,
                    jnp.asarray(500, jnp.int32), cfg0)
    assert p0.live[0] > 0, "big-point prune fired before big_point_start"

    # ... and fires once i >= big_point_start
    p1, _, _ = step(params, variables, opt_state, key,
                    jnp.asarray(3000, jnp.int32), cfg0)
    assert p1.live[0] == 0, "big-point prune missing at big_point_start"

    # aggressive final threshold with end % interval != 0: fires at the
    # last multiple of interval <= end (200), not at i == end (250, never
    # a densify iteration)
    cfg1 = DensifyConfig(interval=100, end=250, remove_thresh=0.0,
                         remove_thresh_5k=0.99, grad_thresh=1e9,
                         big_point_start=10**9)
    base_live = int(jnp.sum(params.live > 0))
    p2, _, _ = step(params, variables, opt_state, key,
                    jnp.asarray(100, jnp.int32), cfg1)
    assert int(jnp.sum(p2.live > 0)) == base_live  # mid-schedule: thresh 0.0
    p3, _, _ = step(params, variables, opt_state, key,
                    jnp.asarray(200, jnp.int32), cfg1)
    assert int(jnp.sum(p3.live > 0)) < base_live  # final step: 0.99 prunes
