"""Multi-chip sharding on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdx.dist.mesh import get_mesh
from gsdx.dist.render_sharded import make_sharded_tracking_step, sharded_composite
from gsdx.dist.train_dp import make_dp_train_step, shard_batch
from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import init_params, make_train_step
from gsdx.graph.dataset import GraphSampler
from gsdx.render.binning import TileGrid
from gsdx.render.rasterize import RasterizeConfig
from gsdx.track.losses import LossWeights

from test_dynamics import DATA_CFG, MODEL_CFG, TRAIN_CFG, synth_episodes
from test_tracking import CFG_RASTER, make_cams, make_gt_scene, render_targets


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_sharded_composite_matches_single(rng):
    mesh = get_mesh()
    T, F, K = 12, 16, 128
    grid = TileGrid(height=32, width=256, tile_h=8, tile_w=128)
    feats = jnp.asarray(rng.normal(size=(T, F, K)).astype(np.float32))
    # make opacities sane
    feats = feats.at[:, 5].set(jnp.abs(feats[:, 5]) * 0.3)
    feats = feats.at[:, 2].set(jnp.abs(feats[:, 2]) * 0.1)
    feats = feats.at[:, 4].set(jnp.abs(feats[:, 4]) * 0.1)
    counts = jnp.asarray(rng.integers(0, K, size=(T,)).astype(np.int32))
    cfg = RasterizeConfig(backend="xla")

    from gsdx.kernels.composite import composite_tiles_xla
    ref_accum, ref_logt = composite_tiles_xla(
        feats, counts, tiles_x=grid.tiles_x, tile_h=8, tile_w=128)
    accum, logt = sharded_composite(feats, counts, grid, cfg, mesh)
    np.testing.assert_allclose(np.asarray(accum), np.asarray(ref_accum),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(logt), np.asarray(ref_logt),
                               atol=1e-5)


def test_dp_train_step_matches_single_device(rng):
    mesh = get_mesh()
    store = synth_episodes(rng)
    sampler = GraphSampler(store, DATA_CFG, phase="train")
    model = DynamicsPredictor(MODEL_CFG)
    params = init_params(model, TRAIN_CFG, DATA_CFG, jax.random.PRNGKey(0))

    step_single, _, tx1 = make_train_step(model, TRAIN_CFG)
    step_dp, tx2 = make_dp_train_step(model, TRAIN_CFG, mesh)

    batch = sampler.sample(jax.random.PRNGKey(2), 8)
    p1, o1, loss1, _ = step_single(params, tx1.init(params), batch)
    batch_sharded = shard_batch(batch, mesh)
    p2, o2, loss2, _ = step_dp(params, tx2.init(params), batch_sharded)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


@pytest.mark.slow
def test_camera_sharded_tracking_grads_match(rng):
    # 8 devices / 4 cameras is uneven; use a 4-device submesh
    mesh = get_mesh([("data", 4)], devices=jax.devices()[:4])
    pt_cld = make_gt_scene(rng, n=40)
    cams3 = make_cams()  # 3 stacked cameras
    # pad to 4 cameras by repeating the first
    cams = jax.tree.map(
        lambda x: jnp.concatenate([x, x[:1]]) if hasattr(x, "ndim") else x,
        cams3,
    )
    ims3, segs3 = render_targets(pt_cld, cams3)
    ims = jnp.concatenate([ims3, ims3[:1]])
    segs = jnp.concatenate([segs3, segs3[:1]])

    from gsdx.core.gaussians import init_gaussian_params, init_tracking_variables
    from gsdx.kernels.knn import knn
    from gsdx.track.losses import tracking_loss

    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1), capacity=64)
    variables = init_tracking_variables(64, num_knn=4, scene_radius=1.0)
    weights = LossWeights()

    step = make_sharded_tracking_step(
        CFG_RASTER, mesh, weights, is_initial=True)
    m2d = jnp.zeros((64, 2))
    loss_sharded, (g_params, g_m2d) = step(
        params, m2d, cams, ims, segs, variables)

    # single-device reference: mean of per-camera losses
    losses, grads = [], []
    for ci in range(4):
        cam = jax.tree.map(
            lambda x: x[ci] if hasattr(x, "ndim") and x.ndim > 0 else x, cams)

        def lf(p, m):
            l, _ = tracking_loss(p, m, cam, ims[ci], segs[ci], variables,
                                 weights, True, CFG_RASTER)
            return l

        (l), g = jax.value_and_grad(lf, argnums=(0, 1))(params, m2d)
        losses.append(float(l))
        grads.append(g)
    np.testing.assert_allclose(float(loss_sharded), np.mean(losses), rtol=1e-5)
    mean_g = jax.tree.map(lambda *x: sum(x) / 4.0, *[g[0] for g in grads])
    for a, b in zip(jax.tree.leaves(g_params), jax.tree.leaves(mean_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_camera_sharded_tracking_t1_grads_match(rng):
    """The t>0 loss branch (rigid/rot/iso/floor/bg tail) under shard_map
    matches the per-camera mean of single-device losses and grads."""
    mesh = get_mesh([("data", 4)], devices=jax.devices()[:4])
    pt_cld = make_gt_scene(rng, n=40)
    cams3 = make_cams()
    cams = jax.tree.map(
        lambda x: jnp.concatenate([x, x[:1]]) if hasattr(x, "ndim") else x,
        cams3,
    )
    ims3, segs3 = render_targets(pt_cld, cams3)
    ims = jnp.concatenate([ims3, ims3[:1]])
    segs = jnp.concatenate([segs3, segs3[:1]])

    from gsdx.core.gaussians import init_gaussian_params, init_tracking_variables
    from gsdx.kernels.knn import knn
    from gsdx.track.losses import tracking_loss
    from gsdx.track.optimizer import GroupAdam
    from gsdx.track.trainer import (
        initialize_per_timestep,
        initialize_post_first_timestep,
    )

    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1), capacity=64)
    variables = init_tracking_variables(64, num_knn=4, scene_radius=1.0)
    variables = initialize_post_first_timestep(params, variables, num_knn=4)
    params, variables, _ = initialize_per_timestep(
        params, variables, GroupAdam().init(params))
    weights = LossWeights()

    step = make_sharded_tracking_step(
        CFG_RASTER, mesh, weights, is_initial=False)
    m2d = jnp.zeros((64, 2))
    loss_sharded, (g_params, g_m2d) = step(
        params, m2d, cams, ims, segs, variables)
    assert bool(jnp.isfinite(loss_sharded))

    losses, grads = [], []
    for ci in range(4):
        cam = jax.tree.map(
            lambda x: x[ci] if hasattr(x, "ndim") and x.ndim > 0 else x, cams)

        def lf(p, m):
            l, _ = tracking_loss(p, m, cam, ims[ci], segs[ci], variables,
                                 weights, False, CFG_RASTER)
            return l

        (l), g = jax.value_and_grad(lf, argnums=(0, 1))(params, m2d)
        losses.append(float(l))
        grads.append(g)
    np.testing.assert_allclose(float(loss_sharded), np.mean(losses), rtol=1e-5)
    mean_g = jax.tree.map(lambda *x: sum(x) / 4.0, *[g[0] for g in grads])
    for a, b in zip(jax.tree.leaves(g_params), jax.tree.leaves(mean_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_mppi_sample_sharding_matches_single(rng):
    """Sample-sharded MPPI produces identical results to single-device."""
    import jax.numpy as jnp

    from gsdx.plan.actions import decode_action
    from gsdx.plan.cost import running_cost
    from gsdx.plan.planner import MPPIConfig, Planner

    cluster = jnp.asarray(rng.normal(scale=0.03, size=(12, 3)).astype(np.float32))
    target = cluster + jnp.array([0.1, 0.0, 0.0])

    def toy_rollout(state_cur, act_seqs):
        decoded, repeats = decode_action(act_seqs, 0.01)
        unit = jnp.stack(
            [decoded[:, :, 2] - decoded[:, :, 0],
             decoded[:, :, 3] - decoded[:, :, 1],
             jnp.zeros_like(decoded[:, :, 0])], axis=-1)
        move = unit * repeats[..., None].astype(jnp.float32)
        return {"state_seqs": state_cur[None, None] + move[:, :, None, :],
                "action_seqs": decoded}

    bbox = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])

    def evaluate(state_seqs, action_seqs, state_cur):
        return running_cost(state_seqs, action_seqs, state_cur, target, bbox)

    cfg = MPPIConfig(n_sample=64, n_update_iter=3,
                     action_lower_lim=(-0.4, -0.4, -np.pi, 5.0),
                     action_upper_lim=(0.4, 0.4, np.pi, 20.0))
    init = jnp.zeros((1, 4)).at[0, 3].set(10.0)
    key = jax.random.PRNGKey(5)

    single = Planner(cfg, toy_rollout, evaluate)
    res1 = single.trajectory_optimization(key, cluster, init)

    mesh = get_mesh()
    sharded = Planner(cfg, toy_rollout, evaluate, mesh=mesh)
    res2 = sharded.trajectory_optimization(key, cluster, init)

    np.testing.assert_allclose(np.asarray(res1["act_seq"]),
                               np.asarray(res2["act_seq"]), atol=1e-5)
    np.testing.assert_allclose(float(res1["best_reward"]),
                               float(res2["best_reward"]), rtol=1e-5)
