import jax
import jax.numpy as jnp
import numpy as np

from gsdx.core.transforms import quat_to_rotmat
from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.dynamics.train import TrainConfig, init_params
from gsdx.graph.dataset import GraphDatasetConfig
from gsdx.rollout.dynamics_module import DynamicsModule, RolloutConfig, smooth_trajectory
from gsdx.rollout.skinning import interpolate_motions, relations_to_matrix


def test_skinning_pure_translation(rng):
    bones = rng.normal(size=(12, 3)).astype(np.float32)
    delta = np.array([0.1, -0.2, 0.3], np.float32)
    motions = np.tile(delta, (12, 1))
    rel = np.ones((12, 12), np.float32) - np.eye(12, dtype=np.float32)
    xyz = rng.normal(size=(200, 3)).astype(np.float32)
    quat = np.tile(np.array([1.0, 0, 0, 0], np.float32), (200, 1))
    new_xyz, new_quat, w = interpolate_motions(
        jnp.asarray(bones), jnp.asarray(motions), jnp.asarray(rel),
        jnp.asarray(xyz), quat=jnp.asarray(quat))
    np.testing.assert_allclose(np.asarray(new_xyz), xyz + delta, atol=1e-4)
    np.testing.assert_allclose(np.abs(np.asarray(new_quat)[:, 0]), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(w).sum(1), 1.0, atol=1e-5)


def test_skinning_pure_rotation(rng):
    theta = 0.3
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0],
                  [0, 0, 1]], np.float32)
    bones = rng.normal(size=(16, 3)).astype(np.float32)
    motions = bones @ R.T - bones
    rel = np.ones((16, 16), np.float32) - np.eye(16, dtype=np.float32)
    xyz = rng.normal(size=(100, 3)).astype(np.float32) * 0.5
    quat = np.tile(np.array([1.0, 0, 0, 0], np.float32), (100, 1))
    new_xyz, new_quat, _ = interpolate_motions(
        jnp.asarray(bones), jnp.asarray(motions), jnp.asarray(rel),
        jnp.asarray(xyz), quat=jnp.asarray(quat))
    # all bones share one rigid rotation about the origin -> particles follow it
    np.testing.assert_allclose(np.asarray(new_xyz), xyz @ R.T, atol=5e-2)
    # particle orientations rotate by R
    R_par = np.asarray(quat_to_rotmat(new_quat))[0]
    np.testing.assert_allclose(R_par, R, atol=1e-2)


def test_skinning_masked_bones_ignored(rng):
    bones = rng.normal(size=(8, 3)).astype(np.float32)
    motions = np.zeros((8, 3), np.float32)
    motions[4:] = 100.0  # masked bones have absurd motion
    mask = np.zeros(8, bool)
    mask[:4] = True
    rel = np.ones((8, 8), np.float32)
    xyz = rng.normal(size=(50, 3)).astype(np.float32)
    new_xyz, _, _ = interpolate_motions(
        jnp.asarray(bones), jnp.asarray(motions), jnp.asarray(rel),
        jnp.asarray(xyz), bone_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(new_xyz), xyz, atol=1e-3)


def test_relations_to_matrix():
    N, nR = 5, 8
    Rr = np.zeros((nR, N), np.float32)
    Rs = np.zeros((nR, N), np.float32)
    edges = [(0, 1), (2, 3), (4, 0)]
    for e, (r, s) in enumerate(edges):
        Rr[e, r] = 1
        Rs[e, s] = 1
    M = np.asarray(relations_to_matrix(jnp.asarray(Rr), jnp.asarray(Rs), N))
    expect = np.zeros((N, N))
    for r, s in edges:
        expect[r, s] = 1
    np.testing.assert_array_equal(M, expect)


def test_rollout_skips_static_eef(rng):
    model_cfg = ModelConfig(nf_particle=32, nf_relation=32, nf_effect=32, n_his=2)
    data_cfg = GraphDatasetConfig(n_his=2, max_nobj=16, max_nR=96, topk=3)
    params = init_params(
        DynamicsPredictor(model_cfg), TrainConfig(n_his=2), data_cfg,
        jax.random.PRNGKey(0))
    cfg = RolloutConfig(n_his=2, max_nobj=16, n_fps_proxy=32, max_nR=96,
                        topk=3, dist_thresh=0.01, fps_radius=0.02,
                        adj_thresh=0.5)
    dm = DynamicsModule(model_cfg, params, cfg)
    xyz0 = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32) * 0.1)
    quat0 = jnp.tile(jnp.array([1.0, 0, 0, 0]), (64, 1))
    eef = np.zeros((6, 1, 3), np.float32)
    eef[3:] += 0.05  # only step 3 moves
    traj = dm.rollout(xyz0, quat0, eef, n_steps=6)
    assert traj["xyz"].shape == (6, 64, 3)
    assert np.isfinite(traj["xyz"]).all() and np.isfinite(traj["quat"]).all()
    # static steps copy previous state exactly
    np.testing.assert_array_equal(traj["xyz"][1], traj["xyz"][0])
    np.testing.assert_array_equal(traj["xyz"][2], traj["xyz"][1])
    assert not np.array_equal(traj["xyz"][3], traj["xyz"][2])
    np.testing.assert_array_equal(traj["xyz"][5], traj["xyz"][4])

    smoothed = smooth_trajectory(traj)
    assert smoothed["xyz"].shape == traj["xyz"].shape
    # smoothing fills the static prefix with a lerp toward the change point
    assert not np.array_equal(smoothed["xyz"][1], smoothed["xyz"][0])
