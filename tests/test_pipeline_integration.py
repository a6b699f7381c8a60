"""End-to-end data pipeline: synthetic episode on disk -> preprocess ->
dataset -> GNN train step -> rollout scene collection.

Exercises the same stage handoffs as the reference pipeline (SURVEY.md §1
"data handoff via the filesystem"): params.npz -> param_downsampled.npy +
frame_pairs -> GraphSampler batches -> rollout rendervars.
"""

import json
import os
import pickle

import jax
import numpy as np
import pytest

from gsdx.io.preprocess import preprocess_episode

N_PART = 1400
N_FRAMES = 20
N_DOWN = 300


@pytest.fixture
def episode_dirs(tmp_path, rng):
    data_dir = tmp_path / "data"
    out_dir = tmp_path / "ckpts"
    prep_dir = tmp_path / "prep"
    for d in (data_dir, out_dir, prep_dir):
        os.makedirs(d, exist_ok=True)

    # actions.txt: straight push in x, 5mm/frame (robot mm units)
    lines = []
    for t in range(N_FRAMES):
        lines.append(json.dumps({
            "joint_angles": [0.0] * 7,
            "pose": [100.0 + 5.0 * t, 50.0, 30.0, 180.0, 0.0, 90.0],
        }))
    (data_dir / "actions.txt").write_text("\n".join(lines) + "\n")

    calib = {"R_base2world": np.eye(3), "t_base2world": np.zeros(3)}
    with open(data_dir / "calibration_handeye_result.pkl", "wb") as f:
        pickle.dump(calib, f)

    meta = {
        "w": 64, "h": 48,
        "k": [[[[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]]] * 2] * N_FRAMES,
        "w2c": [[np.eye(4).tolist()] * 2] * N_FRAMES,
        "fn": [[f"camera_0/color_{t:06d}.jpg", f"camera_1/color_{t:06d}.jpg"]
               for t in range(N_FRAMES)],
    }
    with open(out_dir / "metadata.json", "w") as f:
        json.dump(meta, f)

    # synthetic tracked params: cloud translating with the push
    base = rng.uniform(-0.1, 0.1, size=(N_PART, 3)).astype(np.float32)
    xyz = np.stack(
        [base + np.array([0.005 * t, 0, 0], np.float32)
         for t in range(N_FRAMES)]
    )
    np.savez(
        out_dir / "params.npz",
        means3D=xyz,
        rgb_colors=xyz * 0 + 0.5,
        unnorm_rotations=np.tile(
            np.array([1.0, 0, 0, 0], np.float32), (N_FRAMES, N_PART, 1)),
        logit_opacities=np.ones((N_PART, 1), np.float32),
        log_scales=np.full((N_PART, 3), -5.0, np.float32),
    )
    return str(data_dir), str(out_dir), str(prep_dir)


def test_full_pipeline(episode_dirs, rng):
    data_dir, out_dir, prep_dir = episode_dirs

    # --- preprocess -------------------------------------------------------
    rows = preprocess_episode(
        data_dir, out_dir, prep_dir, dist_thresh=0.004, n_his=2, n_future=2,
        episode_idx=0, n_downsample=N_DOWN,
    )
    assert rows is not None and rows.shape == (N_FRAMES, 4)
    xyz_down = np.load(os.path.join(out_dir, "param_downsampled.npy"))
    assert xyz_down.shape == (N_FRAMES, N_DOWN, 3)
    pair_file = os.path.join(prep_dir, "frame_pairs", "0.txt")
    assert os.path.exists(pair_file)

    # --- dataset + train step --------------------------------------------
    from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
    from gsdx.dynamics.train import TrainConfig, init_params, make_train_step
    from gsdx.graph.dataset import EpisodeStore, GraphDatasetConfig, GraphSampler
    from gsdx.io.episodes import eef_world_positions, load_metadata

    meta = load_metadata(os.path.join(out_dir, "metadata.json"))
    eef = eef_world_positions(data_dir, meta)
    assert eef.shape == (N_FRAMES, 1, 3)
    # eef moves ~5mm/frame in world x
    d = np.diff(eef[:, 0, 0])
    np.testing.assert_allclose(d, 0.005, atol=1e-5)

    pairs = np.loadtxt(pair_file).astype(np.int64)
    pairs = np.concatenate(
        [np.zeros((len(pairs), 1), np.int64), pairs], axis=1)
    store = EpisodeStore.from_numpy([xyz_down], [eef], [pairs])

    dcfg = GraphDatasetConfig(n_his=2, n_future=2, max_nobj=20, max_nR=120,
                              topk=4, fps_radius_range=(0.04, 0.04),
                              adj_radius_range=(0.1, 0.1))
    sampler = GraphSampler(store, dcfg, "train")
    mcfg = ModelConfig(nf_particle=32, nf_relation=32, nf_effect=32, n_his=2)
    tcfg = TrainConfig(batch_size=4, n_his=2, n_future=2)
    model = DynamicsPredictor(mcfg)
    params = init_params(model, tcfg, dcfg, jax.random.PRNGKey(0))
    step, _, tx = make_train_step(model, tcfg)
    opt_state = tx.init(params)
    batch = sampler.sample(jax.random.PRNGKey(1), 4)
    params, opt_state, loss, _ = step(params, opt_state, batch)
    assert np.isfinite(float(loss))

    # --- rollout scene collection ----------------------------------------
    from gsdx.apps.predict import collect_scene_data

    scene_data, vis, meta2 = collect_scene_data(
        os.path.join(out_dir, "params.npz"), data_dir, out_dir,
        mcfg, tcfg._replace(dist_thresh=0.004), dcfg, params, max_steps=6,
    )
    assert len(scene_data) == 6
    for sd in scene_data:
        assert np.isfinite(sd["means3D"]).all()
        assert sd["means3D"].shape[0] <= N_PART
