"""`gsdx.apps.train` CLI end-to-end on synthetic episode fixtures.

Mirrors `tests/test_track_app.py`: drives `main([...])` through argparse,
the YAML config loader, and `load_episode_store`'s on-disk layout
(`base/{data,ckpts,preprocessed}/...`, reference `src/train.py:264-271` +
`src/data/dataset.py:261-291`), asserting checkpoints and the loss plot
appear on the reference's schedule (`src/train.py:240-258`).
"""

import json
import os
import pickle

import numpy as np
import pytest

N_FRAMES = 16
N_DOWN = 40
NAME = "episodes_toy"


@pytest.fixture
def train_tree(tmp_path, rng):
    base = tmp_path / "d3dg"
    data_root = base / "data" / NAME
    out_root = base / "ckpts" / f"exp_{NAME}"
    prep_root = base / "preprocessed" / f"exp_{NAME}"

    for idx in range(2):  # 80/20 split -> episode 0 trains, episode 1 valids
        ep = f"episode_{idx:02d}"
        data_dir = data_root / ep
        out_dir = out_root / ep / NAME / ep
        prep_dir = prep_root / ep / "frame_pairs"
        for d in (data_dir, out_dir, prep_dir):
            os.makedirs(d, exist_ok=True)

        # actions.txt + hand-eye calib: straight 5mm/frame push (robot mm)
        lines = [
            json.dumps({
                "joint_angles": [0.0] * 7,
                "pose": [100.0 + 5.0 * t, 50.0, 30.0, 180.0, 0.0, 90.0],
            })
            for t in range(N_FRAMES)
        ]
        (data_dir / "actions.txt").write_text("\n".join(lines) + "\n")
        calib = {"R_base2world": np.eye(3), "t_base2world": np.zeros(3)}
        with open(data_dir / "calibration_handeye_result.pkl", "wb") as f:
            pickle.dump(calib, f)

        meta = {
            "w": 64, "h": 48,
            "k": [[[[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]]] * 2] * N_FRAMES,
            "w2c": [[np.eye(4).tolist()] * 2] * N_FRAMES,
            "fn": [[f"camera_0/color_{t:06d}.jpg",
                    f"camera_1/color_{t:06d}.jpg"] for t in range(N_FRAMES)],
        }
        with open(out_dir / "metadata.json", "w") as f:
            json.dump(meta, f)

        base_pts = rng.uniform(-0.1, 0.1, size=(N_DOWN, 3)).astype(np.float32)
        xyz = np.stack(
            [base_pts + np.array([0.005 * t, 0, 0], np.float32)
             for t in range(N_FRAMES)]
        )
        np.save(out_dir / "param_downsampled.npy", xyz)

        pairs = np.array(
            [[t, t + 1, t + 2, t + 3] for t in range(N_FRAMES - 3)], np.int64
        )
        np.savetxt(prep_dir / f"{idx}.txt", pairs, fmt="%d")

    cfg = {
        "train_config": {
            "out_dir": str(tmp_path / "log"),
            "batch_size": 2,
            "n_epochs": 2,
            "n_iters_per_epoch": {"train": 2, "valid": 1},
            "log_interval": 1,
            "random_seed": 0,
            "n_his": 2,
            "n_future": 2,
            "mse_loss": 1.0,
            "length_loss": 0.1,
        },
        "model_config": {
            "nf_particle": 16, "nf_relation": 16, "nf_effect": 16,
            "attr_dim": 2, "state_dim": 0, "action_dim": 3, "pstep": 2,
            "rel_attr_dim": 2, "rel_group_dim": 1, "rel_distance_dim": 3,
        },
        "dataset_config": {
            "datasets": [{
                "name": NAME,
                "base_dir": str(base),
                "fps_radius_range": [0.03, 0.03],
                "adj_radius_range": [0.1, 0.1],
                "state_noise": {"train": 0.003, "valid": 0.0},
                "topk": 3,
                "max_nobj": 20,
                "max_tool": 1,
                "max_nR": 80,
            }],
        },
    }
    import yaml

    cfg_path = tmp_path / "toy.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    return str(cfg_path), str(tmp_path / "log")


def test_train_cli_main(train_tree):
    from gsdx.apps.train import main

    cfg_path, out_dir = train_tree
    main(["--config", cfg_path])

    ckpts = os.path.join(out_dir, "checkpoints")
    for name in ("model_1.ckpt", "model_2.ckpt", "latest.ckpt",
                 "latest_optim.ckpt"):
        assert os.path.exists(os.path.join(ckpts, name)), name
    assert os.path.exists(os.path.join(out_dir, "loss.png"))

    # checkpoints round-trip through the loader used by predict/plan
    import jax

    from gsdx.dynamics.model import DynamicsPredictor
    from gsdx.dynamics.train import init_params
    from gsdx.io.checkpoint import load_checkpoint
    from gsdx.io.config import load_config

    train_cfg, model_cfg, data_cfg = load_config(cfg_path)
    target = init_params(
        DynamicsPredictor(model_cfg), train_cfg, data_cfg, jax.random.PRNGKey(0)
    )
    params = load_checkpoint(os.path.join(ckpts, "latest.ckpt"), target)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(params))


@pytest.mark.slow
def test_train_cli_dp(train_tree):
    """--dp path: data-parallel over the virtual 8-device CPU mesh.
    Slow-marked (fast-tier budget): the DP step math itself is fast-tier
    covered by tests/test_dist.py::test_dp_train_step_matches_single_device."""
    from gsdx.apps.train import main

    cfg_path, out_dir = train_tree
    import yaml

    raw = yaml.safe_load(open(cfg_path))
    raw["train_config"]["out_dir"] = out_dir + "_dp"
    raw["train_config"]["n_epochs"] = 1
    raw["train_config"]["batch_size"] = 8  # divisible by mesh size
    cfg_dp = cfg_path.replace(".yaml", "_dp.yaml")
    with open(cfg_dp, "w") as f:
        yaml.safe_dump(raw, f)
    main(["--config", cfg_dp, "--dp"])
    assert os.path.exists(
        os.path.join(out_dir + "_dp", "checkpoints", "latest.ckpt"))
