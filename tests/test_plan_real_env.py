"""Closed-loop planning through the REAL-env code path on fakes.

Drives `gsdx.apps.plan.main --env real` end-to-end with StaticImageSource
cameras (camera processes + shared-memory ring buffers) and a FakeArm, so
the exact composition used on hardware — RealEnv obs alignment, perception,
MPPI, and the hover->push->lift choreography of `RealEnv.step`
(`src/real_world/utils/real_env.py:211-232`) — is exercised in CI."""

import os

import numpy as np
import pytest
import yaml

TINY_CFG = {
    "train_config": {
        "out_dir": None,  # filled per-test
        "batch_size": 2,
        "n_epochs": 1,
        "n_iters_per_epoch": {"train": 1, "valid": 1},
        "log_interval": 1,
        "random_seed": 0,
        "dist_thresh": 0.01,
        "n_his": 2,
        "n_future": 2,
        "mse_loss": 1.0,
        "length_loss": 0.1,
    },
    "model_config": {
        "nf_particle": 16,
        "nf_relation": 16,
        "nf_effect": 16,
        "attr_dim": 2,
        "state_dim": 0,
        "action_dim": 3,
        "pstep": 1,
        "rel_attr_dim": 2,
        "rel_group_dim": 1,
        "rel_distance_dim": 3,
    },
    "dataset_config": {
        "datasets": [{
            "name": "t",
            "materials": ["rope"],
            "connect_all": False,
            "base_dir": "unused",
            "fps_radius_range": [0.03, 0.03],
            "adj_radius_range": [0.08, 0.08],
            "state_noise": {"train": 0.0, "valid": 0.0},
            "topk": 3,
            "max_n": 1,
            "max_nobj": 24,
            "max_tool": 1,
            "max_nR": 120,
        }],
    },
}


@pytest.fixture
def tiny_ckpt(tmp_path):
    """Config YAML + randomly initialized GNN checkpoint on disk."""
    import jax

    from gsdx.dynamics.model import DynamicsPredictor
    from gsdx.dynamics.train import init_params
    from gsdx.io.checkpoint import save_checkpoint
    from gsdx.io.config import load_config

    cfg = dict(TINY_CFG)
    cfg["train_config"] = dict(cfg["train_config"], out_dir=str(tmp_path))
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    train_cfg, model_cfg, data_cfg = load_config(str(cfg_path))
    model = DynamicsPredictor(model_cfg)
    params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))
    os.makedirs(tmp_path / "checkpoints", exist_ok=True)
    save_checkpoint(str(tmp_path / "checkpoints" / "latest.ckpt"), params)
    return str(cfg_path)


def _object_scene_sources(n_cameras=2, w=96, h=72):
    """StaticImageSource views of a red patch on the gray table background.

    Cameras look straight down from 1 m; with R = diag(1,-1,-1) and
    t = (0.3, 0.05, 1.0), cam-frame (x, y, 1) maps to world
    (0.3+x, 0.05-y, 0), i.e. into the planner workspace bbox.
    """
    from gsdx.realworld.cameras import StaticImageSource

    color = np.full((h, w, 3), int(0.7 * 255), np.uint8)
    color[h // 2 - 8:h // 2 + 8, w // 2 - 10:w // 2 + 10] = (220, 40, 30)
    depth = np.full((h, w), 1000, np.uint16)  # 1 m plane
    sources = [StaticImageSource(color, depth) for _ in range(n_cameras)]
    R = np.diag([1.0, -1.0, -1.0])
    t = np.array([0.3, 0.05, 1.0])
    return sources, [R] * n_cameras, [t] * n_cameras


@pytest.mark.slow  # heavyweight CLI e2e (planner covered by tests/test_plan.py)
def test_plan_cli_real_env_end_to_end(tiny_ckpt, tmp_path, monkeypatch):
    """`--env real` with synthetic cameras + FakeArm: >= 2 interactions run
    through RealEnv.step; interaction logs + stats are written."""
    from gsdx.apps import plan as plan_app

    sources, R_list, t_list = _object_scene_sources()

    real_calls = []
    orig_make = plan_app.make_real_env

    def patched_make(cameras, robot_ip, calibration, capture_fps=15.0):
        env = orig_make(cameras, robot_ip, calibration,
                        capture_fps=capture_fps)
        env.R_cam2world = list(R_list)
        env.t_cam2world = list(t_list)
        orig_step = env.step

        def counting_step(action, decoded=True):
            real_calls.append(np.asarray(action))
            return orig_step(action, decoded=decoded)

        env.step = counting_step
        return env

    # swap the synthetic moving-square source for the static object scene
    import gsdx.realworld.cameras as cams

    monkeypatch.setattr(cams, "SyntheticSource",
                        lambda seed=0, **kw: sources[seed % len(sources)])
    monkeypatch.setattr(plan_app, "make_real_env", patched_make)

    out = tmp_path / "out"
    plan_app.main([
        "--config", tiny_ckpt, "--env", "real", "--cameras", "synthetic:2",
        "--robot_ip", "fake", "--out", str(out), "--n_actions", "2",
        "--n_chunks", "1", "--n_sample", "16", "--seed", "1",
    ])

    assert len(real_calls) == 2  # both interactions executed on RealEnv
    for a in real_calls:
        assert a.shape == (4,) and np.isfinite(a).all()
    assert (out / "interaction_0.npz").exists()
    assert (out / "interaction_1.npz").exists()
    assert (out / "stats.txt").exists()
    rec = np.load(out / "interaction_0.npz")
    assert np.isfinite(rec["chamfer_before"]) and np.isfinite(rec["state"]).all()


def test_make_real_env_requires_calibration_with_real_robot(monkeypatch):
    from gsdx.apps.plan import make_real_env
    from gsdx.realworld import robot as robot_mod

    class DummyArm(robot_mod.FakeArm):
        def __init__(self, ip):
            super().__init__()

    monkeypatch.setattr(robot_mod, "XArm7", DummyArm)
    import gsdx.apps.plan as plan_app

    monkeypatch.setattr(plan_app, "make_real_env", make_real_env)
    with pytest.raises(RuntimeError, match="calibration"):
        make_real_env("synthetic:1", "10.0.0.1", None)
