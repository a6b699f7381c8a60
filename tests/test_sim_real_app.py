"""Sim-real interactive app e2e on FakeEnv (VERDICT r1 missing #4).

Headless drive of the full reference flow (`gs_sim_real_gradio.py:98-787`):
perceive -> online GS fit -> click-push -> GNN rollout video -> run real
(env.step + re-perceive) -> save_for_demo asset capture — then verifies the
captured bundle is loadable by the OFFLINE demo (`src/demo.py:124-160`
asset contract), closing the sim-real -> demo loop.
"""

import glob
import os

import numpy as np
import pytest

from test_demo_e2e import TINY_CFG


pytestmark = pytest.mark.slow  # heavyweight e2e (default tier excludes; --runslow)


def _fake_env(seed=0):
    from gsdx.realworld.env import FakeEnv

    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, 200)
    pts = np.stack([0.25 + 0.25 * t, 0.05 + 0.1 * np.sin(4 * t),
                    np.full_like(t, 0.01)], 1).astype(np.float32)
    pts += rng.normal(scale=0.004, size=pts.shape).astype(np.float32)
    cols = np.tile(np.array([0.85, 0.3, 0.15], np.float32), (200, 1))
    return FakeEnv(pts, cols)


def test_sim_real_session_end_to_end(tmp_path):
    from gsdx.apps.sim_real_app import SimRealSession

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_CFG.format(out_dir=str(tmp_path / "log")))
    out = str(tmp_path / "out")
    save_dir = str(tmp_path / "demo_assets")

    env = _fake_env()
    env.start()
    try:
        session = SimRealSession(str(cfg_path), env, out_dir=out,
                                 gs_iters=12, save_dir=save_dir)
        session.reset(train_gs=True)
        assert session.particle_pos.shape[0] > 0
        assert session.obj_dir and os.path.isdir(session.obj_dir)

        # click a push across the object in camera 0
        action, rendervars, frames = session.run_sim((150, 120), (200, 125))
        assert action.shape == (2, 3) and len(frames) >= 2
        assert glob.glob(os.path.join(out, "sim_cam0.*"))  # mp4 or gif
        # per-view rollout videos + predicted splat captured for demo
        assert session.action_dir and os.path.isdir(session.action_dir)
        vids = glob.glob(os.path.join(session.action_dir, "video_*.*"))
        assert len(vids) == 4
        assert os.path.exists(os.path.join(session.action_dir,
                                           "gs_pred.splat"))

        # run real: executes on the env and re-perceives (fresh images; the
        # fitted scene is kept, matching the reference's train_gs=False)
        imgs_before = [im.copy() for im in session.imgs]
        assert session.run_real()
        assert session.particle_pos.shape[0] > 0
        # the fake env moved the object; the re-perceived views must differ
        assert any(not np.array_equal(a, b)
                   for a, b in zip(imgs_before, session.imgs))

        obj_dir = session.obj_dir
    finally:
        env.stop()

    # the captured bundle satisfies the offline demo's asset contract
    for f in ("pcd.ply", "R_list.npy", "t_list.npy", "intr_list.npy",
              "gs_orig.splat"):
        assert os.path.exists(os.path.join(obj_dir, f)), f
    for v in range(4):
        assert os.path.exists(os.path.join(obj_dir, f"img_{v}.png"))
        assert os.path.exists(os.path.join(obj_dir, f"mask_{v}.png"))

    from gsdx.apps.demo import DemoSession

    offline = DemoSession(str(cfg_path), assets=obj_dir,
                          out_dir=str(tmp_path / "offline"), gs_iters=2)
    offline.reset(train_gs=False)
    live = np.asarray(offline.gs.params.live) > 0
    assert live.sum() > 0
