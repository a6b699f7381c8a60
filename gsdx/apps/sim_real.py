"""Headless perceive -> GS fit -> rollout -> act smoke loop.

Re-implements `src/real_world/gs_sim_real.py:14-92`: n_trials iterations of
perception, online Gaussian fitting, a fixed-action GNN rollout, and action
execution — the reference's de-facto integration test, here runnable
robotless on the fake environment.

Usage: python -m gsdx.apps.sim_real --config configs/rope.yaml [--trials 3]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--epoch", default="latest")
    p.add_argument("--trials", type=int, default=3)
    p.add_argument("--gs_iters", type=int, default=2000)
    p.add_argument("--out", default="out/sim_real")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from gsdx.apps.demo import DemoSession
    from gsdx.realworld.env import FakeEnv
    from gsdx.realworld.perception import PerceptionModule

    rng = np.random.default_rng(args.seed)
    pts = rng.normal(scale=0.04, size=(400, 3)).astype(np.float32)
    pts += np.array([0.3, 0.05, 0.0], np.float32)
    cols = np.tile(np.array([0.85, 0.3, 0.15], np.float32), (400, 1))
    env = FakeEnv(pts, cols)
    env.start()
    pm = PerceptionModule()

    session = DemoSession(args.config, args.epoch, assets=None,
                          out_dir=args.out, gs_iters=args.gs_iters,
                          seed=args.seed)

    for trial in range(args.trials):
        print(f"--- trial {trial} ---")
        # perceive
        fused, fused_cols = pm.get_tabletop_points_env(env)
        print(f"perceived {len(fused)} points")
        obs = env.get_obs(get_color=True)
        masks = [
            (np.abs(obs["color"][c].astype(np.float32) - 255 * 0.7).max(-1)
             > 30).astype(np.float32)
            for c in range(env.n_fixed_cameras)
        ]
        imgs = [obs["color"][c].astype(np.float32) / 255.0 * masks[c][..., None]
                for c in range(env.n_fixed_cameras)]
        R_list, t_list = env.get_extrinsics()
        session.gs.update_state(fused, fused_cols, imgs, masks, R_list, t_list,
                                env.get_intrinsics())
        session.gs.train(progress=True)
        live = np.asarray(session.gs.params.live) > 0
        session.particle_pos = np.asarray(session.gs.params.means3d)[live]
        session.mean_z = float(session.particle_pos[:, 2].mean())

        # fixed push through the object center (gs_sim_real.py:72-74)
        center = session.particle_pos.mean(0)
        start = center + np.array([-0.08, 0.0, 0.0])
        end = center + np.array([0.04, 0.0, 0.0])
        start[2] = end[2] = session.mean_z

        action = np.stack([start, end])
        rendervars, _ = session.gs.rollout_and_render(session.dm, action)
        session.render_rollout(rendervars, cam_id=0)

        # execute for real (here: the simulated env)
        env.step(np.array([start[0], start[1], end[0], end[1]]))
        print(f"executed push {start[:2]} -> {end[:2]}")

    env.stop()
    print("sim_real loop done")


if __name__ == "__main__":
    main()
