"""Closed-loop MPPI planning CLI (reference `src/real_world/plan.py:204-469`).

Runs perceive -> plan -> execute for n_interactions, logging chamfer
distance to the target cloud. Works against the fake simulated environment
(`--env fake`, robotless — the backend the reference lacks) or real hardware
(`--env real`, requires camera/robot SDKs). Resumable via saved
interaction npz files (`plan.py:339-347`).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def get_state_cur(env, pm, max_nobj: int, fps_radius: float,
                  prompt: str = "object"):
    """Perceive the current object keypoint state (`get_state_cur`,
    `plan_utils.py:367-397`): fused cloud -> FPS -> radius-FPS."""
    import jax.numpy as jnp

    from gsdx.kernels.fps import farthest_point_sampling, fps_rad_idx

    pts, cols = pm.get_tabletop_points_env(env, prompt=prompt)
    if len(pts) == 0:
        raise RuntimeError("perception returned no points")
    fps1 = farthest_point_sampling(
        jnp.asarray(pts), min(max_nobj, len(pts)), start_idx=0
    )
    down = jnp.asarray(pts)[fps1]
    idx2, keep = fps_rad_idx(down, fps_radius,
                             max_samples=min(max_nobj, len(pts)))
    state = np.asarray(down[idx2])[np.asarray(keep)]
    return state, pts


def chamfer_np(x, y):
    d = np.linalg.norm(x[:, None] - y[None], axis=-1)
    return d.min(1).mean() + d.min(0).mean()


def make_real_env(cameras: str, robot_ip: str, calibration: str | None,
                  capture_fps: float = 15.0):
    """Compose RealEnv(MultiCamera, arm) for the closed loop
    (`src/real_world/plan.py:218-235`).

    cameras: "synthetic" / "synthetic:N" (test sources), or comma-separated
    RealSense serial numbers. robot_ip: "fake" or an xArm7 IP. A missing
    calibration is an error with a real robot (world<->base transforms would
    be garbage); with a fake arm it falls back to identity extrinsics.
    """
    from gsdx.realworld.cameras import RealSenseSource, SyntheticSource
    from gsdx.realworld.real_env import RealEnv
    from gsdx.realworld.robot import FakeArm, XArm7

    if cameras.startswith("synthetic"):
        n = int(cameras.split(":")[1]) if ":" in cameras else 4
        sources = [SyntheticSource(seed=i) for i in range(n)]
    else:
        sources = [RealSenseSource(s.strip()) for s in cameras.split(",")]
    real_arm = robot_ip not in ("fake", "", None)
    arm = XArm7(robot_ip) if real_arm else FakeArm()
    env = RealEnv(sources, arm=arm, capture_fps=capture_fps,
                  calibration_path=calibration)
    if not env.R_cam2world:
        if real_arm:
            raise RuntimeError(
                "real robot requires --calibration (run gsdx.apps.calibrate)")
        env.R_cam2world = [np.eye(3) for _ in sources]
        env.t_cam2world = [np.zeros(3) for _ in sources]
    return env


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--epoch", default="latest")
    p.add_argument("--env", default="fake", choices=["fake", "real"])
    p.add_argument("--target", default=None,
                   help="target point cloud .npy; default: shifted initial")
    p.add_argument("--n_actions", type=int, default=10)
    p.add_argument("--n_chunks", type=int, default=10)
    p.add_argument("--n_sample", type=int, default=1000)
    p.add_argument("--out", default="out/plan")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=43)
    p.add_argument("--cameras", default="synthetic:4",
                   help="'synthetic[:N]' or comma-separated RealSense serials")
    p.add_argument("--robot_ip", default="fake",
                   help="'fake' or the xArm7 IP address")
    p.add_argument("--calibration", default=None,
                   help="calibration pickle (cam/base -> world transforms)")
    p.add_argument("--prompt", default="object",
                   help="perception text prompt (grounded-SAM when available)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gsdx.dynamics.model import DynamicsPredictor
    from gsdx.dynamics.train import init_params
    from gsdx.io.checkpoint import load_checkpoint
    from gsdx.io.config import load_config
    from gsdx.plan.cost import running_cost
    from gsdx.plan.dynamics_rollout import RolloutSpec, make_batched_rollout
    from gsdx.plan.planner import MPPIConfig, Planner
    from gsdx.realworld.env import WORKSPACE_BBOX, FakeEnv
    from gsdx.realworld.perception import PerceptionModule

    train_cfg, model_cfg, data_cfg = load_config(args.config)
    model = DynamicsPredictor(model_cfg)
    target_tree = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))
    ckpt = ("latest.ckpt" if args.epoch == "latest"
            else f"model_{args.epoch}.ckpt")
    gnn_params = load_checkpoint(
        os.path.join(train_cfg.out_dir, "checkpoints", ckpt), target_tree
    )

    if args.env == "fake":
        rng = np.random.default_rng(args.seed)
        pts = rng.normal(scale=0.03, size=(400, 3)).astype(np.float32)
        pts += np.array([0.3, 0.0, 0.0], np.float32)
        cols = np.tile(np.array([0.9, 0.2, 0.1], np.float32), (400, 1))
        env = FakeEnv(pts, cols)
    else:
        env = make_real_env(args.cameras, args.robot_ip, args.calibration)
    env.start()
    from gsdx.realworld.segmentation import make_segmenter

    pm = PerceptionModule(segmenter=make_segmenter())

    fps_radius = sum(data_cfg.fps_radius_range) / 2
    adj_thresh = sum(data_cfg.adj_radius_range) / 2

    state_cur, full_pts = get_state_cur(env, pm, data_cfg.max_nobj,
                                        fps_radius, args.prompt)
    if args.target:
        target_state = np.load(args.target).astype(np.float32)
    else:
        target_state = full_pts + np.array([0.08, -0.05, 0.0], np.float32)

    n_obj = state_cur.shape[0]
    spec = RolloutSpec(
        n_his=train_cfg.n_his, max_nobj=n_obj, max_nR=data_cfg.max_nR,
        topk=data_cfg.topk, adj_thresh=adj_thresh,
        connect_all=data_cfg.connect_all,
    )
    rollout_raw = make_batched_rollout(model, spec)
    bbox = jnp.asarray(WORKSPACE_BBOX)
    tgt = jnp.asarray(target_state)

    def model_rollout(state, acts, needs_grad=False):
        return rollout_raw(gnn_params, state, acts, needs_grad=needs_grad)

    def evaluate(state_seqs, act_seqs, state_cur):
        return running_cost(state_seqs, act_seqs, state_cur, tgt, bbox)

    mppi = MPPIConfig(n_sample=args.n_sample)
    planner = Planner(mppi, model_rollout, evaluate)

    os.makedirs(args.out, exist_ok=True)
    start_i = 0
    if args.resume:
        done = sorted(glob.glob(os.path.join(args.out, "interaction_*.npz")))
        start_i = len(done)

    key = jax.random.PRNGKey(args.seed)
    init_act = jnp.zeros((mppi.n_look_ahead, 4)).at[:, 3].set(10.0)
    chamfers = []
    for i in range(start_i, args.n_actions):
        state_cur, full_pts = get_state_cur(env, pm, data_cfg.max_nobj,
                                            fps_radius, args.prompt)
        cd_before = chamfer_np(full_pts, target_state)
        # pad perceived state to the planner's n_obj
        sc = np.zeros((n_obj, 3), np.float32)
        sc[: min(len(state_cur), n_obj)] = state_cur[:n_obj]
        key, sub = jax.random.split(key)
        res = planner.plan_chunked(sub, jnp.asarray(sc), init_act,
                                   n_chunks=args.n_chunks)
        act = np.asarray(res["act_seq"])[0]  # (4,) x, y, theta, length
        x0, y0, theta, length = act
        x1 = x0 - 0.01 * length * np.cos(theta)
        y1 = y0 - 0.01 * length * np.sin(theta)
        env.step(np.array([x0, y0, x1, y1]))

        _, full_after = get_state_cur(env, pm, data_cfg.max_nobj,
                                      fps_radius, args.prompt)
        cd_after = chamfer_np(full_after, target_state)
        chamfers.append(cd_after)
        np.savez(os.path.join(args.out, f"interaction_{i}.npz"),
                 action=act, state=sc, chamfer_before=cd_before,
                 chamfer_after=cd_after, reward=float(res["best_reward"]))
        print(f"interaction {i}: chamfer {cd_before:.4f} -> {cd_after:.4f} "
              f"(reward {float(res['best_reward']):.4f})")
    env.stop()
    with open(os.path.join(args.out, "stats.txt"), "w") as f:
        f.write(f"final chamfer: {chamfers[-1] if chamfers else 'n/a'}\n")


if __name__ == "__main__":
    main()
