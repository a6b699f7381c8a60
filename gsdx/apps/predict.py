"""Rollout + render evaluation CLI (reference `src/predict.py:19-195`).

Loads a trained GNN checkpoint and a tracked episode, rolls the dynamics
forward under the recorded end-effector trajectory, skins the Gaussians, and
renders per-camera videos.

Usage:
  python -m gsdx.apps.predict --config configs/rope.yaml --episode <dir> \
      --params <params.npz dir> --out out/predict [--epoch latest]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def collect_scene_data(params_path: str, data_dir: str, output_dir: str,
                       model_cfg, train_cfg, data_cfg, gnn_params,
                       max_steps: int = 1000):
    """Rollout a tracked episode (`DynamicsModule.collect_scene_data`,
    `src/render/dynamics_module.py:174-257`). Returns per-frame rendervars."""
    import jax.numpy as jnp

    from gsdx.core.pointcloud import iterative_statistical_outliers
    from gsdx.core.transforms import quat_normalize
    from gsdx.io.episodes import eef_world_positions, load_metadata
    from gsdx.rollout.dynamics_module import (
        DynamicsModule,
        RolloutConfig,
        smooth_trajectory,
    )

    params = dict(np.load(params_path))
    xyz_0 = params["means3D"][0]
    rgb_0 = params["rgb_colors"][0]
    quat_0 = np.asarray(
        quat_normalize(jnp.asarray(params["unnorm_rotations"][0]))
    )
    opa_0 = 1.0 / (1.0 + np.exp(-params["logit_opacities"]))
    scales_0 = np.exp(params["log_scales"])

    low = opa_0[:, 0] < 0.1  # `dynamics_module.py:186`
    xyz_0, rgb_0, quat_0 = xyz_0[~low], rgb_0[~low], quat_0[~low]
    opa_0, scales_0 = opa_0[~low], scales_0[~low]

    inlier_idx = iterative_statistical_outliers(xyz_0, nb_neighbors=50)

    meta = load_metadata(os.path.join(output_dir, "metadata.json"))
    eef_xyz = eef_world_positions(data_dir, meta)
    n_steps = min(len(eef_xyz), max_steps)

    cfg = RolloutConfig(
        n_his=train_cfg.n_his,
        dist_thresh=train_cfg.dist_thresh,
        max_nobj=data_cfg.max_nobj,
        fps_radius=sum(data_cfg.fps_radius_range) / 2,
        adj_thresh=sum(data_cfg.adj_radius_range) / 2,
        topk=data_cfg.topk,
        connect_all=data_cfg.connect_all,
        max_nR=data_cfg.max_nR,
    )
    dm = DynamicsModule(model_cfg, gnn_params, cfg)
    traj = dm.rollout(jnp.asarray(xyz_0), jnp.asarray(quat_0), eef_xyz,
                      n_steps, inlier_idx=inlier_idx)
    traj = smooth_trajectory(traj)

    scene_data = []
    for t in range(n_steps):
        scene_data.append({
            "means3D": traj["xyz"][t],
            "colors_precomp": rgb_0,
            "rotations": traj["quat"][t],
            "opacities": opa_0,
            "scales": scales_0,
        })
    vis = [{"kp": traj["xyz_bones"][t], "tool_kp": traj["eef"][t]}
           for t in range(n_steps)]
    return scene_data, vis, meta


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--episode", required=True, help="raw episode data dir")
    p.add_argument("--params", required=True,
                   help="tracking output dir containing params.npz + metadata.json")
    p.add_argument("--out", default="out/predict")
    p.add_argument("--epoch", default="latest")
    p.add_argument("--cameras", type=int, default=4)
    p.add_argument("--max_steps", type=int, default=1000)
    p.add_argument("--overlay", action="store_true",
                   help="draw keypoint trails + alpha-mask pass like the "
                        "reference predict.py")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gsdx.dynamics.model import DynamicsPredictor
    from gsdx.dynamics.train import init_params
    from gsdx.io.checkpoint import load_checkpoint
    from gsdx.io.config import load_config
    from gsdx.io.video import chw_to_hwc, write_video
    from gsdx.render.renderer import Renderer

    train_cfg, model_cfg, data_cfg = load_config(args.config)
    model = DynamicsPredictor(model_cfg)
    target = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))
    ckpt_name = ("latest.ckpt" if args.epoch == "latest"
                 else f"model_{args.epoch}.ckpt")
    gnn_params = load_checkpoint(
        os.path.join(train_cfg.out_dir, "checkpoints", ckpt_name), target
    )

    scene_data, vis, meta = collect_scene_data(
        os.path.join(args.params, "params.npz"), args.episode, args.params,
        model_cfg, train_cfg, data_cfg, gnn_params, max_steps=args.max_steps,
    )

    renderer = Renderer(width=meta["w"], height=meta["h"])
    os.makedirs(args.out, exist_ok=True)
    w2c = np.asarray(meta["w2c"][0], np.float32)
    k = np.asarray(meta["k"][0], np.float32)
    for c in range(min(args.cameras, w2c.shape[0])):
        frames = []
        trail = None
        if args.overlay:
            from gsdx.utils.viz import TrailVisualizer, project_points

            trail = TrailVisualizer()
        for t, sd in enumerate(scene_data):
            sd_j = {kk: jnp.asarray(v) for kk, v in sd.items()}
            im, _ = renderer.render(w2c[c], k[c], sd_j)
            frame = chw_to_hwc(im)
            if args.overlay:
                # alpha pass: all-ones colors -> coverage mask
                # (`src/predict.py:118-126`)
                ones = dict(sd_j)
                ones["colors_precomp"] = jnp.ones_like(sd_j["colors_precomp"])
                alpha_im, _ = renderer.render(w2c[c], k[c], ones, bg=(0, 0, 0))
                alpha = np.asarray(alpha_im)[0][..., None]
                frame = frame * alpha + 0.7 * (1 - alpha)
                # end-effector trail (`predict.py:128-140`)
                eef_px = project_points(vis[t]["tool_kp"].reshape(-1, 3),
                                        k[c], w2c[c])
                frame = trail.draw(
                    (np.clip(frame, 0, 1) * 255).astype(np.uint8), eef_px
                ).astype(np.float32) / 255.0
            frames.append(frame)
        path = write_video(os.path.join(args.out, f"camera_{c}.mp4"), frames)
        print(f"wrote {path} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
