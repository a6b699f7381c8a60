"""Dynamic-GS tracking CLI (reference `src/tracking/train_gs.py:48-83`).

Usage:
  python -m gsdx.apps.track --sequence data/<seq> --exp_name exp \
      [--metadata_path train_meta.json] [--init_pt_cld_path init_pt_cld.npz]

Fixes the reference CLI's packed-dict/flat-signature arity bug
(SURVEY.md §7.5) by taking individual weight flags.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def compute_scene_radius(w2c_stack: np.ndarray) -> float:
    """1.1x the max camera distance from the camera centroid
    (`initialize_params`, `src/tracking/train_utils.py:141-145`)."""
    cam_centers = np.linalg.inv(w2c_stack)[:, :3, 3]
    return float(
        1.1 * np.max(
            np.linalg.norm(cam_centers - cam_centers.mean(0, keepdims=True),
                           axis=-1)
        )
    )


def main(argv=None):
    p = argparse.ArgumentParser(description="Dynamic 3D Gaussian tracking")
    p.add_argument("--sequence", required=True, help="episode directory")
    p.add_argument("--exp_name", required=True)
    p.add_argument("--output_dir", default="output")
    p.add_argument("--metadata_path", default="train_meta.json")
    p.add_argument("--init_pt_cld_path", default="init_pt_cld.npz")
    p.add_argument("--weight_im", type=float, default=50.0)
    p.add_argument("--weight_seg", type=float, default=200.0)
    p.add_argument("--weight_rigid", type=float, default=200.0)
    p.add_argument("--weight_bg", type=float, default=200.0)
    p.add_argument("--weight_iso", type=float, default=1000.0)
    p.add_argument("--weight_rot", type=float, default=4.0)
    p.add_argument("--weight_soft_col_cons", type=float, default=0.01)
    p.add_argument("--remove_threshold", type=float, default=0.005)
    p.add_argument("--remove_thresh_5k", type=float, default=0.25)
    p.add_argument("--num_knn", type=int, default=20)
    p.add_argument("--scale_scene_radius", type=float, default=0.05)
    p.add_argument("--iters_first", type=int, default=10000)
    p.add_argument("--iters_rest", type=int, default=2000)
    p.add_argument("--num_timesteps", type=int, default=-1,
                   help="limit timesteps (-1: all)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from gsdx.core.cameras import make_camera
    from gsdx.core.gaussians import init_gaussian_params
    from gsdx.io.episodes import load_episode_images, load_metadata, save_params
    from gsdx.kernels.knn import knn
    from gsdx.render.rasterize import RasterizeConfig
    from gsdx.track.densify import DensifyConfig
    from gsdx.track.losses import LossWeights
    from gsdx.track.trainer import TrackingConfig, track_sequence

    seq = args.sequence
    md = load_metadata(os.path.join(seq, args.metadata_path))
    num_timesteps = len(md["fn"])
    if args.num_timesteps > 0:
        num_timesteps = min(num_timesteps, args.num_timesteps)

    init_pt_cld = np.load(os.path.join(seq, args.init_pt_cld_path))["data"]
    sq_dist, _ = knn(jnp.asarray(init_pt_cld[:, :3]), 3)
    mean3 = np.asarray(sq_dist).mean(-1)
    params = init_gaussian_params(init_pt_cld, mean3)

    w2c0 = np.asarray(md["w2c"][0], np.float32)
    k0 = np.asarray(md["k"][0], np.float32)
    scene_radius = compute_scene_radius(w2c0)
    cams = [
        make_camera(k0[c], w2c0[c], width=md["w"], height=md["h"],
                    near=1.0, far=100.0, bg=(0, 0, 0), cam_id=c)
        for c in range(w2c0.shape[0])
    ]
    cams = jax.tree.map(lambda *x: jnp.stack(x), *cams)

    def ims_fn(t):
        ims, _ = load_episode_images(seq, md, t)
        return jnp.asarray(ims)

    def segs_fn(t):
        _, segs = load_episode_images(seq, md, t)
        return jnp.asarray(segs)

    cfg = TrackingConfig(
        iters_first=args.iters_first,
        iters_rest=args.iters_rest,
        num_knn=args.num_knn,
        weights=LossWeights(
            im=args.weight_im, seg=args.weight_seg, rigid=args.weight_rigid,
            bg=args.weight_bg, iso=args.weight_iso, rot=args.weight_rot,
            soft_col_cons=args.weight_soft_col_cons,
        ),
        densify=DensifyConfig(
            remove_thresh=args.remove_threshold,
            remove_thresh_5k=args.remove_thresh_5k,
            scale_scene_radius=args.scale_scene_radius,
        ),
        raster=RasterizeConfig(),
        seed=args.seed,
    )

    output_params = track_sequence(
        params, cams, ims_fn, segs_fn, num_timesteps, cfg,
        scene_radius=scene_radius, progress=True,
    )
    out_dir = os.path.join(args.output_dir, args.exp_name,
                           os.path.basename(seq.rstrip("/")))
    save_params(output_params, os.path.join(out_dir, "params.npz"))
    print(f"saved {out_dir}/params.npz ({num_timesteps} timesteps)")


if __name__ == "__main__":
    main()
