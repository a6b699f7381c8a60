"""Online GS trainer for a single static scene + GNN-driven rollouts.

Re-implements `GSTrainer` (`src/real_world/gs/trainer.py:37-224`) — the
"live" twin of the offline tracking optimizer used by the demos and the real
robot loop: fit a Gaussian scene to one multi-view observation (t=0-style
optimization only, configurable densify grad threshold), then roll the
dynamics model under an action and re-render the predicted scene.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.core.cameras import make_camera
from gsdx.core.gaussians import (
    GaussianParams,
    init_gaussian_params,
    init_tracking_variables,
)
from gsdx.core.transforms import quat_normalize
from gsdx.kernels.knn import knn
from gsdx.render.rasterize import RasterizeConfig, rasterize
from gsdx.track.densify import DensifyConfig
from gsdx.track.losses import LossWeights
from gsdx.track.optimizer import GroupAdam, tracking_lrs
from gsdx.track.trainer import (
    TrackingConfig,
    camera_order,
    compact_params,
    make_fit_timestep,
)


class OnlineGSConfig(NamedTuple):
    """Mirrors `src/config/gs/default.yaml`."""

    weight_im: float = 1.0
    weight_seg: float = 3.0
    grad_thresh: float = 0.0002
    remove_threshold: float = 0.005
    remove_thresh_5k: float = 0.25
    scale_scene_radius: float = 0.05
    num_iters: int = 10000
    near: float = 0.01
    far: float = 100.0


def rt_to_w2c(R: np.ndarray, t: np.ndarray) -> np.ndarray:
    """(R, t) camera-to-world -> w2c (`Rt_to_w2c`, `gs/trainer.py:16-19`)."""
    c2w = np.concatenate(
        [np.concatenate([R, t.reshape(3, 1)], axis=1),
         np.array([[0, 0, 0, 1.0]])], axis=0
    )
    return np.linalg.inv(c2w).astype(np.float32)


class OnlineGSTrainer:
    """Fit-once Gaussian trainer over live observations."""

    def __init__(self, cfg: OnlineGSConfig = OnlineGSConfig(),
                 raster_cfg: RasterizeConfig = RasterizeConfig(), seed: int = 0):
        self.cfg = cfg
        self.raster_cfg = raster_cfg
        self.seed = seed
        self.clear()

    def clear(self, clear_params: bool = True):
        self.init_pt_cld = None
        self.metadata = None
        self.ims = None
        self.segs = None
        self.cams = None
        if clear_params:
            self.params: Optional[GaussianParams] = None

    def update_state(self, points, colors, img_list, seg_list, R_list, t_list,
                     intr_list):
        """Set the scene from a fused point cloud + per-camera images
        (`GSTrainer.update_state`, `gs/trainer.py:82-97`). seg = all ones
        (the whole cloud is foreground in the online setting)."""
        pts = np.asarray(points, np.float32)
        cols = np.asarray(colors, np.float32)
        seg = np.ones_like(pts[:, :1])
        self.init_pt_cld = np.concatenate([pts, cols, seg], axis=1)
        h, w = img_list[0].shape[:2]
        w2cs = [rt_to_w2c(np.asarray(R), np.asarray(t))
                for R, t in zip(R_list, t_list)]
        self.metadata = {"w": w, "h": h, "k": list(intr_list), "w2c": w2cs}
        cams = [
            make_camera(intr_list[c], w2cs[c], width=w, height=h,
                        near=self.cfg.near, far=self.cfg.far, bg=(0, 0, 0),
                        cam_id=c)
            for c in range(len(img_list))
        ]
        self.cams = jax.tree.map(lambda *x: jnp.stack(x), *cams)
        ims, segs = [], []
        for img, sg in zip(img_list, seg_list):
            ims.append(np.asarray(img, np.float32).transpose(2, 0, 1))
            sg = np.asarray(sg, np.float32)
            segs.append(np.stack([sg, np.zeros_like(sg), 1.0 - sg], axis=0))
        self.ims = jnp.asarray(np.stack(ims))
        self.segs = jnp.asarray(np.stack(segs))

    def update_state_env(self, points, colors, env, imgs, masks):
        """Populate from a live environment (`gs/trainer.py:62-71`)."""
        R_list, t_list = env.get_extrinsics()
        intr_list = env.get_intrinsics()
        img_list = [imgs[c] * masks[c][:, :, None] for c in range(len(imgs))]
        seg_list = [masks[c] * 1.0 for c in range(len(masks))]
        self.update_state(points, colors, img_list, seg_list, R_list, t_list,
                          intr_list)

    def init_params(self):
        """Unoptimized Gaussians straight from the fused point cloud —
        lets callers show/export a scene without fitting (e.g. loading
        saved assets with train_gs=False)."""
        sq_dist, _ = knn(jnp.asarray(self.init_pt_cld[:, :3]), 3)
        self.params = init_gaussian_params(
            self.init_pt_cld, np.asarray(sq_dist).mean(-1)
        )
        return self.params

    def train(self, progress: bool = False):
        """10k-iteration fit with densification (`GSTrainer.train`,
        `gs/trainer.py:98-123`)."""
        cfg = self.cfg
        params = self.init_params()
        w2c_stack = np.stack(self.metadata["w2c"])
        cam_centers = np.linalg.inv(w2c_stack)[:, :3, 3]
        scene_radius = float(1.1 * np.max(np.linalg.norm(
            cam_centers - cam_centers.mean(0, keepdims=True), axis=-1)))

        tcfg = TrackingConfig(
            iters_first=cfg.num_iters,
            weights=LossWeights(im=cfg.weight_im, seg=cfg.weight_seg),
            densify=DensifyConfig(
                grad_thresh=cfg.grad_thresh,
                remove_thresh=cfg.remove_threshold,
                remove_thresh_5k=cfg.remove_thresh_5k,
                scale_scene_radius=cfg.scale_scene_radius,
            ),
            raster=self.raster_cfg,
            seed=self.seed,
        )
        adam = GroupAdam()
        variables = init_tracking_variables(params.capacity, 20, scene_radius)
        opt_state = adam.init(params)
        lrs = tracking_lrs(scene_radius)
        fit = make_fit_timestep(tcfg, is_initial=True, num_iters=cfg.num_iters)
        order = camera_order(cfg.num_iters, self.ims.shape[0],
                             np.random.default_rng(self.seed))
        params, _, variables, logs = fit(
            params, opt_state, variables, lrs, self.cams, self.ims, self.segs,
            order, jax.random.PRNGKey(self.seed),
        )
        if progress:
            print(f"[online-gs] final psnr {float(logs['psnr'][-1]):.3f} "
                  f"pts {int(logs['num_pts'][-1])}")
        params, _ = compact_params(params, variables)
        self.params = params
        return logs

    def render(self, rendervar: dict, cam_id: int, bg=(0.7, 0.7, 0.7)):
        """Render a rendervar from a stored camera (`gs/trainer.py:53-60`)."""
        cam = jax.tree.map(
            lambda x: x[cam_id] if hasattr(x, "ndim") and x.ndim > 0 else x,
            self.cams,
        )
        cam = cam.replace(bg=jnp.asarray(bg, jnp.float32))
        out = rasterize(
            jnp.asarray(rendervar["means3D"]),
            jnp.asarray(rendervar["rotations"]),
            jnp.asarray(rendervar["scales"]),
            jnp.asarray(rendervar["opacities"]),
            jnp.asarray(rendervar["colors_precomp"]),
            cam, self.raster_cfg,
        )
        return out.im, out.depth

    def rollout_and_render(self, dm, action, remove_black: bool = False,
                           overwrite_params: bool = True,
                           dist_thresh: float = 0.005):
        """Roll the GNN under a straight push and skin/render the scene
        (`GSTrainer.rollout_and_render`, `gs/trainer.py:125-224`).

        action: (2, 3) [start, end] eef waypoints. Returns
        (rendervar_list, visvar_list).
        """
        assert self.params is not None
        p = self.params
        live = np.asarray(p.live) > 0
        xyz_0 = np.asarray(p.means3d)[live]
        rgb_0 = np.asarray(p.rgb_colors)[live]
        quat_0 = np.asarray(quat_normalize(p.unnorm_rotations))[live]
        opa_0 = np.asarray(jax.nn.sigmoid(p.logit_opacities))[live]
        scales_0 = np.exp(np.asarray(p.log_scales))[live]

        keep = opa_0[:, 0] >= 0.1
        if remove_black:
            keep &= rgb_0.sum(-1) >= 0.5
        xyz_0, rgb_0, quat_0 = xyz_0[keep], rgb_0[keep], quat_0[keep]
        opa_0, scales_0 = opa_0[keep], scales_0[keep]

        start = np.asarray(action[0], np.float32)
        end = np.asarray(action[1], np.float32)
        n_steps = max(int(np.linalg.norm(end - start) / dist_thresh), 2)
        ts = np.linspace(0, 1, n_steps)[:, None]
        eef = start[None] + (end - start)[None] * ts
        eef = np.concatenate([eef, np.tile(end[None], (dm.cfg.n_his, 1))])
        eef = eef[:, None]  # (n_steps, 1, 3)

        traj = dm.rollout(jnp.asarray(xyz_0), jnp.asarray(quat_0), eef,
                          eef.shape[0])
        from gsdx.rollout.dynamics_module import smooth_trajectory

        traj = smooth_trajectory(traj)
        xyz = traj["xyz"]
        # 3x binomial smoothing (`gs/trainer.py:185-187`)
        for _ in range(3):
            xyz[1:-1] = (xyz[:-2] + 2 * xyz[1:-1] + xyz[2:]) / 4.0
        quat = traj["quat"]
        quat = quat / np.maximum(
            np.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)

        rendervar_list, visvar_list = [], []
        for t in range(xyz.shape[0]):
            rendervar_list.append({
                "means3D": xyz[t],
                "colors_precomp": rgb_0,
                "rotations": quat[t],
                "opacities": opa_0,
                "scales": scales_0,
            })
            visvar_list.append({
                "xyz_bones": traj["xyz_bones"][t],
                "eef": traj["eef"][t],
            })

        if overwrite_params:
            n = xyz.shape[1]
            cld = np.concatenate(
                [xyz[-1], rgb_0, np.ones((n, 1), np.float32)], axis=1)
            new_params = init_gaussian_params(cld, np.exp(
                2 * np.log(np.maximum(scales_0.mean(-1), 1e-6))))
            new_params = new_params.replace(
                unnorm_rotations=new_params.unnorm_rotations.at[:n].set(
                    jnp.asarray(quat[-1])),
                logit_opacities=new_params.logit_opacities.at[:n].set(
                    jnp.asarray(np.log(opa_0 / np.maximum(1 - opa_0, 1e-6)))),
                log_scales=new_params.log_scales.at[:n].set(
                    jnp.asarray(np.log(np.maximum(scales_0, 1e-9)))),
            )
            self.params = new_params
        return rendervar_list, visvar_list
