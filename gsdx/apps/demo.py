"""Interactive dynamics demo (reference `src/demo.py:95-696`).

Fit a Gaussian scene from demo assets (or a synthetic scene), click/specify
a push start + target in a camera view, roll the GNN forward, and render the
predicted interaction as video. Runs as a gradio app when gradio is
installed; otherwise as a scripted CLI (`--clicks x1,y1,x2,y2`).

Usage:
  python -m gsdx.apps.demo --config configs/rope.yaml \
      [--assets <dir with pcd.ply, img_i.png, mask_i.png, R/t/intr .npy>] \
      [--clicks 320,240,420,260] [--out out/demo]
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def click_to_xyz(click_x, click_y, intr, extr, z=-0.01):
    """Pixel click -> 3D point on the z plane (`src/demo.py:66-85`):
    intersect the camera ray through the pixel with the horizontal plane."""
    inv_extr = np.linalg.inv(extr)
    p1 = np.array([0.0, 0.0, 0.0, 1.0]) @ inv_extr.T
    fx, fy = intr[0, 0], intr[1, 1]
    cx, cy = intr[0, 2], intr[1, 2]
    p2 = np.array([(click_x - cx) / fx, (click_y - cy) / fy, 1.0, 1.0]) @ inv_extr.T
    ratio = (z - p1[2]) / (p2[2] - p1[2])
    return (p1 + ratio * (p2 - p1))[:3]


class DemoSession:
    """Gradio-independent demo core (`DemoVisualizer`, `src/demo.py:95-586`)."""

    def __init__(self, config_path: str, epoch: str = "latest",
                 assets: str | None = None, out_dir: str = "out/demo",
                 gs_iters: int | None = None, seed: int = 0):
        import jax

        from gsdx.dynamics.model import DynamicsPredictor
        from gsdx.dynamics.train import init_params
        from gsdx.io.checkpoint import load_checkpoint
        from gsdx.io.config import load_config
        from gsdx.rollout.dynamics_module import DynamicsModule, RolloutConfig
        from gsdx.track.online import OnlineGSConfig, OnlineGSTrainer

        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)
        train_cfg, model_cfg, data_cfg = load_config(config_path)
        self.train_cfg, self.model_cfg, self.data_cfg = (
            train_cfg, model_cfg, data_cfg)

        model = DynamicsPredictor(model_cfg)
        target = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))
        ckpt = ("latest.ckpt" if epoch == "latest" else f"model_{epoch}.ckpt")
        ckpt_path = os.path.join(train_cfg.out_dir, "checkpoints", ckpt)
        if os.path.exists(ckpt_path):
            gnn_params = load_checkpoint(ckpt_path, target)
        else:
            print(f"warning: checkpoint {ckpt_path} missing; using random init")
            gnn_params = target

        rcfg = RolloutConfig(
            n_his=train_cfg.n_his,
            dist_thresh=0.005,
            max_nobj=data_cfg.max_nobj,
            fps_radius=sum(data_cfg.fps_radius_range) / 2,
            adj_thresh=sum(data_cfg.adj_radius_range) / 2,
            topk=data_cfg.topk,
            connect_all=data_cfg.connect_all,
            max_nR=data_cfg.max_nR,
        )
        self.dm = DynamicsModule(model_cfg, gnn_params, rcfg)
        gs_cfg = OnlineGSConfig()
        if gs_iters is not None:
            gs_cfg = gs_cfg._replace(num_iters=gs_iters)
        self.gs = OnlineGSTrainer(gs_cfg, seed=seed)
        self.assets = assets
        self.vis_cam_id = 0

    def reset(self, train_gs: bool = True):
        """Load assets (or synthesize) and fit the Gaussian scene
        (`reset`, `src/demo.py:124-160`)."""
        if self.assets:
            from PIL import Image

            from gsdx.io.ply import load_ply

            pts, cols = load_ply(os.path.join(self.assets, "pcd.ply"))
            imgs, masks = [], []
            for v in range(4):
                img = np.asarray(
                    Image.open(os.path.join(self.assets, f"img_{v}.png"))
                ).astype(np.float32)[..., :3] / 255.0
                mask = np.asarray(
                    Image.open(os.path.join(self.assets, f"mask_{v}.png"))
                ).astype(np.float32)
                if mask.ndim == 3:
                    mask = mask[..., 0]
                mask = mask / max(mask.max(), 1e-6)
                imgs.append(img * mask[..., None])
                masks.append(mask)
            R_list = np.load(os.path.join(self.assets, "R_list.npy"))
            t_list = np.load(os.path.join(self.assets, "t_list.npy"))
            intr_list = np.load(os.path.join(self.assets, "intr_list.npy"))
            self.gs.update_state(pts, cols if cols is not None else
                                 np.full_like(pts, 0.5), imgs, masks,
                                 list(R_list), list(t_list), list(intr_list))
        else:
            self._synthetic_scene()
        if train_gs:
            print("fitting Gaussian scene ...")
            self.gs.train(progress=True)
        elif self.gs.params is None:
            self.gs.init_params()  # show the scene without fitting
        live = np.asarray(self.gs.params.live) > 0
        self.particle_pos = np.asarray(self.gs.params.means3d)[live]
        self.mean_z = float(self.particle_pos[:, 2].mean())

    def _synthetic_scene(self):
        """Self-contained scene (rope-like curve) when no assets exist."""
        from gsdx.realworld.env import FakeEnv, FakeEnvConfig

        rng = np.random.default_rng(0)
        t = np.linspace(0, 1, 300)
        pts = np.stack([
            0.25 + 0.25 * t,
            0.05 + 0.12 * np.sin(4 * t),
            np.full_like(t, 0.01),
        ], axis=1).astype(np.float32)
        pts += rng.normal(scale=0.004, size=pts.shape).astype(np.float32)
        cols = np.stack([0.8 + 0 * t, 0.3 + 0.4 * t, 0.2 + 0 * t], 1).astype(
            np.float32)
        env = FakeEnv(pts, cols, FakeEnvConfig(n_cameras=4, width=320,
                                               height=240))
        env.start()
        obs = env.get_obs()
        R_list, t_list = env.get_extrinsics()
        masks = [
            (np.abs(obs["color"][c].astype(np.float32)
                    - 255 * 0.7).max(-1) > 30).astype(np.float32)
            for c in range(4)
        ]
        imgs = [obs["color"][c].astype(np.float32) / 255.0 * masks[c][..., None]
                for c in range(4)]
        self.gs.update_state(pts, cols, imgs, masks, R_list, t_list,
                             env.get_intrinsics())
        env.stop()

    def run_sim(self, start_px, target_px, cam_id: int | None = None):
        """Clicks -> world push -> GNN rollout -> rendered video
        (`on_click_run_sim` + `step_sim`, `src/demo.py:489-534`)."""
        cam_id = self.vis_cam_id if cam_id is None else cam_id
        intr = np.asarray(self.gs.metadata["k"][cam_id])
        extr = np.asarray(self.gs.metadata["w2c"][cam_id])
        start = click_to_xyz(*start_px, intr, extr, z=self.mean_z)
        end = click_to_xyz(*target_px, intr, extr, z=self.mean_z)
        action = np.stack([start, end])
        rendervars, visvars = self.gs.rollout_and_render(self.dm, action)
        frames = self.render_rollout(rendervars, cam_id)
        return action, rendervars, frames

    def render_rollout(self, rendervars, cam_id: int):
        from gsdx.io.video import chw_to_hwc, write_video

        frames = []
        for rv in rendervars:
            im, _ = self.gs.render(rv, cam_id, bg=(0, 0, 0))
            frames.append(chw_to_hwc(im))
        path = write_video(
            os.path.join(self.out_dir, f"sim_cam{cam_id}.mp4"), frames, fps=5
        )
        print(f"wrote {path} ({len(frames)} frames)")
        return frames

    def export_splat(self, path: str | None = None):
        """Current scene -> .splat (`save_to_splat`, `src/demo.py:163-186`)."""
        import jax

        from gsdx.io.episodes import save_to_splat

        p = self.gs.params
        live = np.asarray(p.live) > 0
        path = path or os.path.join(self.out_dir, "gs.splat")
        save_to_splat(
            np.asarray(p.means3d)[live],
            np.asarray(p.rgb_colors)[live],
            np.exp(np.asarray(p.log_scales))[live],
            np.asarray(p.unnorm_rotations)[live],
            np.asarray(jax.nn.sigmoid(p.logit_opacities))[live],
            path,
        )
        return path


def run_gradio(session: DemoSession):
    import gradio as gr

    state = {"clicks": []}
    session.reset(train_gs=True)

    def render_current():
        live = np.asarray(session.gs.params.live) > 0
        rv = {
            "means3D": np.asarray(session.gs.params.means3d)[live],
            "colors_precomp": np.asarray(session.gs.params.rgb_colors)[live],
            "rotations": np.asarray(session.gs.params.unnorm_rotations)[live],
            "opacities": 1 / (1 + np.exp(
                -np.asarray(session.gs.params.logit_opacities)[live])),
            "scales": np.exp(np.asarray(session.gs.params.log_scales)[live]),
        }
        im, _ = session.gs.render(rv, session.vis_cam_id)
        return np.clip(np.asarray(im).transpose(1, 2, 0), 0, 1)

    def on_click(evt: "gr.SelectData"):
        state["clicks"].append((evt.index[0], evt.index[1]))
        if len(state["clicks"]) == 2:
            a, b = state["clicks"]
            state["clicks"] = []
            _, _, frames = session.run_sim(a, b)
            return os.path.join(session.out_dir,
                                f"sim_cam{session.vis_cam_id}.mp4")
        return None

    with gr.Blocks() as app:
        img = gr.Image(render_current(), label="click start then target")
        vid = gr.Video(label="predicted rollout")
        img.select(on_click, outputs=[vid])
    app.launch()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--epoch", default="latest")
    p.add_argument("--assets", default=None)
    p.add_argument("--clicks", default=None,
                   help="x1,y1,x2,y2 push start/target pixels (headless mode)")
    p.add_argument("--cam", type=int, default=0)
    p.add_argument("--out", default="out/demo")
    p.add_argument("--gs_iters", type=int, default=None)
    args = p.parse_args(argv)

    session = DemoSession(args.config, args.epoch, args.assets, args.out,
                          gs_iters=args.gs_iters)
    session.vis_cam_id = args.cam

    try:
        import gradio  # noqa: F401

        has_gradio = args.clicks is None
    except ImportError:
        has_gradio = False

    if has_gradio:
        run_gradio(session)
    else:
        session.reset(train_gs=True)
        if args.clicks:
            x1, y1, x2, y2 = (float(v) for v in args.clicks.split(","))
            session.run_sim((x1, y1), (x2, y2))
        session.export_splat()


if __name__ == "__main__":
    main()
