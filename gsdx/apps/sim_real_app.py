"""Interactive sim-real app: perceive -> GS fit -> click-plan -> run real.

Counterpart of the reference's real-robot gradio app
(`src/real_world/gs_sim_real_gradio.py:98-787`, `DynamicsVisualizer`): live
perception from the environment cameras, online Gaussian fitting, click a
push (start + target) in a camera view, roll the GNN dynamics forward and
render the predicted video, then optionally execute the push for real
(`Run real` -> env.step -> re-perceive). ``--save-for-demo`` captures the
demo-asset bundle (pcd.ply, img_v.png, mask_v.png, R/t/intr .npy,
gs_orig.splat / gs_pred.splat, video_v.mp4) that `gsdx.apps.demo` loads
offline (`src/demo.py:124-160` asset contract).

Runs as a gradio app when gradio is importable; otherwise headless:
  python -m gsdx.apps.sim_real_app --config configs/rope.yaml \
      [--env fake|real] [--clicks x1,y1,x2,y2] [--run-real] [--save-for-demo]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from gsdx.apps.demo import DemoSession


class SimRealSession(DemoSession):
    """Env-backed demo session (reference `DynamicsVisualizer`).

    Extends the offline `DemoSession` with live perception (`reset`), real
    execution (`step_real`), and demo-asset capture (`save_dir`).
    """

    def __init__(self, config_path: str, env, epoch: str = "latest",
                 out_dir: str = "out/sim_real", gs_iters: int | None = None,
                 save_dir: str | None = None, prompt: str = "object",
                 seed: int = 0, segmenter=None):
        super().__init__(config_path, epoch, assets=None, out_dir=out_dir,
                         gs_iters=gs_iters, seed=seed)
        from gsdx.realworld.perception import PerceptionModule

        self.env = env
        self.pm = PerceptionModule(segmenter=segmenter)
        self.save_dir = save_dir
        self.prompt = prompt
        self.actions = None  # last planned push, (2, 3) world coords
        self.obj_dir = None
        self.action_dir = None

    # -- perception + fit ---------------------------------------------------

    def reset(self, train_gs: bool = True):
        """Perceive from the env cameras and (re)fit the Gaussian scene
        (`DynamicsVisualizer.reset`, `gs_sim_real_gradio.py:154-191`)."""
        pts, cols, imgs, masks = self.pm.get_tabletop_points_env(
            self.env, prompt=self.prompt, return_imgs=True)
        if len(pts) == 0:
            raise RuntimeError("perception returned no object points")
        R_list, t_list = self.env.get_extrinsics()
        intr = self.env.get_intrinsics()
        self.imgs, self.masks = imgs, masks
        imgs_f = [im.astype(np.float32) / 255.0 * m[..., None]
                  for im, m in zip(imgs, masks)]
        masks_f = [m.astype(np.float32) for m in masks]
        self.gs.update_state(pts, cols, imgs_f, masks_f, R_list, t_list, intr)
        if train_gs:
            print("fitting Gaussian scene ...")
            self.gs.train(progress=True)
            self.actions = None
        live = np.asarray(self.gs.params.live) > 0
        self.particle_pos = np.asarray(self.gs.params.means3d)[live]
        self.mean_z = float(self.particle_pos[:, 2].mean())
        if train_gs and self.save_dir:
            self.obj_dir = self._save_obj_assets(pts, cols, imgs, masks,
                                                 R_list, t_list, intr)

    def _save_obj_assets(self, pts, cols, imgs, masks, R_list, t_list, intr):
        """Demo-asset bundle for the offline demo (`save_for_demo`,
        `gs_sim_real_gradio.py:176-191`; loader `src/demo.py:124-160`)."""
        from PIL import Image

        from gsdx.io.ply import save_ply

        obj_dir = os.path.join(self.save_dir, f"obj_{time.time():.0f}")
        os.makedirs(obj_dir, exist_ok=True)
        save_ply(os.path.join(obj_dir, "pcd.ply"), pts, cols)
        for v, (im, m) in enumerate(zip(imgs, masks)):
            Image.fromarray(im.astype(np.uint8)).save(
                os.path.join(obj_dir, f"img_{v}.png"))
            Image.fromarray((m.astype(np.uint8)) * 255).save(
                os.path.join(obj_dir, f"mask_{v}.png"))
        np.save(os.path.join(obj_dir, "R_list.npy"), np.stack(R_list))
        np.save(os.path.join(obj_dir, "t_list.npy"), np.stack(t_list))
        np.save(os.path.join(obj_dir, "intr_list.npy"), np.stack(intr))
        self.export_splat(os.path.join(obj_dir, "gs_orig.splat"))
        print(f"saved demo assets to {obj_dir}")
        return obj_dir

    # -- simulate + execute -------------------------------------------------

    def run_sim(self, start_px, target_px, cam_id: int | None = None):
        """Clicks -> world push -> GNN rollout -> rendered video; remembers
        the action for `run_real` and captures per-view rollout videos when
        saving for demo (`on_click_run_sim`, `gs_sim_real_gradio.py:538-605`)."""
        action, rendervars, frames = super().run_sim(start_px, target_px,
                                                     cam_id)
        self.actions = action
        self.particle_pos = np.asarray(rendervars[-1]["means3D"])
        if self.save_dir and self.obj_dir:
            self.action_dir = os.path.join(
                self.obj_dir, f"action_{time.time():.0f}")
            os.makedirs(self.action_dir, exist_ok=True)
            from gsdx.io.video import chw_to_hwc, write_video

            n_views = len(self.gs.metadata["k"])
            for v in range(n_views):
                view_frames = [
                    chw_to_hwc(self.gs.render(rv, v, bg=(0, 0, 0))[0])
                    for rv in rendervars
                ]
                write_video(os.path.join(self.action_dir, f"video_{v}.mp4"),
                            view_frames, fps=5)
            self.export_splat(os.path.join(self.action_dir, "gs_pred.splat"))
            np.save(os.path.join(self.action_dir, "action.npy"), action)
        return action, rendervars, frames

    def run_real(self):
        """Execute the last planned push on the environment and re-perceive
        (`on_click_run_real` -> `step_real`, `gs_sim_real_gradio.py:607-618`)."""
        if self.actions is None:
            print("no planned action; click/run sim first")
            return False
        a = self.actions
        self.env.step(np.array([a[0, 0], a[0, 1], a[1, 0], a[1, 1]],
                               np.float32))
        self.reset(train_gs=False)  # fresh images, keep the fitted scene
        return True

    def switch_view(self):
        """Cycle the visualization camera (`on_click_switch_view`)."""
        self.vis_cam_id = (self.vis_cam_id + 1) % len(self.gs.metadata["k"])
        return self.vis_cam_id


def run_gradio(session: SimRealSession):
    """Interactive UI: click start+target -> sim video; Run real; Reset
    (`DynamicsVisualizer.launch`, `gs_sim_real_gradio.py:671-787`)."""
    import gradio as gr

    state = {"clicks": []}
    session.reset(train_gs=True)

    def current_view():
        im = session.imgs[session.vis_cam_id].astype(np.float32) / 255.0
        return np.clip(im, 0, 1)

    def on_click(evt: "gr.SelectData"):
        state["clicks"].append((evt.index[0], evt.index[1]))
        if len(state["clicks"]) == 2:
            a, b = state["clicks"]
            state["clicks"] = []
            session.run_sim(a, b)
            return os.path.join(session.out_dir,
                                f"sim_cam{session.vis_cam_id}.mp4")
        return None

    def on_run_real():
        session.run_real()
        return current_view()

    def on_reset():
        session.reset(train_gs=True)
        return current_view()

    def on_switch():
        session.switch_view()
        return current_view()

    with gr.Blocks() as app:
        img = gr.Image(current_view(), label="click push start then target")
        vid = gr.Video(label="predicted rollout")
        with gr.Row():
            real_btn = gr.Button("Run real")
            reset_btn = gr.Button("Reset")
            switch_btn = gr.Button("Switch view")
        img.select(on_click, outputs=[vid])
        real_btn.click(on_run_real, outputs=[img])
        reset_btn.click(on_reset, outputs=[img])
        switch_btn.click(on_switch, outputs=[img])
    app.launch()


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--epoch", default="latest")
    p.add_argument("--env", default="fake", choices=["fake", "real"])
    p.add_argument("--cameras", default="synthetic:4")
    p.add_argument("--robot_ip", default="fake")
    p.add_argument("--calibration", default=None)
    p.add_argument("--out", default="out/sim_real")
    p.add_argument("--gs_iters", type=int, default=None)
    p.add_argument("--clicks", default=None,
                   help="x1,y1,x2,y2 push pixels (headless mode)")
    p.add_argument("--cam", type=int, default=0)
    p.add_argument("--run-real", action="store_true",
                   help="execute the planned push on the env afterwards")
    p.add_argument("--save-for-demo", action="store_true")
    p.add_argument("--prompt", default="object")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.env == "fake":
        from gsdx.realworld.env import FakeEnv

        rng = np.random.default_rng(args.seed)
        t = np.linspace(0, 1, 300)
        pts = np.stack([0.25 + 0.25 * t, 0.05 + 0.1 * np.sin(4 * t),
                        np.full_like(t, 0.01)], 1).astype(np.float32)
        pts += rng.normal(scale=0.004, size=pts.shape).astype(np.float32)
        cols = np.tile(np.array([0.85, 0.3, 0.15], np.float32), (300, 1))
        env = FakeEnv(pts, cols)
    else:
        from gsdx.apps.plan import make_real_env

        env = make_real_env(args.cameras, args.robot_ip, args.calibration)
    env.start()
    try:
        session = SimRealSession(
            args.config, env, epoch=args.epoch, out_dir=args.out,
            gs_iters=args.gs_iters,
            save_dir=os.path.join(args.out, "demo_assets")
            if args.save_for_demo else None,
            prompt=args.prompt, seed=args.seed,
        )
        session.vis_cam_id = args.cam

        headless = args.clicks is not None
        if not headless:
            try:
                import gradio  # noqa: F401
            except ImportError:
                headless = True
                print("gradio unavailable; need --clicks for headless mode")
                return
        if headless:
            session.reset(train_gs=True)
            x1, y1, x2, y2 = (float(v) for v in args.clicks.split(","))
            session.run_sim((x1, y1), (x2, y2))
            if args.run_real:
                session.run_real()
        else:
            run_gradio(session)
    finally:
        env.stop()


if __name__ == "__main__":
    main()
