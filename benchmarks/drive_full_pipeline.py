"""Full reference pipeline as ONE driven TPU artifact (VERDICT r2 next #7,
BASELINE config 5): track -> preprocess -> GNN train -> rollout -> re-render.

Mirrors the reference call-stack chain (SURVEY.md §3.2 -> 3.1 -> 3.3) on
realistic data derived from the bundled demo scene (`/root/reference/assets/
demo`, 4 real RealSense views of a rope):

  1. TRACK    — fit the demo scene (10k iters + densify, 640x480), synthesize
                a T-frame pushed episode (virtual pusher with a contact
                falloff motion model, per-frame re-rendered targets), and
                run `track_sequence` over it (`src/tracking/train_gs.py`).
  2. PREPROCESS — write the episode in the reference's on-disk layout
                (params.npz/metadata.json/actions.txt/calibration pkl), run
                `preprocess_episode` (`src/preprocess.py:233-294`): unit-push
                extraction + FPS downsampling.
  3. GNN TRAIN — GraphSampler + make_train_step at the rope config
                (`src/train.py`), reduced schedule.
  4. ROLLOUT  — `collect_scene_data` (`src/render/dynamics_module.py`),
                chamfer of the GNN rollout vs the tracked trajectory.
  5. RE-RENDER — render the rollout rendervars (Gaussian skinning applied by
                the DynamicsModule) on the real cameras; PSNR vs the episode
                targets; save a GIF.

Per-stage wall time + metrics -> benchmarks/out/full_pipeline_report.json
(recorded in PARITY.md).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python -u \
       benchmarks/drive_full_pipeline.py
"""
import json
import os
import pickle
import time

import numpy as np
import jax

if bool(int(os.environ.get("GSDX_PIPELINE_FAST", "0"))):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
from PIL import Image

from gsdx.core.cameras import make_camera
from gsdx.core.gaussians import init_gaussian_params
from gsdx.io.ply import load_ply
from gsdx.kernels.knn import knn
from gsdx.render.rasterize import RasterizeConfig, rasterize
from gsdx.track.losses import calc_psnr
from gsdx.track.online import OnlineGSTrainer, rt_to_w2c
from gsdx.track.trainer import TrackingConfig, track_sequence

ASSETS = "/root/reference/assets/demo"
# GSDX_PIPELINE_FAST=1: tiny CPU smoke of the full chain (flow validation
# only — production numbers come from the default TPU run).
FAST = bool(int(os.environ.get("GSDX_PIPELINE_FAST", "0")))
T_STEPS = 6 if FAST else 16
OUT = "benchmarks/out"
WORK = os.path.join(OUT, "pipeline")
os.makedirs(WORK, exist_ok=True)
report = {"stages": {}}
t_wall = time.time()


def stage_done(name, t0, **metrics):
    dt = time.time() - t0
    report["stages"][name] = {"wall_s": round(dt, 1), **metrics}
    print(f"[pipeline] {name} done in {dt:.0f}s {metrics}", flush=True)


# ============================ Stage 1: TRACK =================================
t0 = time.time()
pts, cols = load_ply(os.path.join(ASSETS, "pcd.ply"))
imgs, masks = [], []
for v in range(4):
    img = np.asarray(Image.open(f"{ASSETS}/img_{v}.png")).astype(
        np.float32)[..., :3] / 255.0
    m = np.asarray(Image.open(f"{ASSETS}/mask_{v}.png")).astype(np.float32)
    if m.ndim == 3:
        m = m[..., 0]
    m = m / max(m.max(), 1e-6)
    imgs.append(img * m[..., None])
    masks.append(m)
R_list = np.load(f"{ASSETS}/R_list.npy")
t_list = np.load(f"{ASSETS}/t_list.npy")
intr_list = np.load(f"{ASSETS}/intr_list.npy")

if FAST:  # 4x-downscaled images, subsampled cloud, toy schedules
    ds = 4
    imgs = [np.asarray(Image.fromarray(
        (np.clip(im, 0, 1) * 255).astype(np.uint8)).resize(
            (im.shape[1] // ds, im.shape[0] // ds))).astype(np.float32) / 255.0
        for im in imgs]
    masks = [np.asarray(Image.fromarray(
        (m * 255).astype(np.uint8)).resize(
            (m.shape[1] // ds, m.shape[0] // ds))).astype(np.float32) / 255.0
        for m in masks]
    intr_list = [np.diag([1 / ds, 1 / ds, 1.0]).astype(np.float32)
                 @ np.asarray(k, np.float32) for k in intr_list]
    keep = np.random.default_rng(0).permutation(len(pts))[:1200]
    pts = np.asarray(pts)[keep]
    if cols is not None:
        cols = np.asarray(cols)[keep]
h0, w0 = imgs[0].shape[:2]

from gsdx.track.online import OnlineGSConfig

gs = OnlineGSTrainer(
    cfg=OnlineGSConfig(num_iters=60) if FAST else OnlineGSConfig(), seed=0)
gs.update_state(pts, cols if cols is not None else np.full_like(pts, 0.5),
                imgs, masks, list(R_list), list(t_list), list(intr_list))
logs = gs.train(progress=True)
fit = gs.params
live = np.asarray(fit.live) > 0
fit_xyz = np.asarray(fit.means3d)[live]
fit_rgb = np.asarray(fit.rgb_colors)[live]
fit_rot = np.asarray(fit.unnorm_rotations)[live]
fit_opa = 1.0 / (1.0 + np.exp(-np.asarray(fit.logit_opacities)[live]))
fit_scl = np.exp(np.asarray(fit.log_scales)[live])
seg_colors = np.asarray(fit.seg_colors)[live]
n_fit = len(fit_xyz)
print(f"[pipeline] fitted {n_fit} gaussians, "
      f"psnr {float(logs['psnr'][-1]):.2f}", flush=True)

# --- virtual pusher episode: contact-falloff motion model -------------------
lo, hi = fit_xyz.min(0), fit_xyz.max(0)
axis = int(np.argmax(hi - lo))  # rope axis
perp = 1 - axis if axis in (0, 1) else 0
center = fit_xyz.mean(0)
STEP = 0.006  # 6 mm/frame, > preprocess dist_thresh
RADIUS = 0.06

eef = np.zeros((T_STEPS, 3), np.float32)
eef[0] = center
eef[0, perp] = fit_xyz[:, perp].min() - 0.02
eef[0, 2] = fit_xyz[:, 2].min()
push_dir = np.zeros(3, np.float32)
push_dir[perp] = 1.0

xyz_seq = np.zeros((T_STEPS, n_fit, 3), np.float32)
xyz_seq[0] = fit_xyz
for t in range(1, T_STEPS):
    eef[t] = eef[t - 1] + STEP * push_dir
    d2 = np.sum((xyz_seq[t - 1] - eef[t]) ** 2, axis=1)
    w = np.exp(-d2 / RADIUS**2)
    xyz_seq[t] = xyz_seq[t - 1] + STEP * w[:, None] * push_dir

# --- re-render targets per frame at the production resolution ---------------
# The initial fit is anchored to the real 640x480 captures; the synthesized
# EPISODE is tracked at the production 1280x720 (`src/render/renderer.py:
# 13-14`) through upscaled intrinsics — the flagship tracking regime.
HP, WP = (h0, w0) if FAST else (720, 1280)
w2cs = [rt_to_w2c(np.asarray(R), np.asarray(t)) for R, t in zip(R_list, t_list)]
kp = []
for kmat in intr_list:
    k = np.array(kmat, np.float32).copy()
    k[0] *= WP / w0
    k[1] *= HP / h0
    kp.append(k)
cams = [make_camera(kp[c], w2cs[c], width=WP, height=HP, bg=(0, 0, 0),
                    cam_id=c) for c in range(4)]
cams_stack = jax.tree.map(lambda *x: jnp.stack(x), *cams)
rcfg = RasterizeConfig()
colors6 = jnp.concatenate([jnp.asarray(fit_rgb), jnp.asarray(seg_colors)], 1)


@jax.jit
def render6(xyz, cam):
    return rasterize(xyz, jnp.asarray(fit_rot), jnp.asarray(fit_scl),
                     jnp.asarray(fit_opa), colors6, cam, rcfg).im


ims_seq = np.zeros((T_STEPS, 4, 3, HP, WP), np.float32)
segs_seq = np.zeros((T_STEPS, 4, 3, HP, WP), np.float32)
for t in range(T_STEPS):
    for c in range(4):
        im6 = np.asarray(render6(jnp.asarray(xyz_seq[t]),
                                 jax.tree.map(lambda x: x[c], cams_stack)))
        ims_seq[t, c] = im6[:3]
        segs_seq[t, c] = im6[3:6]
print("[pipeline] episode targets rendered", flush=True)

# --- track the episode --------------------------------------------------------
stride = max(1, n_fit // (300 if FAST else 3500))
init_cld = np.concatenate(
    [fit_xyz[::stride], fit_rgb[::stride], seg_colors[::stride][:, :1]], 1)
d3, _ = knn(jnp.asarray(init_cld[:, :3]), 3)
params0 = init_gaussian_params(init_cld, np.asarray(d3).mean(-1),
                               capacity=1024 if FAST else 8192)
cam_centers = np.linalg.inv(np.stack(w2cs))[:, :3, 3]
scene_radius = float(1.1 * np.max(np.linalg.norm(
    cam_centers - cam_centers.mean(0, keepdims=True), axis=-1)))
tcfg = (TrackingConfig(iters_first=60, iters_rest=30) if FAST
        else TrackingConfig())
outputs = track_sequence(
    params0, cams_stack, jnp.asarray(ims_seq), jnp.asarray(segs_seq),
    num_timesteps=T_STEPS, cfg=tcfg, scene_radius=scene_radius,
    progress=True)
track_psnr = []
for t in range(T_STEPS):
    snap = outputs[t]
    n = len(snap["means3D"])
    opa = 1.0 / (1.0 + np.exp(-outputs[0]["logit_opacities"][:n]))
    scl = np.exp(outputs[0]["log_scales"][:n])
    out = rasterize(jnp.asarray(snap["means3D"]),
                    jnp.asarray(snap["unnorm_rotations"]), jnp.asarray(scl),
                    jnp.asarray(opa), jnp.asarray(snap["rgb_colors"]),
                    jax.tree.map(lambda x: x[0], cams_stack), rcfg)
    track_psnr.append(float(calc_psnr(out.im, jnp.asarray(ims_seq[t, 0]))))
stage_done("track", t0, fit_psnr=round(float(logs['psnr'][-1]), 2),
           n_fit=n_fit, track_psnr_cam0=[round(p, 2) for p in track_psnr])

# ============================ Stage 2: PREPROCESS ============================
t0 = time.time()
from gsdx.io.preprocess import preprocess_episode

data_dir = os.path.join(WORK, "data")
ckpt_dir = os.path.join(WORK, "ckpts")
prep_dir = os.path.join(WORK, "prep")
for d in (data_dir, ckpt_dir, prep_dir):
    os.makedirs(d, exist_ok=True)

# actions.txt in robot mm units, world == base (identity calibration); the
# eef z in actions carries the gripper offset that eef_world_positions
# subtracts (gripper_z=0.18 in preprocess).
lines = []
for t in range(T_STEPS):
    pose_mm = [float(eef[t, 0]) * 1000.0, float(eef[t, 1]) * 1000.0,
               (float(eef[t, 2]) + 0.18) * 1000.0, 180.0, 0.0, 90.0]
    lines.append(json.dumps({"joint_angles": [0.0] * 7, "pose": pose_mm}))
with open(os.path.join(data_dir, "actions.txt"), "w") as f:
    f.write("\n".join(lines) + "\n")
with open(os.path.join(data_dir, "calibration_handeye_result.pkl"), "wb") as f:
    pickle.dump({"R_base2world": np.eye(3), "t_base2world": np.zeros(3)}, f)

meta = {"w": WP, "h": HP,
        "k": [[np.asarray(k).tolist() for k in kp]] * T_STEPS,
        "w2c": [[w.tolist() for w in w2cs]] * T_STEPS,
        "fn": [[f"camera_{c}/color_{t:06d}.jpg" for c in range(4)]
               for t in range(T_STEPS)]}
with open(os.path.join(ckpt_dir, "metadata.json"), "w") as f:
    json.dump(meta, f)

T_out = len(outputs)
n_track = len(outputs[0]["means3D"])
np.savez(
    os.path.join(ckpt_dir, "params.npz"),
    means3D=np.stack([o["means3D"][:n_track] for o in outputs]),
    rgb_colors=np.stack([o["rgb_colors"][:n_track] for o in outputs]),
    unnorm_rotations=np.stack(
        [o["unnorm_rotations"][:n_track] for o in outputs]),
    logit_opacities=outputs[0]["logit_opacities"][:n_track],
    log_scales=outputs[0]["log_scales"][:n_track],
)
rows = preprocess_episode(data_dir, ckpt_dir, prep_dir, dist_thresh=0.005,
                          n_his=3, n_future=3, episode_idx=0,
                          n_downsample=30 if FAST else 1000)
assert rows is not None, "preprocess rejected the episode"
stage_done("preprocess", t0, n_pairs=int(rows.shape[0]), n_track=n_track)

# ============================ Stage 3: GNN TRAIN =============================
t0 = time.time()
from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import init_params, make_train_step
from gsdx.graph.dataset import EpisodeStore, GraphSampler
from gsdx.io.config import load_config
from gsdx.io.episodes import eef_world_positions, load_metadata

train_cfg, model_cfg, data_cfg = load_config("configs/rope.yaml")
xyz_down = np.load(os.path.join(ckpt_dir, "param_downsampled.npy"))
eef_w = eef_world_positions(data_dir, load_metadata(
    os.path.join(ckpt_dir, "metadata.json")))
pairs = np.loadtxt(os.path.join(prep_dir, "frame_pairs", "0.txt")).astype(
    np.int64)
if pairs.ndim == 1:
    pairs = pairs[None]
pairs = np.concatenate([np.zeros((len(pairs), 1), np.int64), pairs], 1)
store = EpisodeStore.from_numpy([xyz_down], [eef_w], [pairs])
sampler = GraphSampler(store, data_cfg, "train")
model = DynamicsPredictor(model_cfg)
gnn_params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))
step, _, tx = make_train_step(model, train_cfg)
opt_state = tx.init(gnn_params)
N_STEPS = 30 if FAST else 2000
key = jax.random.PRNGKey(1)
loss_hist = []
for i in range(N_STEPS):
    key, sub = jax.random.split(key)
    batch = sampler.sample(sub, train_cfg.batch_size)
    gnn_params, opt_state, loss, _ = step(gnn_params, opt_state, batch)
    if i % 100 == 0:
        loss_hist.append(round(float(loss), 6))
        print(f"[pipeline] gnn step {i} loss {float(loss):.6f}", flush=True)
final_loss = float(loss)
stage_done("gnn_train", t0, steps=N_STEPS, loss_first=loss_hist[0],
           loss_last=final_loss)

# ============================ Stage 4: ROLLOUT ===============================
t0 = time.time()
from gsdx.apps.predict import collect_scene_data
from gsdx.dynamics.losses import chamfer_distance

scene_data, vis, meta2 = collect_scene_data(
    os.path.join(ckpt_dir, "params.npz"), data_dir, ckpt_dir,
    model_cfg, train_cfg, data_cfg, gnn_params, max_steps=T_STEPS)
tracked = np.stack([o["means3D"][:n_track] for o in outputs])
chamfers = []
for t, sd in enumerate(scene_data[: len(tracked)]):
    c = float(chamfer_distance(jnp.asarray(sd["means3D"])[None],
                               jnp.asarray(tracked[t])[None]))
    chamfers.append(round(c, 6))
stage_done("rollout", t0, frames=len(scene_data), chamfer_per_t=chamfers,
           chamfer_mean=round(float(np.mean(chamfers)), 6))

# ============================ Stage 5: RE-RENDER =============================
t0 = time.time()
frames, rerender_psnr = [], []
for t, sd in enumerate(scene_data):
    out = rasterize(
        jnp.asarray(sd["means3D"]), jnp.asarray(sd["rotations"]),
        jnp.asarray(sd["scales"]), jnp.asarray(sd["opacities"]),
        jnp.asarray(sd["colors_precomp"]),
        jax.tree.map(lambda x: x[0], cams_stack), rcfg)
    im = np.clip(np.asarray(out.im).transpose(1, 2, 0), 0, 1)
    frames.append((im * 255).astype(np.uint8))
    if t < T_STEPS:
        rerender_psnr.append(round(float(
            calc_psnr(out.im, jnp.asarray(ims_seq[t, 0]))), 2))
try:
    import imageio.v2 as imageio

    imageio.mimsave(os.path.join(OUT, "pipeline_rollout.gif"), frames, fps=4)
    video = "pipeline_rollout.gif"
except Exception as e:  # imageio absent -> PNG strip fallback
    for t, fr in enumerate(frames):
        Image.fromarray(fr).save(os.path.join(OUT, f"pipeline_{t:03d}.png"))
    video = f"pipeline_*.png ({e})"
stage_done("rerender", t0, psnr_cam0=rerender_psnr, video=video)

report["total_wall_s"] = round(time.time() - t_wall, 1)
with open(os.path.join(OUT, "full_pipeline_report.json"), "w") as f:
    json.dump(report, f, indent=1)
print(f"[pipeline] total {report['total_wall_s']}s -> "
      "benchmarks/out/full_pipeline_report.json", flush=True)
print("DRIVE_FULL_PIPELINE OK", flush=True)
