"""Production-scale dynamic tracking drive (VERDICT r2 missing #3).

Builds a REAL multi-timestep episode from the reference's bundled demo scene
(`/root/reference/assets/demo`, 4 RealSense views of a rope) and runs the
full `track_sequence` flagship path (`src/tracking/train_gs.py:19-46`,
BASELINE config 2) at production scale on TPU:

  A. fit the demo scene at its native 640x480 (10k iters, densification) —
     the same fit PARITY.md records at 28.6 dB;
  B. synthesize known motion (rigid translation + sinusoidal bend along the
     rope axis) for T timesteps and re-render 1280x720 targets for 4
     upscaled cameras from the fitted scene;
  C. run `track_sequence` (t=0: 10k iters + densify; t>0: 2k iters with the
     full rigid/rot/iso/floor/bg loss tail, block-frozen bin reuse) against
     those targets, starting from a subsampled init cloud;
  D. report per-timestep PSNR (all 4 cameras, re-rendered from the tracked
     params) and tracked-centroid error vs the known motion + iters/s.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python -u \
       benchmarks/drive_dynamic_tracking.py
"""
import json
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
from PIL import Image

from gsdx.core.cameras import make_camera
from gsdx.io.ply import load_ply
from gsdx.render.rasterize import RasterizeConfig, rasterize
from gsdx.track.losses import calc_psnr
from gsdx.track.online import OnlineGSTrainer, rt_to_w2c
from gsdx.track.trainer import TrackingConfig, track_sequence

ASSETS = "/root/reference/assets/demo"
T_STEPS = 6
H, W = 720, 1280  # production resolution (`src/render/renderer.py:13-14`)
OUT = "benchmarks/out"
os.makedirs(OUT, exist_ok=True)

# ---- Stage A: fit the demo scene at native resolution ----------------------
print("[drive] stage A: fitting demo scene (10k iters, 640x480)", flush=True)
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

gs = OnlineGSTrainer(seed=0)
gs.update_state(pts, cols if cols is not None else np.full_like(pts, 0.5),
                imgs, masks, list(R_list), list(t_list), list(intr_list))
t0 = time.time()
logs = gs.train(progress=True)
print(f"[drive] stage A done in {time.time()-t0:.0f}s, "
      f"fit psnr {float(logs['psnr'][-1]):.2f} dB", flush=True)

fit = gs.params
live = np.asarray(fit.live) > 0
fit_xyz = np.asarray(fit.means3d)[live]
fit_rgb = np.asarray(fit.rgb_colors)[live]
fit_rot = np.asarray(fit.unnorm_rotations)[live]
fit_opa = 1.0 / (1.0 + np.exp(-np.asarray(fit.logit_opacities)[live]))
fit_scl = np.exp(np.asarray(fit.log_scales)[live])
n_fit = len(fit_xyz)
print(f"[drive] fitted scene: {n_fit} gaussians", flush=True)

# ---- Stage B: known motion + 720p target renders ----------------------------
# Rigid translation + bend: displacement grows with normalized rope-axis
# coordinate, per timestep. Magnitudes sized to the scene extent.
lo, hi = fit_xyz.min(0), fit_xyz.max(0)
extent = float(np.linalg.norm(hi - lo))
axis = np.argmax(hi - lo)  # rope axis


def motion(xyz, t):
    """Known deformation at timestep t (t=0 -> identity). Pure function of
    position (u from the fit-scene axis bounds), so it evaluates both the
    ground-truth episode AND the expected displacement of any tracked
    point set."""
    u = (xyz[:, axis] - lo[axis]) / max(hi[axis] - lo[axis], 1e-6)
    d = np.zeros_like(xyz)
    d[:, 0] += 0.010 * extent * t  # rigid drift
    d[:, 1] += 0.006 * extent * t * np.sin(2.5 * u + 0.4 * t)  # bend
    d[:, 2] += 0.003 * extent * t * u  # lift toward the free end
    return xyz + d


# upscaled 720p cameras: K scales by (W/640, H/480)
sx, sy = W / imgs[0].shape[1], H / imgs[0].shape[0]
w2cs = [rt_to_w2c(np.asarray(R), np.asarray(t))
        for R, t in zip(R_list, t_list)]
k720 = []
for kmat in intr_list:
    k = np.array(kmat, np.float32).copy()
    k[0] *= sx
    k[1] *= sy
    k720.append(k)
cams = [make_camera(k720[c], w2cs[c], width=W, height=H, bg=(0, 0, 0),
                    cam_id=c) for c in range(4)]
cams_stack = jax.tree.map(lambda *x: jnp.stack(x), *cams)

rcfg = RasterizeConfig()
seg_colors = np.asarray(fit.seg_colors)[live]


@jax.jit
def render_scene(xyz, colors6, cam):
    out = rasterize(jnp.asarray(xyz), jnp.asarray(fit_rot),
                    jnp.asarray(fit_scl), jnp.asarray(fit_opa),
                    colors6, cam, rcfg)
    return out.im


colors6 = jnp.concatenate(
    [jnp.asarray(fit_rgb), jnp.asarray(seg_colors)], axis=1)

print("[drive] stage B: rendering targets for "
      f"{T_STEPS} timesteps x 4 cams at {W}x{H}", flush=True)
gt_xyz = []
ims_seq = np.zeros((T_STEPS, 4, 3, H, W), np.float32)
segs_seq = np.zeros((T_STEPS, 4, 3, H, W), np.float32)
for t in range(T_STEPS):
    xyz_t = motion(fit_xyz, t)
    gt_xyz.append(xyz_t)
    for c in range(4):
        im6 = np.asarray(render_scene(xyz_t, colors6,
                                      jax.tree.map(lambda x: x[c], cams_stack)))
        ims_seq[t, c] = im6[:3]
        segs_seq[t, c] = im6[3:6]
print("[drive] targets rendered", flush=True)

# ---- Stage C: track the synthesized episode ---------------------------------
from gsdx.core.gaussians import init_gaussian_params
from gsdx.kernels.knn import knn

stride = max(1, n_fit // 3500)
sub = slice(0, None, stride)
init_cld = np.concatenate(
    [fit_xyz[sub], fit_rgb[sub], seg_colors[sub][:, :1]], axis=1)
d3, _ = knn(jnp.asarray(init_cld[:, :3]), 3)
params0 = init_gaussian_params(init_cld, np.asarray(d3).mean(-1),
                               capacity=8192)
cam_centers = np.linalg.inv(np.stack(w2cs))[:, :3, 3]
scene_radius = float(1.1 * np.max(np.linalg.norm(
    cam_centers - cam_centers.mean(0, keepdims=True), axis=-1)))

cfg = TrackingConfig()
print(f"[drive] stage C: track_sequence T={T_STEPS}, init "
      f"{init_cld.shape[0]} pts, capacity 8192, radius {scene_radius:.2f}",
      flush=True)
t0 = time.time()
t_walls = {}
outputs = track_sequence(
    params0, cams_stack, jnp.asarray(ims_seq), jnp.asarray(segs_seq),
    num_timesteps=T_STEPS, cfg=cfg, scene_radius=scene_radius, progress=True,
    on_timestep=lambda t, w: t_walls.__setitem__(t, w),
)
wall = time.time() - t0
t0_iters_s = round(cfg.iters_first / t_walls[0], 1)
t1_iters_s = round(cfg.iters_rest * (T_STEPS - 1)
                   / sum(t_walls[t] for t in range(1, T_STEPS)), 1)
print(f"[drive] tracking done in {wall:.0f}s "
      f"(t=0 {t0_iters_s} iters/s incl. compile+densify; "
      f"t>0 {t1_iters_s} iters/s)", flush=True)

# ---- Stage D: metrics --------------------------------------------------------
report = {"fit_psnr_480p": round(float(logs['psnr'][-1]), 2),
          "n_fit": n_fit, "wall_s": round(wall, 1),
          "t0_iters_s": t0_iters_s, "t1_iters_s": t1_iters_s, "per_t": []}
for t in range(T_STEPS):
    snap = outputs[t]
    xyz = snap["means3D"]
    # PSNR: re-render tracked params on all 4 cams vs targets
    full0 = outputs[0]
    rot = snap["unnorm_rotations"]
    n = len(xyz)
    opa = 1.0 / (1.0 + np.exp(-full0["logit_opacities"][:n]))
    scl = np.exp(full0["log_scales"][:n])
    psnrs = []
    for c in range(4):
        out = rasterize(
            jnp.asarray(xyz), jnp.asarray(rot), jnp.asarray(scl),
            jnp.asarray(opa), jnp.asarray(snap["rgb_colors"]),
            jax.tree.map(lambda x: x[c], cams_stack), rcfg)
        psnrs.append(float(calc_psnr(out.im, jnp.asarray(ims_seq[t, c]))))
    cen_err = float(np.linalg.norm(xyz.mean(0) - gt_xyz[t].mean(0)))
    gt_step = (np.linalg.norm(gt_xyz[t].mean(0) - gt_xyz[0].mean(0))
               if t else 0.0)
    # motion-relative metric: apply the KNOWN analytic motion to the
    # tracked t=0 point set itself — the exact expected centroid for this
    # set (the raw centroid_err confounds set-sampling bias: the tracked
    # cloud is subsampled+densified, so its centroid differs from gt's)
    exp_xyz = motion(outputs[0]["means3D"][:n], t)
    motion_err = float(np.linalg.norm(xyz.mean(0) - exp_xyz.mean(0)))
    # per-point tracking error: the t>0 point set is FIXED (means move,
    # no resampling), so index i at time t corresponds to index i at t=0 —
    # compare against the analytic deformation of the tracked t=0 cloud
    per_pt = np.linalg.norm(xyz - exp_xyz, axis=1)
    report["per_t"].append({
        "t": t, "psnr": [round(p, 2) for p in psnrs],
        "centroid_err_m": round(cen_err, 5),
        "centroid_motion_err_m": round(motion_err, 5),
        "per_point_err_mean_m": round(float(per_pt.mean()), 5),
        "per_point_err_median_m": round(float(np.median(per_pt)), 5),
        "gt_centroid_motion_m": round(float(gt_step), 5),
        "n_pts": n,
    })
    print(f"[drive] t={t} psnr={[f'{p:.2f}' for p in psnrs]} "
          f"per-point err mean={per_pt.mean():.5f} med={np.median(per_pt):.5f} "
          f"centroid motion_err={motion_err:.5f} m (gt motion {gt_step:.5f})",
          flush=True)

with open(f"{OUT}/dynamic_tracking_report.json", "w") as f:
    json.dump(report, f, indent=1)
print("[drive] report -> benchmarks/out/dynamic_tracking_report.json",
      flush=True)
print("DRIVE_DYNAMIC_TRACKING OK", flush=True)
