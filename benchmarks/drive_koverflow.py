"""Quantify the nosort K-overflow approximation on a REAL dense scene
(VERDICT r2 next #3 / r3 next #5).

The "nosort" binning path keeps an approximately-nearest-K subset on tiles
whose cover count exceeds the per-tile capacity K (depth-bucket threshold,
`gsdx/render/binning.py`), where the CUDA reference keeps ALL covers
(`diff-gaussian-rasterization` dynamic memory). This drive measures what
that approximation does on real fits of the reference demo scene at TWO
densities:

  * production — the reference densify schedule (converges to ~12k live on
    this scene; the regime the tracker actually operates in);
  * stress — densify window extended to iter 9000 + softened prune via the
    DensifyConfig schedule knobs, saturating capacity (~63k live): every
    720p tile is deep in K-overflow.

For each fit, render all 4 training cameras at 720p with binning="sort"
(exact: true nearest-K by full depth order) vs "nosort", sweeping K and (for
the stress fit) the `depth_buckets` threshold resolution. Reported per
camera: max|pixel delta|, PSNR(nosort vs sort), and PSNR-vs-target delta.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 5400 python -u \
       benchmarks/drive_koverflow.py
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
from gsdx.core.gaussians import init_gaussian_params, init_tracking_variables
from gsdx.io.ply import load_ply
from gsdx.kernels.knn import knn
from gsdx.render.rasterize import RasterizeConfig, rasterize
from gsdx.track.densify import DensifyConfig
from gsdx.track.losses import calc_psnr
from gsdx.track.online import rt_to_w2c
from gsdx.track.optimizer import GroupAdam, tracking_lrs
from gsdx.track.trainer import (TrackingConfig, camera_order, compact_params,
                                make_fit_timestep)

ASSETS = "/root/reference/assets/demo"
H, W = 720, 1280
OUT = "benchmarks/out"
NUM_ITERS = 10000
os.makedirs(OUT, exist_ok=True)

# ---- Shared scene setup ------------------------------------------------------
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
h0, w0 = imgs[0].shape[:2]

w2cs = [rt_to_w2c(np.asarray(R), np.asarray(t)) for R, t in zip(R_list, t_list)]
cams = [make_camera(intr_list[c], w2cs[c], width=w0, height=h0, bg=(0, 0, 0),
                    cam_id=c) for c in range(4)]
cams_stack = jax.tree.map(lambda *x: jnp.stack(x), *cams)
ims = jnp.asarray(np.stack(
    [im.transpose(2, 0, 1) for im in imgs]))
segs = jnp.asarray(np.stack(
    [np.stack([m, np.zeros_like(m), 1.0 - m], 0) for m in masks]))

cloud = np.concatenate(
    [pts, cols if cols is not None else np.full_like(pts, 0.5),
     np.ones((len(pts), 1), np.float32)], axis=1)
d3, _ = knn(jnp.asarray(cloud[:, :3]), 3)
params0 = init_gaussian_params(cloud, np.asarray(d3).mean(-1), capacity=65536)
cam_centers = np.linalg.inv(np.stack(w2cs))[:, :3, 3]
scene_radius = float(1.1 * np.max(np.linalg.norm(
    cam_centers - cam_centers.mean(0, keepdims=True), axis=-1)))

sx, sy = W / w0, H / h0
k720 = []
for kmat in intr_list:
    k = np.array(kmat, np.float32).copy()
    k[0] *= sx
    k[1] *= sy
    k720.append(k)
cams720 = [make_camera(k720[c], w2cs[c], width=W, height=H, bg=(0, 0, 0),
                       cam_id=c) for c in range(4)]
tgt720 = jnp.asarray(np.stack([
    np.asarray(Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8))
               .resize((W, H), Image.BILINEAR)).astype(np.float32).transpose(2, 0, 1)
    / 255.0 for im in imgs]))


def fit_scene(dcfg: DensifyConfig, label: str):
    tcfg = TrackingConfig(iters_first=NUM_ITERS, densify=dcfg)
    adam = GroupAdam()
    variables = init_tracking_variables(params0.capacity, 20, scene_radius)
    opt_state = adam.init(params0)
    fit = make_fit_timestep(tcfg, is_initial=True, num_iters=NUM_ITERS)
    order = camera_order(NUM_ITERS, 4, np.random.default_rng(0))
    print(f"[koverflow] fit ({label}): capacity {params0.capacity}, "
          f"grad_thresh {dcfg.grad_thresh}, window "
          f"[{dcfg.start},{dcfg.end}]/{dcfg.interval}", flush=True)
    t0 = time.time()
    params, _, variables, logs = fit(
        params0, opt_state, variables, tracking_lrs(scene_radius), cams_stack,
        ims, segs, order, jax.random.PRNGKey(0))
    params, _ = compact_params(params, variables)
    n_live = int(np.asarray(params.live).sum())
    psnr = float(logs["psnr"][-1])
    print(f"[koverflow] fit ({label}) done in {time.time()-t0:.0f}s: "
          f"{n_live} live, psnr {psnr:.2f} dB", flush=True)
    return params, n_live, psnr


def render_sweep(params, n_live, sweep):
    """sweep: iterable of (K, depth_buckets). Pads N to an 8192 boundary with
    culled gaussians so rasterize compiles cache across fit densities."""
    live = np.asarray(params.live) > 0
    n_pad = -(-n_live // 8192) * 8192

    def padded(x, fill=0.0):
        x = np.asarray(x)[live]
        out = np.full((n_pad,) + x.shape[1:], fill, x.dtype)
        out[:n_live] = x
        return jnp.asarray(out)

    xyz = padded(params.means3d)
    rot = padded(params.unnorm_rotations)
    rot = rot.at[n_live:, 0].set(1.0)
    scl = jnp.exp(padded(params.log_scales, fill=-20.0))
    opa = jax.nn.sigmoid(padded(params.logit_opacities, fill=-20.0))
    rgb = padded(params.rgb_colors)

    rows = []
    for K, buckets in sweep:
        cfg_sort = RasterizeConfig(binning="sort", max_per_tile=K)
        cfg_nosort = RasterizeConfig(binning="nosort", max_per_tile=K,
                                     depth_buckets=buckets)
        for c in range(4):
            cam = cams720[c]
            im_s = np.asarray(rasterize(xyz, rot, scl, opa, rgb, cam,
                                        cfg_sort).im)
            im_n = np.asarray(rasterize(xyz, rot, scl, opa, rgb, cam,
                                        cfg_nosort).im)
            maxd = float(np.max(np.abs(im_s - im_n)))
            psnr_pair = float(calc_psnr(jnp.asarray(im_n), jnp.asarray(im_s)))
            p_s = float(calc_psnr(jnp.asarray(im_s), tgt720[c]))
            p_n = float(calc_psnr(jnp.asarray(im_n), tgt720[c]))
            row = {"K": K, "depth_buckets": buckets, "cam": c,
                   "max_abs_delta": round(maxd, 6),
                   "psnr_nosort_vs_sort": round(psnr_pair, 2),
                   "psnr_sort_vs_target": round(p_s, 3),
                   "psnr_nosort_vs_target": round(p_n, 3),
                   "psnr_delta": round(p_s - p_n, 4)}
            rows.append(row)
            print(f"[koverflow] {row}", flush=True)
    return rows


report = {}

# Production density: the reference densify schedule (`external.py:243-293`).
params, n_live, psnr = fit_scene(DensifyConfig(grad_thresh=0.0002 / 4),
                                 "production")
report["production"] = {"n_live": n_live, "fit_psnr": round(psnr, 2),
                        "renders": render_sweep(
                            params, n_live, [(512, 256), (1024, 256)])}

# Stress density: window extended + softened prune -> capacity-saturated.
params, n_live, psnr = fit_scene(
    DensifyConfig(grad_thresh=0.0002 / 64, interval=50, end=9000,
                  remove_thresh=0.001, remove_thresh_5k=0.005), "stress")
report["stress"] = {"n_live": n_live, "fit_psnr": round(psnr, 2),
                    "renders": render_sweep(
                        params, n_live,
                        [(512, 256), (1024, 256),
                         (512, 2048), (1024, 2048), (1024, 8192)])}

with open(f"{OUT}/koverflow_report.json", "w") as f:
    json.dump(report, f, indent=1)
print("[koverflow] report -> benchmarks/out/koverflow_report.json", flush=True)
print("DRIVE_KOVERFLOW OK", flush=True)
