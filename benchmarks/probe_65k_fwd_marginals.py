"""65k forward-cost decomposition (scan-amortized, frozen bins).

fwd_full    — rasterize forward, loss on image (no grads)
to_feats    — stop at the gathered tile_feats (proj + feats + gather, no
              compositor, no assembly)
to_proj     — projection only (loss on proj outputs)

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u benchmarks/probe_65k_fwd_marginals.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.projection import project_gaussians
from gsdx.render.rasterize import (RasterizeConfig, _take_rows, compute_bins,
                                   rasterize)

H, W = 720, 1280
N = 65536
SCAN = 20

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
means = rng.uniform(-0.8, 0.8, size=(N, 3)).astype(np.float32)
means[:, 2] = means[:, 2] * 0.5 + 3.0
quats = rng.normal(size=(N, 4)).astype(np.float32)
scales = rng.uniform(0.005, 0.02, size=(N, 3)).astype(np.float32)
opac = rng.uniform(0.2, 0.95, size=(N, 1)).astype(np.float32)
colors = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)
args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
target = jnp.zeros((3, H, W))

k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))
cfg = RasterizeConfig()


def make(mode):
    @jax.jit
    def scan_steps(args):
        bins = compute_bins(args[0], args[1], args[2], cam, cfg,
                            margin_px=4.0)

        def body(carry, _):
            a0 = args[0] + carry * 1e-12
            if mode == "fwd_full":
                out = rasterize(a0, *args[1:], cam, cfg, bins=bins)
                v = jnp.abs(out.im - target).mean()
            elif mode == "to_feats":
                proj = project_gaussians(a0, args[1], args[2], cam)
                feats = jnp.concatenate(
                    [proj.mean2d, proj.conic,
                     args[3].reshape(N, 1) * proj.mask[:, None], args[4],
                     proj.depth[:, None],
                     jnp.zeros((N, 16 - 7 - 3), jnp.float32)], axis=-1)
                tf = _take_rows(feats, bins.gauss_idx)
                v = tf.mean()
            elif mode == "to_feats_T":
                proj = project_gaussians(a0, args[1], args[2], cam)
                feats = jnp.concatenate(
                    [proj.mean2d, proj.conic,
                     args[3].reshape(N, 1) * proj.mask[:, None], args[4],
                     proj.depth[:, None],
                     jnp.zeros((N, 16 - 7 - 3), jnp.float32)], axis=-1)
                tf = _take_rows(feats, bins.gauss_idx).transpose(0, 2, 1)
                v = tf.mean()
            elif mode == "to_proj":
                proj = project_gaussians(a0, args[1], args[2], cam)
                v = proj.mean2d.mean() + proj.conic.mean() + proj.depth.mean()
            else:  # floor
                v = a0.mean()
            return v, v

        carry, outs = jax.lax.scan(body, 0.0, None, length=SCAN)
        return carry, outs

    return scan_steps


variants = ["fwd_full", "to_feats", "to_feats_T", "to_proj", "floor"]
fns = {m: make(m) for m in variants}
for m in variants:
    t0 = time.perf_counter()
    out = fns[m](args)
    jax.block_until_ready(out)
    print(f"[compile] {m}: {time.perf_counter()-t0:.1f}s", flush=True)
times = {m: [] for m in variants}
for r in range(3):
    for m in variants:
        t0 = time.perf_counter()
        for i in range(3):
            out = fns[m](args)
        jax.block_until_ready(out)
        times[m].append((time.perf_counter() - t0) / (3 * SCAN))
for m in variants:
    ts = np.array(times[m]) * 1e3
    print(f"{m:10s}: {ts.min():.3f} ms/iter (med {np.median(ts):.3f})",
          flush=True)
print("PROBE_65K_FWD OK", flush=True)
