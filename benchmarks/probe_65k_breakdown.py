"""Fresh 65k scan-amortized cost decomposition (VERDICT r3 next #3).

Interleaved A/B in ONE process (the only timing methodology that reproduces
on this box): 20-step scan with frozen bins at N=65536, 720p, variants:

  full       — the bench headline step (value_and_grad, scatter routing)
  fwd_only   — no grad at all (scan of forward losses)
  no_bwd     — stop_gradient(tile_feats): fwd + trivial loss bwd only
               (isolation: full - no_bwd = compositor bwd + routing + proj bwd)
  invmap     — force the inverse-map gather-only backward at 65k, with the
               map built ONCE per block alongside the frozen bins (the
               VERDICT-suggested amortization)
  live_gather— compact the forward gather + scatter to live tiles only

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u benchmarks/probe_65k_breakdown.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.binning import bin_gaussians_unsorted
from gsdx.render.projection import project_gaussians
from gsdx.render.rasterize import RasterizeConfig, compute_bins, rasterize

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


def make_scan(mode):
    def loss(means3d, *rest, bins):
        out = rasterize(means3d, *rest, cam, cfg, bins=bins)
        return jnp.abs(out.im - target).mean()

    @jax.jit
    def scan_steps(args):
        with_inv = mode == "invmap"
        if with_inv:
            # frozen-bin block build INCLUDING the inverse map (amortized)
            from gsdx.render.binning import TileGrid
            grid = TileGrid(height=cam.height, width=cam.width,
                            tile_h=cfg.tile_h, tile_w=cfg.tile_w)
            pr = project_gaussians(args[0], args[1], args[2], cam)
            radius = jnp.where(pr.radius > 0, pr.radius + 4.0, pr.radius)
            bins = bin_gaussians_unsorted(
                jax.lax.stop_gradient(pr.mean2d),
                jax.lax.stop_gradient(radius),
                jax.lax.stop_gradient(pr.depth), pr.mask, grid,
                max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup,
                with_inverse=True)
        else:
            bins = compute_bins(args[0], args[1], args[2], cam, cfg,
                                margin_px=4.0)

        def body(carry, _):
            a0 = args[0] + carry * 1e-12
            if mode == "fwd_only":
                v = loss(a0, *args[1:], bins=bins)
                return v, v
            if mode == "no_bwd":
                import gsdx.render.rasterize as rz
                # stop gradients into the compositor path: loss on a
                # detached forward
                v = loss(jax.lax.stop_gradient(a0),
                         *[jax.lax.stop_gradient(x) for x in args[1:]],
                         bins=bins)
                g = a0[0, 0] * 0.0
                return v + g, v
            v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                a0, *args[1:], bins=bins)
            return v, g[0][0, 0]

        carry, outs = jax.lax.scan(body, 0.0, None, length=SCAN)
        return carry, outs

    return scan_steps


variants = ["full", "fwd_only", "no_bwd", "invmap"]
fns = {m: make_scan(m) for m in variants}
# compile all first
for m in variants:
    t0 = time.perf_counter()
    out = fns[m](args)
    jax.block_until_ready(out)
    print(f"[compile] {m}: {time.perf_counter()-t0:.1f}s", flush=True)

# interleaved timing, 3 rounds
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
    mpix = H * W / (ts.min() / 1e3) / 1e6
    print(f"{m:10s}: {ts.min():.3f} ms/iter (med {np.median(ts):.3f}) "
          f"= {mpix:.1f} Mpix/s", flush=True)
print("PROBE_65K OK", flush=True)
