"""Binning-internals breakdown (mask vs unsorted variants) at a given N.

Each variant is one jitted graph; subtract the ~1.05 ms dispatch floor.
Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/bench_binning_breakdown.py [N]
"""
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.binning import (
    TileGrid,
    bin_gaussians_mask,
    bin_gaussians_unsorted,
)
from gsdx.render.projection import project_gaussians
from gsdx.render.rasterize import RasterizeConfig

print("devices:", jax.devices(), flush=True)

H, W = 720, 1280
k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H)
cfg = RasterizeConfig()
grid = TileGrid(height=H, width=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w)

rng = np.random.default_rng(0)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
print("n =", n, flush=True)
means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
means[:, 2] = means[:, 2] * 0.5 + 3.0
quats = rng.normal(size=(n, 4)).astype(np.float32)
scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)

proj = project_gaussians(jnp.asarray(means), jnp.asarray(quats),
                         jnp.asarray(scales), cam)
M2 = jnp.asarray(np.asarray(proj.mean2d))
RAD = jnp.asarray(np.asarray(proj.radius))
DEP = jnp.asarray(np.asarray(proj.depth))
MSK = jnp.asarray(np.asarray(proj.mask))
K, DUP = cfg.max_per_tile, cfg.max_dup


def bench(fn, label, iters=30):
    out = fn(M2, RAD, DEP, MSK)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(M2, RAD, DEP, MSK)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(M2, RAD, DEP, MSK)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:52s} {dt:8.3f} ms", flush=True)


triv = jax.jit(lambda a, b, c, d: a.sum() + b.sum() + c.sum() + d.sum())

variants = {
    "floor (sums only)": triv,
    "mask full (csum flat)": jax.jit(lambda m, r, d, s: jax.tree.leaves(
        bin_gaussians_mask(m, r, d, s, grid, K, DUP, with_gauss_idx=False))),
    "mask full (csum tiered)": jax.jit(lambda m, r, d, s: jax.tree.leaves(
        bin_gaussians_mask(m, r, d, s, grid, K, DUP, with_gauss_idx=False,
                           pos_method="csum_tiered"))),
    "mask no-inverse (csum flat)": jax.jit(lambda m, r, d, s: jax.tree.leaves(
        bin_gaussians_mask(m, r, d, s, grid, K, DUP, with_inverse=False,
                           with_gauss_idx=False, pos_method="csum"))),
    "mask no-inverse (csum tiered)": jax.jit(lambda m, r, d, s: jax.tree.leaves(
        bin_gaussians_mask(m, r, d, s, grid, K, DUP, with_inverse=False,
                           with_gauss_idx=False, pos_method="csum_tiered"))),
    "unsorted no-inv, buckets=256": jax.jit(lambda m, r, d, s: jax.tree.leaves(
        bin_gaussians_unsorted(m, r, d, s, grid, K, DUP))),
    "unsorted no-inv, buckets=0": jax.jit(lambda m, r, d, s: jax.tree.leaves(
        bin_gaussians_unsorted(m, r, d, s, grid, K, DUP, depth_buckets=0))),
    "unsorted +inverse, buckets=256": jax.jit(lambda m, r, d, s: jax.tree.leaves(
        bin_gaussians_unsorted(m, r, d, s, grid, K, DUP, with_inverse=True))),
    "unsorted +inverse, buckets=0": jax.jit(lambda m, r, d, s: jax.tree.leaves(
        bin_gaussians_unsorted(m, r, d, s, grid, K, DUP, with_inverse=True,
                               depth_buckets=0))),
    "argsort+permute only": jax.jit(lambda m, r, d, s: (
        m[jnp.argsort(jnp.where(s, d, jnp.inf))].sum())),
}

for rep in (1, 2):
    for label, fn in variants.items():
        bench(fn, f"{label} r{rep}")
print("BREAKDOWN OK", flush=True)
