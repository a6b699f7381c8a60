"""Does the compositor pay for dead tiles? Time the SAME live content on a
full 450-tile grid vs compacted live-first grids (the kernel already takes
tile_ids, so compaction is just row selection).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u benchmarks/probe_65k_gridsize.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.kernels.composite import (composite_tiles_pallas,
                                    composite_tiles_pallas_bwd)
from gsdx.render.binning import TileGrid, bin_gaussians_unsorted
from gsdx.render.projection import project_gaussians
from gsdx.render.rasterize import RasterizeConfig

H, W = 720, 1280
N = 65536
print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
means = rng.uniform(-0.8, 0.8, size=(N, 3)).astype(np.float32)
means[:, 2] = means[:, 2] * 0.5 + 3.0
quats = rng.normal(size=(N, 4)).astype(np.float32)
scales = rng.uniform(0.005, 0.02, size=(N, 3)).astype(np.float32)
opac = rng.uniform(0.2, 0.95, size=(N, 1)).astype(np.float32)
colors = rng.uniform(0, 1, size=(N, 3)).astype(np.float32)

cfg = RasterizeConfig()
cam = make_camera(
    np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32),
    np.eye(4, dtype=np.float32), width=W, height=H)
grid = TileGrid(height=H, width=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w)
proj = project_gaussians(jnp.asarray(means), jnp.asarray(quats),
                         jnp.asarray(scales), cam)
bins = bin_gaussians_unsorted(proj.mean2d, proj.radius, proj.depth, proj.mask,
                              grid, max_per_tile=cfg.max_per_tile,
                              max_dup=cfg.max_dup)
counts = np.asarray(bins.counts)
n_live = int((counts > 0).sum())
print(f"live tiles: {n_live}/{grid.num_tiles}, covers {counts.sum()}",
      flush=True)

feats = jnp.concatenate(
    [proj.mean2d, proj.conic, jnp.asarray(opac) * proj.mask[:, None],
     jnp.asarray(colors), proj.depth[:, None],
     jnp.zeros((N, 16 - 7 - 3), jnp.float32)], axis=-1)
tf_full = feats[bins.gauss_idx].transpose(0, 2, 1)  # (T, F, K)
order = np.argsort(np.where(counts > 0, 0, 1), kind="stable").astype(np.int32)

kw = dict(tiles_x=grid.tiles_x, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
          chunk=cfg.chunk, n_accum=4, presort=True, sub_chunk=128)


def make_run(cap):
    tf = jnp.asarray(np.asarray(tf_full)[order[:cap]])
    cnt = jnp.asarray(counts[order[:cap]])
    tid = jnp.asarray(order[:cap])
    ga = jnp.ones((cap, 4, cfg.tile_h * cfg.tile_w), jnp.float32) * 1e-3
    gl = jnp.zeros((cap, 1, cfg.tile_h * cfg.tile_w), jnp.float32)

    @jax.jit
    def run(tf, cnt, tid, ga, gl):
        def body(carry, _):
            tfp = tf + carry * 1e-12
            accum, logt, nproc, rank, sf = composite_tiles_pallas(
                tfp, cnt, tile_ids=tid, **kw)
            g = composite_tiles_pallas_bwd(
                sf, cnt, logt, ga, gl, nproc=nproc, rank=rank, tile_ids=tid,
                **kw)
            return g[0, 0, 0], accum[0, 0, 0]

        carry, outs = jax.lax.scan(body, 0.0, None, length=20)
        return carry, outs

    return run, (tf, cnt, tid, ga, gl)


for cap in (grid.num_tiles, 256, 128, n_live):
    run, a = make_run(cap)
    out = run(*a)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        out = run(*a)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 20)
    print(f"grid {cap:4d}: {best*1e3:.3f} ms/iter (fwd+bwd compositor only)",
          flush=True)
print("PROBE_GRIDSIZE OK", flush=True)
