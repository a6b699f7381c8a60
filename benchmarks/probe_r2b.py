"""Round-2b probes: empty-tile compositor overhead + binning phase-1 fusion.

Within-session interleaved A/B (the only timing methodology that reproduces
on this box — see CLAUDE.md). Questions:

  P1  compositor bwd cost with counts == 0 everywhere (empty-tile floor):
      if the 450-step grid itself costs ~2 ms, compacting live tiles to the
      front and running a half-grid + cond-gated tail is the win.
  P2  same for the forward.
  P3  binning: current two-reduction phase 1 (blk + cnt_before each reduce
      the (T, NB, K) compare) vs one stacked reduce.
  P4  full binning at 16k and 65k for scale context.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/probe_r2b.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.binning import TileGrid, bin_gaussians_unsorted
from gsdx.render.projection import project_gaussians
from gsdx.render.rasterize import RasterizeConfig
from gsdx.kernels.composite import (
    composite_tiles_pallas, composite_tiles_pallas_bwd)

print("devices:", jax.devices(), flush=True)

H, W = 720, 1280
k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))
cfg = RasterizeConfig(binning="nosort")
grid = TileGrid(height=H, width=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w)
T = grid.num_tiles
K = cfg.max_per_tile
P = cfg.tile_h * cfg.tile_w


def scene(n):
    rng = np.random.default_rng(0)
    means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    means[:, 2] = means[:, 2] * 0.5 + 3.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, quats, scales))


def bench(fn, inputs, label, iters=20):
    # Every benched fn takes a leading `eps` scalar folded into its first
    # float input: a fresh value per call defeats this box's duplicate-
    # dispatch result cache (CLAUDE.md: repeated identical calls can return
    # fake-fast cached results — measured 90912 "iters/s").
    out = fn(jnp.float32(0.0), *inputs)
    jax.block_until_ready(out)
    for i in range(1, 4):
        out = fn(jnp.float32(i * 1e-30), *inputs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(jnp.float32((100 + i) * 1e-30), *inputs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:48s} {dt:8.3f} ms", flush=True)
    return dt


N = 65536
means, quats, scales = scene(N)
proj = project_gaussians(means, quats, scales, cam)
BINS = bin_gaussians_unsorted(
    jax.lax.stop_gradient(proj.mean2d), jax.lax.stop_gradient(proj.radius),
    jax.lax.stop_gradient(proj.depth), proj.mask, grid,
    max_per_tile=K, max_dup=cfg.max_dup,
)
rng = np.random.default_rng(1)
FEATS = jnp.asarray(rng.uniform(0, 1, size=(N, 16)).astype(np.float32))
TF = jnp.asarray(np.asarray(FEATS[BINS.gauss_idx].transpose(0, 2, 1)))
CTS = jnp.asarray(np.asarray(BINS.counts))
ZCTS = jnp.zeros_like(CTS)
print("live tiles:", int((np.asarray(CTS) > 0).sum()), "/", T, flush=True)

kw = dict(tiles_x=grid.tiles_x, tile_h=grid.tile_h, tile_w=grid.tile_w,
          chunk=cfg.chunk, n_accum=4, sub_chunk=128, presort=True)


def fwd(eps, tf, cts):
    return composite_tiles_pallas(tf + eps, cts, early_stop=True, **kw)


def fwdbwd(eps, tf, cts):
    accum, logt, nproc, rank, sfeats = composite_tiles_pallas(
        tf + eps, cts, early_stop=True, **kw)
    g = composite_tiles_pallas_bwd(
        sfeats, cts, logt, accum * 1e-3, logt * 1e-3, nproc=nproc, rank=rank,
        **kw)
    return g


j_fwd = jax.jit(fwd)
j_fb = jax.jit(fwdbwd)

for rep in (1, 2):
    bench(j_fwd, (TF, CTS), f"P2 fwd real counts r{rep}")
    bench(j_fwd, (TF, ZCTS), f"P2 fwd ZERO counts r{rep}")
    bench(j_fb, (TF, CTS), f"P1 fwd+bwd real counts r{rep}")
    bench(j_fb, (TF, ZCTS), f"P1 fwd+bwd ZERO counts r{rep}")

# ---- P3: binning phase-1 fusion --------------------------------------------
from gsdx.render.binning import _bbox_tiles


def bin_current(eps, mean2d, radius, depth, mask):
    return bin_gaussians_unsorted(mean2d + eps, radius, depth, mask, grid,
                                  max_per_tile=K, max_dup=cfg.max_dup)


def phase1_two(eps, cnt_cum, cnt):
    cnt_cum = cnt_cum + eps
    tgt = jnp.arange(1, K + 1, dtype=jnp.float32)
    lt = cnt_cum[:, :, None] < tgt[None, None, :]
    blk = lt.astype(jnp.float32).sum(axis=1).astype(jnp.int32)
    cnt_before = (cnt[:, :, None] * lt).sum(axis=1)
    return blk, cnt_before


def phase1_stacked(eps, cnt_cum, cnt):
    cnt_cum = cnt_cum + eps
    tgt = jnp.arange(1, K + 1, dtype=jnp.float32)
    lt = cnt_cum[:, :, None, None] < tgt[None, None, :, None]  # (T,NB,K,1)
    vals = jnp.stack(
        [jnp.ones_like(cnt), cnt], axis=-1)[:, :, None, :]  # (T,NB,1,2)
    both = (lt.astype(jnp.float32) * vals).sum(axis=1)  # (T,K,2)
    return both[..., 0].astype(jnp.int32), both[..., 1]


def phase1_mxu(eps, cnt_cum, cnt):
    cnt_cum = cnt_cum + eps
    # lt as bf16 (exact 0/1), reduce over NB with one batched MXU matmul
    tgt = jnp.arange(1, K + 1, dtype=jnp.float32)
    lt = (cnt_cum[:, :, None] < tgt[None, None, :]).astype(jnp.bfloat16)
    vals = jnp.stack([jnp.ones_like(cnt), cnt], axis=-1)  # (T, NB, 2)
    both = jnp.einsum("tnk,tnv->tkv", lt, vals.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    return both[..., 0].astype(jnp.int32), both[..., 1]


MEAN2D = jax.lax.stop_gradient(proj.mean2d)
RAD = jax.lax.stop_gradient(proj.radius)
DEP = jax.lax.stop_gradient(proj.depth)
MSK = proj.mask

x0, y0, x1, y1 = _bbox_tiles(MEAN2D, RAD, grid)
CNT = jnp.asarray(
    np.random.default_rng(2).integers(0, 129, size=(T, 512)).astype(np.float32))
CNT_CUM = jnp.cumsum(CNT, axis=1)

p1_two = jax.jit(phase1_two)
p1_st = jax.jit(phase1_stacked)
p1_mx = jax.jit(phase1_mxu)
b_cur = jax.jit(bin_current)

z = jnp.float32(0.0)
a = p1_two(z, CNT_CUM, CNT)
b = p1_st(z, CNT_CUM, CNT)
c = p1_mx(z, CNT_CUM, CNT)
print("phase1 agree two/stacked:",
      bool(jnp.all(a[0] == b[0])), bool(jnp.all(a[1] == b[1])),
      "two/mxu:", bool(jnp.all(a[0] == c[0])), bool(jnp.all(a[1] == c[1])),
      flush=True)

for rep in (1, 2):
    bench(p1_two, (CNT_CUM, CNT), f"P3 phase1 two-reduce r{rep}")
    bench(p1_st, (CNT_CUM, CNT), f"P3 phase1 stacked r{rep}")
    bench(p1_mx, (CNT_CUM, CNT), f"P3 phase1 mxu r{rep}")
    bench(b_cur, (MEAN2D, RAD, DEP, MSK), f"P4 binning full 65k r{rep}")

print("PROBE_R2B OK", flush=True)
