"""Progressive-cut breakdown of bin_gaussians_unsorted at 65k and 16k.

Jit each prefix of the pipeline and difference the timings (one process,
interleaved). Stages:
  s1  bbox + (T, N) cover compare + count reduce (no materialized cover use)
  s2  + depth-bucket histogram einsum + threshold + filtered cover
  s3  + inc3 triangular matmul + cnt_cum + counts
  s4  + phase 1 (two-reduce compare-sum)
  s5  + phase 2 (u8 row gather + posb) == full binner output

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/probe_binning_breakdown2.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.binning import TileGrid, _bbox_tiles
from gsdx.render.projection import project_gaussians
from gsdx.render.rasterize import RasterizeConfig

print("devices:", jax.devices(), flush=True)

H, W = 720, 1280
k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))
cfg = RasterizeConfig(binning="nosort")
grid = TileGrid(height=H, width=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w)
T = grid.num_tiles
tx = grid.tiles_x
K = cfg.max_per_tile
max_dup = cfg.max_dup
D = 256
B = 128


def stage(mean2d, radius, depth, mask, jit_eps, upto: int):
    mean2d = mean2d + jit_eps * 1e-12
    n = mean2d.shape[0]
    npad = -(-n // B) * B
    NB = npad // B
    x0, y0, x1, y1 = _bbox_tiles(mean2d, radius, grid)
    bw = jnp.maximum(x1 - x0, 0)

    txi = jnp.asarray(np.arange(T, dtype=np.int32) % tx)[:, None]
    tyi = jnp.asarray(np.arange(T, dtype=np.int32) // tx)[:, None]
    inb = ((txi >= x0[None]) & (txi < x1[None])
           & (tyi >= y0[None]) & (tyi < y1[None]))
    lin = (tyi - y0[None]) * bw[None] + (txi - x0[None])
    cover_b = inb & (lin < max_dup) & mask[None]
    if upto == 1:
        return cover_b.sum(axis=1, dtype=jnp.int32)

    dmin = jnp.min(jnp.where(mask, depth, jnp.inf))
    dmax = jnp.max(jnp.where(mask, depth, -jnp.inf))
    scale = jnp.maximum(dmax - dmin, 1e-20)
    bucket = jnp.clip(((depth - dmin) / scale * D).astype(jnp.int32), 0, D - 1)
    oneh = (bucket[:, None]
            == jnp.arange(D, dtype=jnp.int32)[None, :]).astype(jnp.bfloat16)
    hist = jnp.einsum("tn,nd->td", cover_b.astype(jnp.bfloat16), oneh,
                      preferred_element_type=jnp.float32)
    cum = jnp.cumsum(hist, axis=1)
    thr = jnp.sum((cum < K).astype(jnp.int32), axis=1)
    cover_b = cover_b & (bucket[None, :] <= thr[:, None])
    if upto == 2:
        return cover_b.sum(axis=1, dtype=jnp.int32)

    cover = cover_b.astype(jnp.bfloat16)
    cover = jnp.pad(cover, ((0, 0), (0, npad - n)))
    cov3 = cover.reshape(T, NB, B)
    row = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tri = (row <= col).astype(jnp.bfloat16)
    inc3 = jnp.einsum("tbi,ij->tbj", cov3, tri,
                      preferred_element_type=jnp.bfloat16)
    cnt = inc3[:, :, -1].astype(jnp.float32)
    cnt_cum = jnp.cumsum(cnt, axis=1)
    counts = jnp.minimum(cnt_cum[:, -1], K).astype(jnp.int32)
    inc8 = inc3.astype(jnp.uint8)
    if upto == 3:
        return counts, inc8.sum(dtype=jnp.int32)

    tgt = jnp.arange(1, K + 1, dtype=jnp.float32)
    lt = cnt_cum[:, :, None] < tgt[None, None, :]
    blk = lt.astype(jnp.float32).sum(axis=1).astype(jnp.int32)
    cnt_before = (cnt[:, :, None] * lt).sum(axis=1)
    blk_c = jnp.minimum(blk, NB - 1)
    if upto == 4:
        return counts, blk_c.sum(), cnt_before.sum()

    rows = jnp.take_along_axis(inc8, blk_c[:, :, None], axis=1)
    jloc = jnp.clip(tgt[None, :] - cnt_before, 0.0, 255.0).astype(jnp.uint8)
    posb = (rows < jloc[:, :, None]).sum(axis=2, dtype=jnp.int32)
    pos = jnp.clip(blk_c * B + posb, 0, n - 1).astype(jnp.int32)
    return counts, pos


def bench(fn, inputs, label, iters=20):
    # fresh jitter scalar per call: repeated identical calls on this box can
    # return cached results instantly (CLAUDE.md), so perturb every call.
    out = fn(*inputs, jnp.float32(-1.0))
    jax.block_until_ready(out)
    for w in range(3):
        out = fn(*inputs, jnp.float32(-2.0 - w))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*inputs, jnp.float32(i))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:8.3f} ms", flush=True)
    return dt


for n in (16384, 65536):
    rng = np.random.default_rng(0)
    means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    means[:, 2] = means[:, 2] * 0.5 + 3.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
    proj = project_gaussians(*(jnp.asarray(x) for x in (means, quats, scales)),
                             cam)
    args = (jax.lax.stop_gradient(proj.mean2d),
            jax.lax.stop_gradient(proj.radius),
            jax.lax.stop_gradient(proj.depth), proj.mask)
    fns = {u: jax.jit(lambda m, r, d, msk, e, u=u: stage(m, r, d, msk, e, u))
           for u in (1, 2, 3, 4, 5)}
    for rep in (1, 2):
        for u in (1, 2, 3, 4, 5):
            bench(fns[u], args, f"n={n} upto s{u} r{rep}")

print("BREAKDOWN2 OK", flush=True)
