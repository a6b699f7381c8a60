"""Stage-by-stage timing of the rasterizer fwd+bwd on the real TPU."""
import time
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
from gsdx.core.cameras import make_camera
from gsdx.render.rasterize import (
    RasterizeConfig, rasterize, _take_rows, FEAT_DIM,
)
from gsdx.render.binning import TileGrid, bin_gaussians
from gsdx.render.projection import project_gaussians
from gsdx.kernels.composite import (
    composite_tiles_pallas, composite_tiles_pallas_bwd,
)

print("devices:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
n = 5000
means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
means[:, 2] = means[:, 2] * 0.5 + 3.0
quats = rng.normal(size=(n, 4)).astype(np.float32)
scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)

H, W = 720, 1280
k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))
cfg = RasterizeConfig()
args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
target = jnp.zeros((3, H, W))
grid = TileGrid(height=H, width=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w)


def bench(fn, inputs, label, iters=30):
    out = fn(*inputs)
    jax.block_until_ready(out)
    for _ in range(3):
        out = fn(*inputs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*inputs)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:28s} {dt*1e3:7.3f} ms", flush=True)
    return out


# 1. projection fwd
proj_fn = jax.jit(lambda m, q, s: project_gaussians(m, q, s, cam))
proj = bench(proj_fn, (args[0], args[1], args[2]), "projection fwd")

# 2. binning
bin_fn = jax.jit(lambda m2, r, d, msk: bin_gaussians(
    m2, r, d, msk, grid, max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup))
bins = bench(bin_fn, (proj.mean2d, proj.radius, proj.depth, proj.mask),
             "binning (sort+searchsorted)")


# 3. feats assemble + gather + transpose
def gather_fn(mean2d, conic, op, col, depth, msk, gidx):
    feats = jnp.concatenate([
        mean2d, conic, op.reshape(n, 1) * msk[:, None], col,
        depth[:, None], jnp.zeros((n, FEAT_DIM - 7 - col.shape[1]),
                                  mean2d.dtype)], axis=-1)
    tf = _take_rows(feats, gidx)
    return tf.transpose(0, 2, 1)


gather_jit = jax.jit(gather_fn)
tile_feats = bench(
    gather_jit,
    (proj.mean2d, proj.conic, args[3], args[4], proj.depth, proj.mask,
     bins.gauss_idx),
    "feats+gather+transpose")

# 4. composite fwd pallas
comp_fn = jax.jit(lambda tf, c: composite_tiles_pallas(
    tf, c, tiles_x=grid.tiles_x, tile_h=cfg.tile_h, tile_w=cfg.tile_w,
    chunk=cfg.chunk, n_accum=4, sub_chunk=cfg.sub_chunk))
accum, logt = bench(comp_fn, (tile_feats, bins.counts), "composite fwd (pallas)")

# 5. composite bwd pallas
g_accum = jnp.ones_like(accum)
g_logt = jnp.ones_like(logt)
bwd_fn = jax.jit(lambda tf, c, lt, ga, gl: composite_tiles_pallas_bwd(
    tf, c, lt, ga, gl, tiles_x=grid.tiles_x, tile_h=cfg.tile_h,
    tile_w=cfg.tile_w, chunk=cfg.chunk, n_accum=4, sub_chunk=cfg.sub_chunk))
bench(bwd_fn, (tile_feats, bins.counts, logt, g_accum, g_logt),
      "composite bwd (pallas)")


# 6. scatter-add bwd of the gather
def scat_fn(g, gidx):
    return jnp.zeros((n, FEAT_DIM), g.dtype).at[gidx].add(g)


g_tf = tile_feats.transpose(0, 2, 1)
bench(jax.jit(scat_fn), (g_tf, bins.gauss_idx), "gather bwd (scatter-add)")

# 7. full fwd only
full_fwd = jax.jit(lambda *a: rasterize(*a, cam, cfg).im.mean())
bench(full_fwd, args, "full fwd")


# 8. full fwd+bwd
def loss(*a):
    out = rasterize(*a, cam, cfg)
    return jnp.abs(out.im - target).mean()


step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
bench(step, args, "full fwd+bwd")

print("PROFILE OK", flush=True)
