"""Marginal-cost profile of the 5k/720p fwd+bwd headline (mask path).

Full-graph A/B deltas (the only timing methodology that reproduces on this
box): each variant is a complete jitted value_and_grad graph; stage costs
are DIFFERENCES between variants, with precomputed bins passed as traced
inputs (closure-captured constants get folded and measure free).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/profile_margins_5k.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.binning import TileGrid, bin_gaussians_mask
from gsdx.render.projection import project_gaussians
from gsdx.render.rasterize import RasterizeConfig, rasterize

print("devices:", jax.devices(), flush=True)

H, W = 720, 1280
k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))
cfg = RasterizeConfig(binning="mask")
grid = TileGrid(height=H, width=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w)

rng = np.random.default_rng(0)
n = 5000
means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
means[:, 2] = means[:, 2] * 0.5 + 3.0
quats = rng.normal(size=(n, 4)).astype(np.float32)
scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
target = jnp.zeros((3, H, W))


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
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:8.3f} ms", flush=True)
    return dt


# precomputed bins as host arrays -> traced inputs
proj = project_gaussians(*args[:3], cam)
BINS = bin_gaussians_mask(
    jax.lax.stop_gradient(proj.mean2d), jax.lax.stop_gradient(proj.radius),
    jax.lax.stop_gradient(proj.depth), proj.mask, grid,
    max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup, with_gauss_idx=False,
)
BINS = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), BINS)


def loss_full(*a):
    out = rasterize(*a, cam, cfg)
    return jnp.abs(out.im - target).mean()


def loss_nobin(bins, *a):
    out = rasterize(*a, cam, cfg, bins=bins)
    return jnp.abs(out.im - target).mean()


v_full = jax.jit(jax.value_and_grad(loss_full, argnums=(0, 1, 2, 3, 4)))
v_nobin = jax.jit(jax.value_and_grad(loss_nobin, argnums=(1, 2, 3, 4, 5)))
f_full = jax.jit(loss_full)
f_nobin = jax.jit(loss_nobin)

# sanity: same loss
l1 = float(v_full(*args)[0])
l2 = float(v_nobin(BINS, *args)[0])
print(f"loss full {l1:.6f} nobin {l2:.6f}", flush=True)
assert abs(l1 - l2) < 1e-6

# compositor-only graphs: traced tile_feats in, custom-vjp kernels inside
from gsdx.render.rasterize import _composite

TF = jnp.asarray(np.asarray(
    jax.jit(lambda bins, *a: rasterize(*a, cam, cfg, bins=bins).im)(
        BINS, *args) * 0
))  # warm nothing; build tile_feats directly below
feats_host = np.zeros((grid.num_tiles, 16, cfg.max_per_tile), np.float32)
rng2 = np.random.default_rng(1)
feats_host[:, 5] = rng2.uniform(0.0, 0.3, feats_host[:, 5].shape)  # opacity
feats_host[:, 2] = 0.05
feats_host[:, 4] = 0.05
feats_host[:, 0] = rng2.uniform(0, W, feats_host[:, 0].shape)
feats_host[:, 1] = rng2.uniform(0, H, feats_host[:, 1].shape)
TF = jnp.asarray(feats_host)
CTS = jnp.asarray(np.asarray(BINS.counts))


def comp_loss(tf):
    accum, logt = _composite(tf, CTS, grid, cfg, 4)
    return jnp.abs(accum).mean() + jnp.abs(logt).mean()


c_fwd = jax.jit(comp_loss)
c_bwd = jax.jit(jax.value_and_grad(comp_loss))

# dispatch floor: a trivial graph in the same timing loop
triv = jax.jit(lambda x: x * 2.0 + 1.0)
tiny = jnp.ones((8, 128))

for rep in (1, 2):
    bench(triv, (tiny,), f"trivial dispatch floor r{rep}")
    bench(c_fwd, (TF,), f"compositor-only fwd r{rep}")
    bench(c_bwd, (TF,), f"compositor-only fwd+bwd r{rep}")
    t_full = bench(v_full, args, f"fwd+bwd full r{rep}")
    t_nobin = bench(v_nobin, (BINS,) + args, f"fwd+bwd bins-precomputed r{rep}")
    tf_full = bench(f_full, args, f"fwd-only full r{rep}")
    tf_nobin = bench(f_nobin, (BINS,) + args, f"fwd-only bins-precomputed r{rep}")
    print(f"  => binning marginal (fwd+bwd graph): {t_full - t_nobin:6.3f} ms",
          flush=True)
    print(f"  => binning marginal (fwd graph):     {tf_full - tf_nobin:6.3f} ms",
          flush=True)
    print(f"  => backward marginal (no binning):   {t_nobin - tf_nobin:6.3f} ms",
          flush=True)

print("MARGINS OK", flush=True)
