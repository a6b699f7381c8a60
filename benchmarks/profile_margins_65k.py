"""Marginal-cost profile of the 65k/720p fwd+bwd path (nosort regime).

Full-graph A/B deltas interleaved in one process (see profile_margins_5k.py
for why). Isolates: binning, compositor fwd / fwd+bwd (presort, near-full
counts), the T*K scatter-add backward of `_take_rows`, and projection.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/profile_margins_65k.py
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
from gsdx.render.rasterize import RasterizeConfig, _composite, _take_rows, rasterize

print("devices:", jax.devices(), flush=True)

H, W = 720, 1280
k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))
cfg = RasterizeConfig(binning="nosort")
grid = TileGrid(height=H, width=W, tile_h=cfg.tile_h, tile_w=cfg.tile_w)

rng = np.random.default_rng(0)
n = 65536
means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
means[:, 2] = means[:, 2] * 0.5 + 3.0
quats = rng.normal(size=(n, 4)).astype(np.float32)
scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
args = tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))
target = jnp.zeros((3, H, W))


def bench(fn, inputs, label, iters=20):
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


proj = project_gaussians(*args[:3], cam)
BINS = bin_gaussians_unsorted(
    jax.lax.stop_gradient(proj.mean2d), jax.lax.stop_gradient(proj.radius),
    jax.lax.stop_gradient(proj.depth), proj.mask, grid,
    max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup,
)
BINS = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), BINS)
print("counts: mean %.0f  p50 %.0f  p90 %.0f  max %d  full-tiles %d/%d"
      % (np.asarray(BINS.counts).mean(), np.percentile(np.asarray(BINS.counts), 50),
         np.percentile(np.asarray(BINS.counts), 90), np.asarray(BINS.counts).max(),
         (np.asarray(BINS.counts) >= cfg.max_per_tile).sum(), grid.num_tiles),
      flush=True)


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

l1 = float(v_full(*args)[0])
l2 = float(v_nobin(BINS, *args)[0])
print(f"loss full {l1:.6f} nobin {l2:.6f}", flush=True)

# compositor-only: REAL near-full tile_feats from the production bins
FEATS = jnp.concatenate(
    [
        proj.mean2d, proj.conic,
        jnp.asarray(opac[:, 0])[:, None] * proj.mask[:, None],
        jnp.asarray(colors), proj.depth[:, None],
        jnp.zeros((n, 16 - 7 - 3), jnp.float32),
    ], axis=-1,
)
TF = jnp.asarray(np.asarray(FEATS[BINS.gauss_idx].transpose(0, 2, 1)))
CTS = jnp.asarray(np.asarray(BINS.counts))


def comp_loss(tf):
    accum, logt = _composite(tf, CTS, grid, cfg, 4)
    return jnp.abs(accum).mean() + jnp.abs(logt).mean()


c_fwd = jax.jit(comp_loss)
c_bwd = jax.jit(jax.value_and_grad(comp_loss))

# the T*K scatter-add backward in isolation
IDX = jnp.asarray(np.asarray(BINS.gauss_idx))


def gather_loss(f):
    return _take_rows(f, IDX).sum()


g_fwd = jax.jit(gather_loss)
g_bwd = jax.jit(jax.value_and_grad(gather_loss))

# projection fwd+bwd in isolation
def proj_loss(m, q, s):
    p = project_gaussians(m, q, s, cam)
    return p.mean2d.sum() + p.conic.sum() + p.depth.sum()


p_bwd = jax.jit(jax.value_and_grad(proj_loss, argnums=(0, 1, 2)))

triv = jax.jit(lambda x: x * 2.0 + 1.0)
tiny = jnp.ones((8, 128))

for rep in (1, 2):
    bench(triv, (tiny,), f"trivial dispatch floor r{rep}")
    bench(c_fwd, (TF,), f"compositor-only fwd r{rep}")
    bench(c_bwd, (TF,), f"compositor-only fwd+bwd r{rep}")
    bench(g_fwd, (FEATS,), f"take_rows fwd r{rep}")
    bench(g_bwd, (FEATS,), f"take_rows fwd+scatter-bwd r{rep}")
    bench(p_bwd, args[:3], f"projection fwd+bwd r{rep}")
    t_full = bench(v_full, args, f"fwd+bwd full r{rep}")
    t_nobin = bench(v_nobin, (BINS,) + args, f"fwd+bwd bins-precomputed r{rep}")
    tf_full = bench(f_full, args, f"fwd-only full r{rep}")
    tf_nobin = bench(f_nobin, (BINS,) + args, f"fwd-only bins-precomputed r{rep}")
    print(f"  => binning marginal (fwd+bwd graph): {t_full - t_nobin:6.3f} ms",
          flush=True)
    print(f"  => backward marginal (no binning):   {t_nobin - tf_nobin:6.3f} ms",
          flush=True)

print("MARGINS65 OK", flush=True)
