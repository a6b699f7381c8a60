"""65k backward-cost marginals via targeted zero-VJP monkeypatches.

full        — baseline (5.55 ms r4)
no_compbwd  — composite custom_vjp backward returns zeros: marginal of the
              Pallas backward kernel (scatter + proj bwd still run on the
              zero cotangent)
no_scatter  — _take_rows backward returns zeros: removes the T*K live-cap
              scatter (compositor bwd still runs; proj bwd on zeros)
colors_only — value_and_grad w.r.t. colors+opacities only: drops the
              mean/quat/scale projection-backward chains

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u benchmarks/probe_65k_bwd_marginals.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

import importlib

RZ = importlib.import_module("gsdx.render.rasterize")
from gsdx.core.cameras import make_camera
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

# --- patched primitives ---
orig_composite_bwd = RZ._composite_bwd
orig_take_rows_bwd = RZ._take_rows_bwd


def zero_composite_bwd(grid, cfg_, n_accum, res, g):
    tile_feats = res[0]
    return jnp.zeros_like(tile_feats), None, None


def zero_take_rows_bwd(res, g):
    idx, n = res
    return jnp.zeros((n, g.shape[-1]), g.dtype), None


def make_scan(argnums):
    @jax.jit
    def scan_steps(args):
        bins = compute_bins(args[0], args[1], args[2], cam, cfg,
                            margin_px=4.0)

        def body(carry, _):
            a0 = args[0] + carry * 1e-12

            def loss_(*a):
                out = rasterize(*a, cam, cfg, bins=bins)
                return jnp.abs(out.im - target).mean()

            v, g = jax.value_and_grad(loss_, argnums=argnums)(a0, *args[1:])
            return v, jax.tree.leaves(g)[0].ravel()[0]

        carry, outs = jax.lax.scan(body, 0.0, None, length=SCAN)
        return carry, outs

    return scan_steps


variants = {}
variants["full"] = (make_scan((0, 1, 2, 3, 4)), None)
variants["colors_only"] = (make_scan((3, 4)), None)
variants["no_compbwd"] = (make_scan((0, 1, 2, 3, 4)), "comp")
variants["no_scatter"] = (make_scan((0, 1, 2, 3, 4)), "rout")


def with_patch(which, fn, args):
    if which == "comp":
        RZ._composite.defvjp(RZ._composite_fwd, zero_composite_bwd)
        try:
            return fn(args)
        finally:
            RZ._composite.defvjp(RZ._composite_fwd, orig_composite_bwd)
    if which == "rout":
        RZ._take_rows.defvjp(RZ._take_rows_fwd, zero_take_rows_bwd)
        try:
            return fn(args)
        finally:
            RZ._take_rows.defvjp(RZ._take_rows_fwd, orig_take_rows_bwd)
    return fn(args)


fns = {}
for name, (fn, patch) in variants.items():
    t0 = time.perf_counter()
    out = with_patch(patch, fn, args)
    jax.block_until_ready(out)
    print(f"[compile] {name}: {time.perf_counter()-t0:.1f}s", flush=True)

times = {m: [] for m in variants}
for r in range(3):
    for name, (fn, patch) in variants.items():
        t0 = time.perf_counter()
        for i in range(3):
            out = with_patch(patch, fn, args)
        jax.block_until_ready(out)
        times[name].append((time.perf_counter() - t0) / (3 * SCAN))
for name in variants:
    ts = np.array(times[name]) * 1e3
    print(f"{name:12s}: {ts.min():.3f} ms/iter (med {np.median(ts):.3f})",
          flush=True)
print("PROBE_65K_BWD OK", flush=True)
