"""Bin-reuse A/B: recompute bins every step vs every k steps in a 20-step
tracking-shaped scan (fwd+bwd + SGD-ish update per step), interleaved in one
process (the only timing methodology that reproduces on this box).

Variants per N in {5k, 16k, 65k}:
  base   — current auto pipeline, bins rebuilt inside rasterize every step
  k4/k8  — bins in the scan carry, lax.cond-refreshed every 4th/8th step

Also prints max |image delta| of the final frame (reuse vs base) as the
coverage-staleness error bound for the probe motion (~0.1 px/step).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/probe_binreuse.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.rasterize import RasterizeConfig, compute_bins, rasterize

print("devices:", jax.devices(), flush=True)

H, W = 720, 1280
k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))
STEPS = 20
LR = 2e-5  # ~0.1 px/step at depth 3, focal 600 — tracking-like motion


def scene(n):
    rng = np.random.default_rng(0)
    means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    means[:, 2] = means[:, 2] * 0.5 + 3.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    tgt = rng.uniform(0, 1, size=(3, H, W)).astype(np.float32)
    return tuple(jnp.asarray(x)
                 for x in (means, quats, scales, opac, colors, tgt))


def make_loop(n, refresh):
    cfg = RasterizeConfig() if refresh == 1 else RasterizeConfig(
        binning="nosort")

    def loop(means, quats, scales, opac, colors, tgt, eps):
        means = means + eps  # fresh input per timed call (defeat result cache)

        def loss_fn(m, bins):
            out = rasterize(m, quats, scales, opac, colors, cam, cfg,
                            bins=bins)
            return jnp.abs(out.im - tgt).mean() + 0.01 * out.depth.mean()

        def step(carry, i):
            m, bins = carry
            if refresh > 1:
                bins = jax.lax.cond(
                    i % refresh == 0,
                    lambda m, b: compute_bins(m, quats, scales, cam, cfg),
                    lambda m, b: b,
                    m, bins,
                )
            loss, g = jax.value_and_grad(loss_fn)(m, bins)
            return (m - LR * g / (jnp.abs(g).mean() + 1e-12), bins), loss

        bins0 = compute_bins(means, quats, scales, cam, cfg)
        (m, _), losses = jax.lax.scan(
            step, (means, bins0), jnp.arange(STEPS))
        out = rasterize(m, quats, scales, opac, colors, cam, cfg)
        return losses, m, out.im

    return jax.jit(loop)


def bench(fn, inputs, label, iters=6):
    out = fn(*inputs, jnp.float32(0.0))
    jax.block_until_ready(out)
    for i in range(1, 3):
        out = fn(*inputs, jnp.float32(i * 1e-30))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*inputs, jnp.float32((50 + i) * 1e-30))
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters / STEPS * 1e3
    mpixs = H * W / dt / 1e3
    print(f"{label:32s} {dt:7.3f} ms/iter  {mpixs:7.1f} Mpix/s", flush=True)
    return dt, out


for n in (5000, 16384, 65536):
    inputs = scene(n)
    loops = {r: make_loop(n, r) for r in (1, 4, 8)}
    outs = {}
    for rep in (1, 2):
        for r, fn in loops.items():
            _, outs[r] = bench(fn, inputs, f"N={n} refresh={r} rep{rep}")
    for r in (4, 8):
        d = float(jnp.abs(outs[r][2] - outs[1][2]).max())
        print(f"N={n} refresh={r}: max |im delta| vs base = {d:.6f}",
              flush=True)

print("PROBE_BINREUSE OK", flush=True)
