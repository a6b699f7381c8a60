"""A/B drive: blocksearch binning variant vs the auto (mask/sort) paths.

Full fwd+bwd graphs, interleaved in one process. Also the /verify TPU drive:
checks finite loss + grads on the production path.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/bench_blocksearch_ab.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.rasterize import RasterizeConfig, rasterize

print("devices:", jax.devices(), flush=True)

H, W = 720, 1280
k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))


def scene(n, n_chan=3, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    means[:, 2] = means[:, 2] * 0.5 + 3.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, n_chan)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))


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
    print(f"{label:40s} {dt:8.3f} ms", flush=True)
    return dt


def make_step(n_chan, live=None, binning="blocksearch"):
    target = jnp.zeros((n_chan, H, W))
    cfg = RasterizeConfig(binning=binning)

    def loss(*a):
        out = rasterize(*a, cam, cfg, live=live)
        return jnp.abs(out.im - target).mean()

    return jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))


def finite_check(step, args, label):
    v, g = step(*args)
    ok = bool(jnp.isfinite(v)) and all(
        bool(jnp.isfinite(x).all()) for x in g)
    nz = all(float(jnp.abs(x).max()) > 0 for x in g)
    print(f"VERIFY {label}: loss={float(v):.6f} finite={ok} grads_nonzero={nz}",
          flush=True)
    assert ok and nz


def grad_parity(args, label, live=None):
    def g(binning):
        target = jnp.zeros((3, H, W))
        return jax.jit(jax.grad(lambda *a: jnp.abs(
            rasterize(*a, cam, RasterizeConfig(binning=binning),
                      live=live).im - target).mean(), argnums=(0, 3)))(*args)

    ga = g("blocksearch")
    gs = g("sort")
    for a, b in zip(ga, gs):
        scale = float(jnp.abs(b).max()) + 1e-8
        diff = float(jnp.abs(a - b).max()) / scale
        print(f"PARITY {label}: rel grad diff {diff:.2e}", flush=True)
        assert diff < 1e-4


# 5k: blocksearch (+invmap bwd) vs mask vs sort
args5 = scene(5000)
s5 = {b: make_step(3, binning=b) for b in ("blocksearch", "mask", "sort")}
finite_check(s5["blocksearch"], args5, "5k blocksearch")
grad_parity(args5, "5k")
for rep in (1, 2):
    for b in ("blocksearch", "mask", "sort"):
        bench(s5[b], args5, f"5k fwd+bwd [{b}] r{rep}")

# 65k live
n = 65536
args65 = scene(n, seed=2)
s65 = {b: make_step(3, binning=b) for b in ("blocksearch", "sort")}
finite_check(s65["blocksearch"], args65, "65k blocksearch")
for rep in (1, 2):
    for b in ("blocksearch", "sort"):
        bench(s65[b], args65, f"65k-live fwd+bwd [{b}] r{rep}")

# tracking regime: 65k capacity / 15k live, 6 channels fused
args65c = scene(n, n_chan=6, seed=3)
live = jnp.asarray(np.arange(n) < 15000)
s65c = {b: make_step(6, live=live, binning=b) for b in ("blocksearch", "sort")}
finite_check(s65c["blocksearch"], args65c, "65kcap/15klive blocksearch")
for rep in (1, 2):
    for b in ("blocksearch", "sort"):
        bench(s65c[b], args65c, f"65kcap/15klive 6ch [{b}] r{rep}")

# 16k point for the sweep
args16 = scene(16384, seed=4)
s16 = {b: make_step(3, binning=b) for b in ("blocksearch", "sort")}
finite_check(s16["blocksearch"], args16, "16k blocksearch")
for rep in (1, 2):
    for b in ("blocksearch", "sort"):
        bench(s16[b], args16, f"16k fwd+bwd [{b}] r{rep}")

print("AB OK", flush=True)
