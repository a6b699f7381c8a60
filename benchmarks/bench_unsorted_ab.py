"""A/B drive: nosort binning (no global argsort; in-kernel per-tile depth
sort) vs mask/sort/unsorted. Full fwd+bwd graphs, interleaved in one process
(the only timing methodology that reproduces across sessions on this box —
see CLAUDE.md).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/bench_unsorted_ab.py
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
    print(f"{label:44s} {dt:8.3f} ms", flush=True)
    return dt


def make_step(n_chan, live=None, binning="nosort", sub_chunk=64):
    target = jnp.zeros((n_chan, H, W))
    cfg = RasterizeConfig(binning=binning, sub_chunk=sub_chunk)

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


def image_parity(args, label, atol, live=None):
    """nosort vs sort rendered image (exact below overflow; approximate
    boundary-bucket truncation above it)."""
    ims = {}
    for b in ("nosort", "sort"):
        ims[b] = jax.jit(lambda *a, b=b: rasterize(
            *a, cam, RasterizeConfig(binning=b), live=live).im)(*args)
    diff = float(jnp.abs(ims["nosort"] - ims["sort"]).max())
    mean = float(jnp.abs(ims["nosort"] - ims["sort"]).mean())
    print(f"PARITY {label}: max image diff {diff:.2e} mean {mean:.2e}",
          flush=True)
    assert mean < atol, (diff, mean)


def grad_parity(args, label, live=None):
    def g(binning):
        target = jnp.zeros((3, H, W))
        return jax.jit(jax.grad(lambda *a: jnp.abs(
            rasterize(*a, cam, RasterizeConfig(binning=binning),
                      live=live).im - target).mean(), argnums=(0, 3)))(*args)

    ga = g("nosort")
    gs = g("sort")
    for a, b in zip(ga, gs):
        scale = float(jnp.abs(b).max()) + 1e-8
        diff = float(jnp.abs(a - b).max()) / scale
        print(f"PARITY {label}: rel grad diff {diff:.2e}", flush=True)
        assert diff < 1e-4


# 5k (no overflow: exact) — also compositor sub-chunk granule sweep on mask
args5 = scene(5000)
s5 = {b: make_step(3, binning=b) for b in ("nosort", "mask")}
s5["mask32"] = make_step(3, binning="mask", sub_chunk=32)
s5["mask16"] = make_step(3, binning="mask", sub_chunk=16)
finite_check(s5["nosort"], args5, "5k nosort")
finite_check(s5["mask32"], args5, "5k mask sub32")
grad_parity(args5, "5k")
for rep in (1, 2):
    for b in ("nosort", "mask", "mask32", "mask16"):
        bench(s5[b], args5, f"5k fwd+bwd [{b}] r{rep}")

# 16k
args16 = scene(16384, seed=4)
s16 = {b: make_step(3, binning=b) for b in ("nosort", "sort")}
finite_check(s16["nosort"], args16, "16k nosort")
image_parity(args16, "16k", atol=1e-3)  # mild overflow: boundary-bucket approx
for rep in (1, 2):
    for b in ("nosort", "sort"):
        bench(s16[b], args16, f"16k fwd+bwd [{b}] r{rep}")

# 65k (overflow regime: approximate nearest-K)
n = 65536
args65 = scene(n, seed=2)
s65 = {b: make_step(3, binning=b) for b in ("nosort", "sort")}
finite_check(s65["nosort"], args65, "65k nosort")
image_parity(args65, "65k", atol=3e-3)  # boundary-bucket approx at overflow
s65["nosort32"] = make_step(3, binning="nosort", sub_chunk=32)
for rep in (1, 2):
    for b in ("nosort", "nosort32", "sort"):
        bench(s65[b], args65, f"65k fwd+bwd [{b}] r{rep}")

# tracking regime: 65k capacity / 15k live, 6 channels fused
args65c = scene(n, n_chan=6, seed=3)
live = jnp.asarray(np.arange(n) < 15000)
s65c = {b: make_step(6, live=live, binning=b) for b in ("nosort", "sort")}
finite_check(s65c["nosort"], args65c, "65kcap/15klive nosort")
for rep in (1, 2):
    for b in ("nosort", "sort"):
        bench(s65c[b], args65c, f"65kcap/15klive 6ch [{b}] r{rep}")

print("AB OK", flush=True)
