"""Interleaved A/B: sort vs mask(csum) binning, full fwd+bwd, one process."""
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
    print(f"{label:36s} {(time.perf_counter()-t0)/iters*1e3:7.3f} ms",
          flush=True)


args = scene(5000)
target = jnp.zeros((3, H, W))
steps = {}
for mode in ("sort", "mask"):
    cfg = RasterizeConfig(binning=mode)

    def loss(*a, cfg=cfg):
        return jnp.abs(rasterize(*a, cam, cfg).im - target).mean()

    steps[mode] = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))
    v, g = steps[mode](*args)
    print(f"5k {mode}: loss={float(v):.6f} finite={all(bool(jnp.isfinite(x).all()) for x in g)}",
          flush=True)

bench(steps["sort"], args, "5k fwd+bwd [sort] A1")
bench(steps["mask"], args, "5k fwd+bwd [mask/csum] B1")
bench(steps["sort"], args, "5k fwd+bwd [sort] A2")
bench(steps["mask"], args, "5k fwd+bwd [mask/csum] B2")

# grad parity between modes
gs = jax.jit(jax.grad(lambda *a: jnp.abs(
    rasterize(*a, cam, RasterizeConfig(binning="sort")).im - target).mean(),
    argnums=(0, 3)))(*args)
gm = jax.jit(jax.grad(lambda *a: jnp.abs(
    rasterize(*a, cam, RasterizeConfig(binning="mask")).im - target).mean(),
    argnums=(0, 3)))(*args)
for a, b in zip(gs, gm):
    print("grad diff max", float(jnp.abs(a - b).max()),
          "scale", float(jnp.abs(a).max()), flush=True)

# tracking scale
n = 65536
args6 = scene(n, n_chan=6, seed=2)
live = jnp.asarray(np.arange(n) < 15000)
target6 = jnp.zeros((6, H, W))
steps6 = {}
for mode in ("sort", "mask"):
    cfg = RasterizeConfig(binning=mode)

    def loss6(*a, cfg=cfg):
        return jnp.abs(rasterize(*a, cam, cfg, live=live).im - target6).mean()

    steps6[mode] = jax.jit(jax.value_and_grad(loss6, argnums=(0, 1, 2, 3, 4)))

bench(steps6["sort"], args6, "65k/6ch fwd+bwd [sort] A1")
bench(steps6["mask"], args6, "65k/6ch fwd+bwd [mask/csum] B1")
bench(steps6["sort"], args6, "65k/6ch fwd+bwd [sort] A2")
bench(steps6["mask"], args6, "65k/6ch fwd+bwd [mask/csum] B2")
print("AB OK", flush=True)
