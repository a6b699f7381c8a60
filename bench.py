"""Benchmark: rasterizer fwd+bwd throughput on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the tracking hot loop's render cost — fwd+bwd differentiable
rasterization of a rope-scale Gaussian scene (5k splats) at the reference
resolution 1280x720 (`src/render/renderer.py:13-14`). The reference performs
this (x2 for rgb+seg) 10k+2k*(T-1) times per episode on a CUDA GPU
(SURVEY.md §3.2); Mpix/s fwd+bwd per chip is the BASELINE.json headline.

vs_baseline normalizes against an estimated 184 Mpix/s for the CUDA
reference rasterizer on its published hardware (a ~5 ms fwd+bwd iteration at
0.92 Mpix — the reference publishes no numbers; see BASELINE.md).
"""

import json
import time

import numpy as np

CUDA_REFERENCE_MPIX_S = 184.0


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from gsdx.core.cameras import make_camera
    from gsdx.render.rasterize import RasterizeConfig, rasterize

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

    def loss(means3d, quats, scales, opacities, colors):
        out = rasterize(means3d, quats, scales, opacities, colors, cam, cfg)
        return jnp.abs(out.im - target).mean()

    step = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4)))

    v, grads = step(*args)
    jax.block_until_ready(grads)
    for _ in range(3):
        v, grads = step(*args)
        jax.block_until_ready(grads)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        v, grads = step(*args)
    jax.block_until_ready(grads)
    dt = (time.perf_counter() - t0) / iters

    mpix_s = H * W / dt / 1e6
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_mpix_per_s",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / CUDA_REFERENCE_MPIX_S, 4),
    }))


if __name__ == "__main__":
    main()
