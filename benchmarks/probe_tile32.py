"""Does a taller tile (32x128) amortize the per-granule fixed cost?
(r5 roofline lever probe.)

The roofline + transcendental probes show the compositor is bound by a
~2-3 us FIXED cost per granule, not arithmetic. A 32x128 tile doubles the
pixels per granule (P 2048 -> 4096) while the granule count roughly halves
(same covers spread over half as many tiles), so the fixed cost per pixel
should ~halve IF nothing else degrades (VMEM pressure, K overflow, fewer
tiles to early-stop). r2 measured tile_h=8 LOSING at 65k (T-doubling
overheads dominate) — this is the same experiment in the other direction.

Interleaved A/B of the bench 40-step frozen-bin scan (graph-identical to
bench.py) at tile_h in {16 (production), 32} x sub_chunk variants.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u \
       benchmarks/probe_tile32.py
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from bench import H, W, SCAN_LEN, _make_cam, _scene
from gsdx.render.rasterize import RasterizeConfig, compute_bins, rasterize


def build(n, cfg):
    rng = np.random.default_rng(0)
    cam = _make_cam()
    args = tuple(jnp.asarray(x) for x in _scene(rng, n))
    target = jnp.zeros((3, H, W))

    def loss(means3d, *rest, bins):
        out = rasterize(means3d, *rest, cam, cfg, bins=bins)
        return jnp.abs(out.im - target).mean()

    @jax.jit
    def scan_steps(jitter, args):
        a0_base = args[0] + jitter
        bins = compute_bins(a0_base, args[1], args[2], cam, cfg,
                            margin_px=4.0)

        def body(carry, _):
            a0 = a0_base + carry * 1e-12
            v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                a0, *args[1:], bins=bins)
            return v, g[0][0, 0]
        return jax.lax.scan(body, 0.0, None, length=SCAN_LEN)

    def timed(jv):
        out = None
        for i in range(3):
            out = scan_steps(np.float32(jv + i * 1e-12), args)
        jax.block_until_ready(out)
        return 3 * SCAN_LEN

    return timed


def main():
    import os

    if os.environ.get("GSDX_CHUNK256"):
        # 65k: granule fixed cost is ~35% of the iteration. Wider granules
        # (chunk=sub=256) halve the granule count per K=512 tile; the risk
        # is VMEM ((256,2048) f32 intermediates) and coarser early-stop.
        variants = {
            "t16_auto": RasterizeConfig(),
            "t16_c256_s256": RasterizeConfig(chunk=256, sub_chunk=256),
            "t16_c256_s128": RasterizeConfig(chunk=256, sub_chunk=128),
        }
        sizes = (65536,)
    elif os.environ.get("GSDX_TILE32_16K"):
        # round-2 question: does the tall tile extend past the 8192 auto
        # gate? At 16k tiles are far from K-saturated (avg ~230 covers at
        # t32 vs K=512) and halving the tile count also halves the mask
        # binner's O(tiles*N) compare-sum work.
        variants = {
            "t16_auto": RasterizeConfig(),           # nosort, sub 128
            "t32_sub64_nosort": RasterizeConfig(tile_h=32, sub_chunk=64,
                                                binning="nosort"),
            "t32_sub64_mask": RasterizeConfig(tile_h=32, sub_chunk=64,
                                              binning="mask"),
        }
        sizes = (16384,)
    else:
        variants = {
            "t16_auto": RasterizeConfig(),
            "t32_sub64": RasterizeConfig(tile_h=32, sub_chunk=64),
            "t32_sub128": RasterizeConfig(tile_h=32, sub_chunk=128),
        }
        sizes = (5000, 65536)
    results = {}
    for n in sizes:
        fns = {}
        for name, cfg in variants.items():
            try:
                tf = build(n, cfg)
                tf(1e-9)  # compile + warmup; OOM shows up here
                fns[name] = tf
            except Exception as e:
                results[f"{n}/{name}"] = f"error: {type(e).__name__}"
                print(f"{n}/{name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)
        best = {}
        for r in range(3):
            jv = (r + 2) * 1e-10
            for name, tf in fns.items():
                t0 = time.perf_counter()
                steps = tf(jv)
                dt = (time.perf_counter() - t0) / steps
                mpix = H * W / dt / 1e6
                best[name] = max(best.get(name, 0.0), mpix)
        for name, mpix in best.items():
            results[f"{n}/{name}"] = round(mpix, 2)
            print(f"{n}/{name}: {mpix:.2f} Mpix/s", flush=True)
    if os.environ.get("GSDX_CHUNK256"):
        out_name = "benchmarks/out/chunk256_probe.json"
    elif os.environ.get("GSDX_TILE32_16K"):
        out_name = "benchmarks/out/tile32_probe_16k.json"
    else:
        out_name = "benchmarks/out/tile32_probe.json"
    with open(out_name, "w") as f:
        json.dump(results, f, indent=1)
    print("TILE32 PROBE OK", flush=True)


if __name__ == "__main__":
    main()
