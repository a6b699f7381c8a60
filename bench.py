"""Benchmark: rasterizer fwd+bwd throughput + tracking iters/s on the chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Headline: fwd+bwd differentiable rasterization of a rope-scale Gaussian
scene (5k splats) at the reference resolution 1280x720
(`src/render/renderer.py:13-14`), in Mpix/s — matched against an estimated
184 Mpix/s for the CUDA reference rasterizer (no published numbers; see
BASELINE.md). The reference performs this (x2 for rgb+seg) 10k+2k*(T-1)
times per episode (`src/tracking/train_gs.py:25`).

Extras (the BASELINE.md headline set, VERDICT r1 "make the bench honest"):
  sweep_mpix_s      — same measurement at 5k / 16k / 65k gaussians (the
                      post-densification regimes real tracking reaches)
  tracking_iters_s  — rope-scale tracking optimization steps/s (t=0 and t>0
                      branches; 4 cameras, 720p, 8k capacity), the
                      scan-compiled production step

Methodology (VERDICT r4 #1 — session-robust numbers): sessions on this box
are bimodal (~5% spread; CLAUDE.md perf rules), so every configuration is
compiled up front and then timed in INTERLEAVED rounds within this one
process; the reported figure is the best round per configuration (the same
within-session A/B discipline used for every optimization decision in this
repo). Each timed call perturbs its input via a distinct on-device jitter
scalar — repeated identical dispatches can return cached results on this
box (measured 90912 "iters/s", violating physics).
"""

import json
import time

import numpy as np

CUDA_REFERENCE_MPIX_S = 184.0
H, W = 720, 1280
SCAN_LEN = 40  # matches the production t>0 bin-reuse block (bin_refresh=40)


def _scene(rng, n, n_chan=3):
    means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    means[:, 2] = means[:, 2] * 0.5 + 3.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, n_chan)).astype(np.float32)
    return means, quats, scales, opac, colors


def _make_cam():
    from gsdx.core.cameras import make_camera

    k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    return make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                       bg=(0.7, 0.7, 0.7))


def build_raster_pd(n):
    """Per-dispatch fwd+bwd step. Returns (timed_fn, iters_per_call)."""
    import jax
    import jax.numpy as jnp

    from gsdx.render.rasterize import RasterizeConfig, rasterize

    rng = np.random.default_rng(0)
    cam = _make_cam()
    cfg = RasterizeConfig()
    args = tuple(jnp.asarray(x) for x in _scene(rng, n))
    target = jnp.zeros((3, H, W))

    def loss(means3d, quats, scales, opacities, colors):
        out = rasterize(means3d, quats, scales, opacities, colors, cam, cfg)
        return jnp.abs(out.im - target).mean()

    @jax.jit
    def step(jitter, *a):
        # jitter is fused into the graph: every dispatch gets a distinct
        # scalar input so no two dispatches are identical (cached-result trap)
        return jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
            a[0] + jitter, *a[1:])

    iters = 20

    def timed(jv: float):
        g = None
        for i in range(iters):
            _, g = step(np.float32(jv + i * 1e-12), *args)
        jax.block_until_ready(g)
        return iters

    return timed, iters


def build_raster_scan(n, scan_len=SCAN_LEN):
    """Scan-amortized variant: `scan_len` chained fwd+bwd steps inside ONE
    executable — how the production tracking loop actually runs
    (`gsdx/track/trainer.py` scan-compiles iterations), removing the
    per-dispatch tunnel overhead (~1-1.7 ms/dispatch on this box) that the
    per-dispatch numbers include. Mirrors the t>0 block-frozen bin reuse
    (`TrackingConfig.bin_refresh`, default 40): tile bins are computed ONCE
    per `scan_len`-step block (with the production 4 px coverage margin) —
    the exact production cadence (scan_len == bin_refresh == 40)."""
    import jax
    import jax.numpy as jnp

    from gsdx.render.rasterize import RasterizeConfig, compute_bins, rasterize

    rng = np.random.default_rng(0)
    cam = _make_cam()
    cfg = RasterizeConfig()
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
            # loop-carried perturbation: keeps iterations data-dependent so
            # XLA cannot hoist/CSE the identical step out of the scan
            a0 = a0_base + carry * 1e-12
            v, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4))(
                a0, *args[1:], bins=bins)
            return v, g[0][0, 0]
        carry, outs = jax.lax.scan(body, 0.0, None, length=scan_len)
        return carry, outs

    iters = 3

    def timed(jv: float):
        out = None
        for i in range(iters):
            out = scan_steps(np.float32(jv + i * 1e-12), args)
        jax.block_until_ready(out)
        return iters * scan_len

    return timed, iters * scan_len


def bench_sweep(ns=(5000, 16384, 65536), rounds=3):
    """Compile every (n, mode) config, then time them in interleaved rounds;
    report the best round per config (Mpix/s)."""
    timed_fns = {}
    for n in ns:
        for mode, builder in (("pd", build_raster_pd),
                              ("scan", build_raster_scan)):
            try:
                timed_fns[(n, mode)] = builder(n)
            except Exception as e:
                timed_fns[(n, mode)] = f"error: {type(e).__name__}"

    # warmup: compile + one throwaway timed call each
    for key, tf in timed_fns.items():
        if not isinstance(tf, str):
            try:
                tf[0](1e-9)
            except Exception as e:
                timed_fns[key] = f"error: {type(e).__name__}"

    best = {}
    for r in range(rounds):
        jv = (r + 2) * 1e-10
        for key, tf in timed_fns.items():
            if isinstance(tf, str):
                best[key] = tf
                continue
            t0 = time.perf_counter()
            n_steps = tf[0](jv)
            dt = (time.perf_counter() - t0) / n_steps
            mpix = H * W / dt / 1e6
            prev = best.get(key)
            if not isinstance(prev, float) or mpix > prev:
                best[key] = mpix

    sweep = {str(n): (round(best[(n, "pd")], 2)
                      if isinstance(best.get((n, "pd")), float)
                      else best.get((n, "pd"))) for n in ns}
    sweep_scan = {str(n): (round(best[(n, "scan")], 2)
                           if isinstance(best.get((n, "scan")), float)
                           else best.get((n, "scan"))) for n in ns}
    return sweep, sweep_scan


def bench_tracking(n_iters=30, rounds=3):
    """Rope-scale tracking steps/s: 8k capacity, 4 cameras, 720p, the
    production scan-compiled fit (t=0 and t>0 branches). Best of `rounds`
    timed runs per branch, each with a distinct PRNG key (identical repeat
    calls can return cached results on this box)."""
    import jax
    import jax.numpy as jnp

    from gsdx.core.cameras import make_camera
    from gsdx.core.gaussians import init_gaussian_params, init_tracking_variables
    from gsdx.kernels.knn import knn
    from gsdx.track.optimizer import GroupAdam, tracking_lrs
    from gsdx.track.trainer import (
        TrackingConfig,
        camera_order,
        initialize_per_timestep,
        initialize_post_first_timestep,
        make_fit_timestep,
    )

    rng = np.random.default_rng(1)
    n_pts = 6144
    pt_cld = np.concatenate(
        [
            rng.uniform(-0.4, 0.4, size=(n_pts, 3)).astype(np.float32)
            + np.array([0, 0, 2.5], np.float32),
            rng.uniform(0.2, 0.8, size=(n_pts, 3)).astype(np.float32),
            (rng.uniform(size=(n_pts, 1)) > 0.3).astype(np.float32),
        ],
        axis=1,
    )
    d, _ = knn(jnp.asarray(pt_cld[:, :3]), 3)
    params = init_gaussian_params(pt_cld, np.asarray(d).mean(-1),
                                  capacity=8192)
    cfg = TrackingConfig()
    variables = init_tracking_variables(8192, cfg.num_knn, scene_radius=1.0)
    adam = GroupAdam()
    opt_state = adam.init(params)

    k = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
    cams = [make_camera(k, np.eye(4, dtype=np.float32), width=W, height=H,
                        cam_id=i, bg=(0, 0, 0)) for i in range(4)]
    cams = jax.tree.map(lambda *x: jnp.stack(x), *cams)
    ims = jnp.asarray(rng.uniform(size=(4, 3, H, W)).astype(np.float32))
    segs = jnp.asarray(rng.uniform(size=(4, 3, H, W)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    host_rng = np.random.default_rng(0)

    out = {}
    for branch, is_initial in (("t0", True), ("t1", False)):
        lrs = tracking_lrs(1.0, post_first_timestep=not is_initial)
        if not is_initial:
            variables = initialize_post_first_timestep(
                params, variables, cfg.num_knn)
            params, variables, opt_state = initialize_per_timestep(
                params, variables, opt_state)
        fit = make_fit_timestep(cfg, is_initial=is_initial,
                                num_iters=n_iters)
        order = camera_order(n_iters, 4, host_rng)
        # warmup (compile) + best of `rounds` timed runs, each with a
        # different PRNG key.
        r = fit(params, opt_state, variables, lrs, cams, ims, segs, order, key)
        jax.block_until_ready(r[0].means3d)
        vals = []
        for j in range(rounds):
            keyj = jax.random.PRNGKey(7 + j)
            t0 = time.perf_counter()
            r = fit(params, opt_state, variables, lrs, cams, ims, segs,
                    order, keyj)
            jax.block_until_ready(r[0].means3d)
            vals.append(n_iters / (time.perf_counter() - t0))
        out[branch] = round(max(vals), 2)
    return out


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    except Exception:
        pass

    try:
        sweep, sweep_scan = bench_sweep()
    except Exception as e:  # never lose the headline to a sweep failure
        sweep, sweep_scan = {}, {}
        err = f"error: {type(e).__name__}"
        for n in (5000, 16384, 65536):
            sweep[str(n)] = err
            sweep_scan[str(n)] = err
    try:
        tracking = bench_tracking()
    except Exception as e:
        tracking = {"error": type(e).__name__}

    scan_amortized = sweep_scan.get("5000")
    per_dispatch = sweep.get("5000")
    # Headline: steady-state throughput in the production shape — the
    # tracking loop scan-compiles its iterations (gsdx/track/trainer.py), so
    # bin_refresh(=40) chained fwd+bwd steps inside ONE executable is what
    # deployment pays. Per-dispatch numbers (sweep) additionally include this
    # box's ~1-1.7 ms remote-tunnel dispatch floor and are reported alongside.
    mpix_s = scan_amortized if isinstance(scan_amortized, float) else per_dispatch
    if not isinstance(mpix_s, float):
        mpix_s = 0.0
    print(json.dumps({
        "metric": "rasterize_fwd_bwd_mpix_per_s",
        "value": round(mpix_s, 2),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / CUDA_REFERENCE_MPIX_S, 4),
        "headline_mode": ("scan_amortized_40step_frozenbins_bestof3"
                          if isinstance(scan_amortized, float)
                          else "per_dispatch"),
        "per_dispatch_mpix_s": per_dispatch,
        "sweep_mpix_s": sweep,
        "sweep_scan_mpix_s": sweep_scan,
        "tracking_iters_s": tracking,
        "scan_amortized_mpix_s": scan_amortized,
    }))


if __name__ == "__main__":
    main()
