"""How much of the compositor's time is transcendental ops? (r5 roofline
refinement.)

The roofline floor (`benchmarks/roofline.py`) weights exp/log1p at ~4 VPU
slots each; if the VPU's real transcendental throughput is 10-30x a flop,
the floor triples and the "achieved fraction" reading changes. This probe
answers it empirically: a standalone Pallas kernel with the EXACT shape and
loop structure of `_fwd_kernel`'s hot body (granule loads, alpha math,
prefix-sum matmul, accum matmul) is timed against a twin whose three
transcendentals (exp(power), log1p(-alpha), exp(log_t)) are replaced by
same-shape polynomial stand-ins (2 mul + 2 add each). Same memory traffic,
same matmuls, same loop -> the delta is the transcendental cost.

Within-session interleaved A/B (the only trustworthy methodology here).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u \
       benchmarks/probe_transcendental.py
"""
import functools
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T, F, K = 128, 16, 512
TILE_H, TILE_W = 16, 128
P = TILE_H * TILE_W
N_ACCUM = 4


def _prefix_sum(x):
    ch = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    tri = (row >= col).astype(jnp.float32)
    return jax.lax.dot_general(tri, x, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(feats_ref, counts_ref, accum_ref, logt_ref, *, sub, transcend):
    i = pl.program_id(0)
    count = counts_ref[i]
    px = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1).astype(jnp.float32)
    py = (px % TILE_W) * 0.1

    nchunks = pl.cdiv(count, sub)

    def body(j, carry):
        accum, logt = carry
        k0 = j * sub
        b = (j * sub) // 128
        cf_full = feats_ref[0, :, pl.ds(b * 128, 128)]
        per = 128 // sub
        h = j - b * per
        cf = jax.lax.switch(
            h, [lambda hh=hh: cf_full[:, hh * sub:(hh + 1) * sub]
                for hh in range(per)]) if sub < 128 else cf_full
        mx = cf[0, :][:, None]
        my = cf[1, :][:, None]
        ca = cf[2, :][:, None]
        cb = cf[3, :][:, None]
        cc = cf[4, :][:, None]
        op = cf[5, :][:, None]
        dx = px - mx
        dy = py - my
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
        if transcend:
            e = jnp.exp(power)
        else:  # same-shape polynomial stand-in: 2 mul + 2 add
            e = 1.0 + power + 0.5 * power * power
        pre = op * e
        alpha = jnp.minimum(0.99, pre)
        slot = k0 + jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
        keep = (power <= 0) & (alpha >= 1.0 / 255) & (slot < count)
        alpha = jnp.where(keep, alpha, 0.0)
        if transcend:
            l = jnp.log1p(-alpha)
        else:
            l = -alpha - 0.5 * alpha * alpha
        cum = _prefix_sum(l)
        log_t_before = logt + cum - l
        if transcend:
            w = alpha * jnp.exp(log_t_before)
        else:
            w = alpha * (1.0 + log_t_before + 0.5 * log_t_before * log_t_before)
        rgbd = cf[6:6 + N_ACCUM, :]
        accum = accum + jax.lax.dot_general(
            rgbd, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        logt = logt + cum[-1:, :]
        return accum, logt

    accum, logt = jax.lax.fori_loop(
        0, nchunks, body,
        (jnp.zeros((N_ACCUM, P), jnp.float32), jnp.zeros((1, P), jnp.float32)))
    accum_ref[0] = accum
    logt_ref[0] = logt


def build(sub, transcend):
    kern = functools.partial(_kernel, sub=sub, transcend=transcend)
    grid_fn = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, F, K), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, N_ACCUM, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, N_ACCUM, P), jnp.float32),
            jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        ],
    )
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(T, F, K)).astype(np.float32))
    counts = jnp.asarray(
        rng.integers(sub, K + 1, size=(T,)).astype(np.int32))

    @jax.jit
    def run(jitter, reps=8):
        def step(c, _):
            out = grid_fn(feats + jitter + c * 1e-12, counts)
            return out[0][0, 0, 0], None
        carry, _ = jax.lax.scan(step, 0.0, None, length=reps)
        return carry

    def timed(jv):
        out = None
        for i in range(3):
            out = run(np.float32(jv + i * 1e-12))
        jax.block_until_ready(out)
        return 3 * 8  # dispatches x reps

    # total granules per rep (analytic, fori = no early stop)
    granules = int(np.ceil(np.asarray(counts) / sub).sum())
    return timed, granules


def main():
    results = {}
    for sub in (64, 128):
        fns = {
            "transcend": build(sub, True),
            "poly": build(sub, False),
        }
        for name, (tf, _) in fns.items():
            tf(1e-9)  # compile + warm
        best = {}
        for r in range(3):
            jv = (r + 2) * 1e-10
            for name, (tf, granules) in fns.items():
                t0 = time.perf_counter()
                reps = tf(jv)
                us_per_granule = (time.perf_counter() - t0) / reps / granules * 1e6
                best[name] = min(best.get(name, np.inf), us_per_granule)
        share = 1.0 - best["poly"] / best["transcend"]
        results[f"sub{sub}"] = {
            "us_per_granule_transcend": round(best["transcend"], 3),
            "us_per_granule_poly": round(best["poly"], 3),
            "transcendental_share": round(share, 3),
        }
        print(f"sub={sub}: {best['transcend']:.3f} us/granule with "
              f"transcendentals, {best['poly']:.3f} without -> "
              f"{share:.0%} of granule time is exp/log", flush=True)
    with open("benchmarks/out/transcendental_probe.json", "w") as f:
        json.dump(results, f, indent=1)
    print("TRANSCENDENTAL PROBE OK", flush=True)


if __name__ == "__main__":
    main()
