"""Round-2 measurement: binning-variant + gather/sort marginal costs, A/B.

Everything timed as FULL jitted graphs interleaved in one process (the only
trustworthy pattern on this backend — see benchmarks/README.md). Sections:

  S1  binning variants forward (proj -> bins -> scalar), 5k & 65k:
        mask-csum (current, with/without inverse), pair-sort,
        two-phase block-searchsorted prototype (new), and inverse-map
        construction alternatives (flat gather vs row-gather+onehot).
  S2  marginal in-graph costs: carrier vs carrier+X for X in
        {argsort 65k, sort 80k/143k/1M, flat gather, thin row gather,
         wide row gather}.
  S3  anchor: current auto full fwd+bwd at 5k / 65k-live.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/profile_binning_variants.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.core.cameras import make_camera
from gsdx.render.binning import TileGrid, bin_gaussians, bin_gaussians_mask
from gsdx.render.projection import project_gaussians
from gsdx.render.rasterize import RasterizeConfig, rasterize

print("devices:", jax.devices(), flush=True)

H, W = 720, 1280
kmat = np.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], np.float32)
cam = make_camera(kmat, np.eye(4, dtype=np.float32), width=W, height=H,
                  bg=(0.7, 0.7, 0.7))
grid = TileGrid(height=H, width=W, tile_h=16, tile_w=128)
K = 512
MAX_DUP = 16
B = 128


def scene(n, n_chan=3, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-0.8, 0.8, size=(n, 3)).astype(np.float32)
    means[:, 2] = means[:, 2] * 0.5 + 3.0
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    scales = rng.uniform(0.005, 0.02, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, size=(n, 1)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, n_chan)).astype(np.float32)
    return tuple(jnp.asarray(x) for x in (means, quats, scales, opac, colors))


def bench(fn, inputs, label, iters=10):
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


# ---------------------------------------------------------------- two-phase
def _bbox(mean2d_s, radius_s):
    tx, ty = grid.tiles_x, grid.tiles_y
    mx, my = mean2d_s[:, 0], mean2d_s[:, 1]
    r = radius_s
    x0 = jnp.clip(jnp.floor((mx - r) / grid.tile_w), 0, tx).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((my - r) / grid.tile_h), 0, ty).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((mx + r) / grid.tile_w) + 1, 0, tx).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((my + r) / grid.tile_h) + 1, 0, ty).astype(jnp.int32)
    return x0, y0, x1, y1


def two_phase_pos(mean2d, radius, depth, mask, inverse):
    """Prototype: block-searchsorted positions, O(T*(N + NB*K + K*B))."""
    n = mean2d.shape[0]
    T = grid.num_tiles
    tx = grid.tiles_x
    npad = -(-n // B) * B
    NB = npad // B

    order = jnp.argsort(jnp.where(mask, depth, jnp.inf)).astype(jnp.int32)
    packed = jnp.concatenate(
        [mean2d, radius[:, None], mask.astype(jnp.float32)[:, None]], axis=1
    )  # (N, 4) one permute
    packed_s = packed[order]
    x0, y0, x1, y1 = _bbox(packed_s[:, :2], packed_s[:, 2])
    mask_s = packed_s[:, 3] > 0.5
    bw = jnp.maximum(x1 - x0, 0)

    txi = jnp.asarray(np.arange(T, dtype=np.int32) % tx)[:, None]
    tyi = jnp.asarray(np.arange(T, dtype=np.int32) // tx)[:, None]
    inb = ((txi >= x0[None]) & (txi < x1[None])
           & (tyi >= y0[None]) & (tyi < y1[None]))
    lin = (tyi - y0[None]) * bw[None] + (txi - x0[None])
    cover = (inb & (lin < MAX_DUP) & mask_s[None]).astype(jnp.float32)
    cover = jnp.pad(cover, ((0, 0), (0, npad - n)))
    cov3 = cover.reshape(T, NB, B)
    # within-block inclusive prefix via one (B,B) triangular matmul
    row = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tri = (row <= col).astype(jnp.float32)
    inc3 = jnp.einsum("tbi,ij->tbj", cov3, tri,
                      preferred_element_type=jnp.float32)  # (T, NB, B)
    cnt = inc3[:, :, -1]  # (T, NB)
    cnt_cum = jnp.cumsum(cnt, axis=1)
    counts = jnp.minimum(cnt_cum[:, -1], K).astype(jnp.int32)

    tgt = jnp.arange(1, K + 1, dtype=jnp.float32)
    lt = cnt_cum[:, :, None] < tgt[None, None, :]  # (T, NB, K)
    blk = lt.astype(jnp.float32).sum(axis=1).astype(jnp.int32)  # (T, K)
    cnt_before = (cnt[:, :, None] * lt).sum(axis=1)  # (T, K) f32
    blk_c = jnp.minimum(blk, NB - 1)
    rows = jnp.take_along_axis(inc3, blk_c[:, :, None], axis=1)  # (T, K, B)
    jloc = tgt[None, :] - cnt_before  # (T, K) 1-based local target
    posb = (rows < jloc[:, :, None]).sum(axis=2).astype(jnp.int32)
    pos = jnp.clip(blk_c * B + posb, 0, n - 1)

    outs = [pos, counts, order]
    if inverse == "none":
        return outs
    # inverse map: tile_d from bbox math (no gather); slot via inc3 lookup
    slots = jnp.arange(MAX_DUP, dtype=jnp.int32)
    inv_bw = 1.0 / jnp.maximum(bw, 1).astype(jnp.float32)[:, None]
    di = jnp.floor(slots[None, :].astype(jnp.float32) * inv_bw).astype(jnp.int32)
    dj = slots[None, :] - di * bw[:, None]
    n_touched = jnp.minimum(bw * jnp.maximum(y1 - y0, 0), MAX_DUP)
    tile_d = (y0[:, None] + di) * tx + (x0[:, None] + dj)  # (N, MAX_DUP)
    valid = mask_s[:, None] & (slots[None, :] < n_touched[:, None])
    tile_d = jnp.where(valid, tile_d, 0)
    gi = jnp.arange(n, dtype=jnp.int32)
    # global in-tile slot = block-exclusive count + within-block count
    incg = inc3 + (cnt_cum - cnt)[:, :, None]  # (T, NB, B)
    if inverse == "flat":
        lin_idx = (tile_d * NB + (gi // B)[:, None]) * B + (gi % B)[:, None]
        slot_d = incg.reshape(-1)[lin_idx].astype(jnp.int32) - 1
    else:  # rowgather: fetch (B,) rows then one-hot extract
        inc2 = incg.reshape(T * NB, B)
        rows2 = inc2[tile_d * NB + (gi // B)[:, None]]  # (N, MAX_DUP, B)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (n, B), 1)
                  == (gi % B)[:, None]).astype(jnp.float32)  # (N, B)
        slot_d = jnp.einsum("ndb,nb->nd", rows2, onehot,
                            preferred_element_type=jnp.float32).astype(jnp.int32) - 1
    slot_d = jnp.where(valid & (slot_d < K), slot_d, -1)
    return outs + [tile_d, slot_d]


# ---------------------------------------------------------------- S1
def run_s1(n, seed):
    args = scene(n, seed=seed)
    means, quats, scales, _, _ = args

    def base(means, quats, scales):
        proj = project_gaussians(means, quats, scales, cam)
        return (jax.lax.stop_gradient(proj.mean2d),
                jax.lax.stop_gradient(proj.radius),
                jax.lax.stop_gradient(proj.depth), proj.mask)

    def summed(xs):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(xs))

    variants = {}
    variants["proj only"] = jax.jit(
        lambda m, q, s: summed(base(m, q, s)))
    variants["mask-csum +inv"] = jax.jit(lambda m, q, s: summed(
        bin_gaussians_mask(*base(m, q, s), grid, max_per_tile=K,
                           max_dup=MAX_DUP, with_inverse=True,
                           with_gauss_idx=False)))
    variants["mask-csum noinv"] = jax.jit(lambda m, q, s: summed(
        bin_gaussians_mask(*base(m, q, s), grid, max_per_tile=K,
                           max_dup=MAX_DUP, with_inverse=False,
                           with_gauss_idx=False)))
    variants["pair-sort"] = jax.jit(lambda m, q, s: summed(
        bin_gaussians(*base(m, q, s), grid, max_per_tile=K, max_dup=MAX_DUP)))
    variants["two-phase noinv"] = jax.jit(lambda m, q, s: summed(
        two_phase_pos(*base(m, q, s), "none")))
    variants["two-phase +inv flat"] = jax.jit(lambda m, q, s: summed(
        two_phase_pos(*base(m, q, s), "flat")))
    variants["two-phase +inv rowg"] = jax.jit(lambda m, q, s: summed(
        two_phase_pos(*base(m, q, s), "rowg")))

    # correctness: two-phase pos/counts must match mask-csum
    mb = bin_gaussians_mask(*jax.jit(base)(means, quats, scales), grid,
                            max_per_tile=K, max_dup=MAX_DUP,
                            with_inverse=True, with_gauss_idx=False)
    tp = jax.jit(lambda m, q, s: two_phase_pos(*base(m, q, s), "flat"))(
        means, quats, scales)
    pos2, counts2, order2, tile_d2, slot_d2 = tp
    same_counts = bool((mb.counts == counts2).all())
    kidx = jnp.arange(K)[None, :]
    vmask = kidx < mb.counts[:, None]
    same_pos = bool(jnp.where(vmask, mb.pos == pos2, True).all())
    same_slot = bool((jnp.where(slot_d2 >= 0, slot_d2, -1)
                      == jnp.where(mb.inv_slot >= 0, mb.inv_slot, -1)).all())
    print(f"  n={n}: parity counts={same_counts} pos={same_pos} "
          f"slot={same_slot}", flush=True)

    sargs = (means, quats, scales)
    for rep in (1, 2):
        for name, fn in variants.items():
            bench(fn, sargs, f"S1 n={n} {name} r{rep}")


# ---------------------------------------------------------------- S2
def run_s2():
    args = scene(5000)
    means, quats, scales, opac, colors = args
    rng = np.random.default_rng(7)
    big_keys = jnp.asarray(rng.integers(0, 2**30, size=(2**20,), dtype=np.int32))
    mid_keys = big_keys[:143_000]
    small_keys = big_keys[:80_000]
    n65 = 65536
    vals65 = jnp.asarray(rng.normal(size=(n65,)).astype(np.float32))
    src_flat = jnp.asarray(rng.normal(size=(450 * 512,)).astype(np.float32))
    idx_flat = jnp.asarray(rng.integers(0, 450 * 512,
                                        size=(n65, 16)).astype(np.int32))
    thin = jnp.asarray(rng.normal(size=(n65, 2)).astype(np.float32))
    wide = jnp.asarray(rng.normal(size=(n65, 16)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(n65).astype(np.int32))

    def carrier(m, q, s):
        proj = project_gaussians(m, q, s, cam)
        return (jnp.sum(proj.mean2d) + jnp.sum(proj.radius)
                + jnp.sum(proj.depth))

    extras = {
        "carrier alone": lambda m, q, s: carrier(m, q, s),
        "+argsort 65k": lambda m, q, s: carrier(m, q, s)
        + jnp.sum(jnp.argsort(vals65)),
        "+sort 80k": lambda m, q, s: carrier(m, q, s)
        + jnp.sum(jnp.sort(small_keys)),
        "+sort 143k": lambda m, q, s: carrier(m, q, s)
        + jnp.sum(jnp.sort(mid_keys)),
        "+sort 1M": lambda m, q, s: carrier(m, q, s)
        + jnp.sum(jnp.sort(big_keys)),
        "+flat gather 1M": lambda m, q, s: carrier(m, q, s)
        + jnp.sum(src_flat[idx_flat]),
        "+row gather (65k,2)": lambda m, q, s: carrier(m, q, s)
        + jnp.sum(thin[perm]),
        "+row gather (65k,16)": lambda m, q, s: carrier(m, q, s)
        + jnp.sum(wide[perm]),
        "+argsort 5k": lambda m, q, s: carrier(m, q, s)
        + jnp.sum(jnp.argsort(vals65[:5000])),
    }
    jfns = {k: jax.jit(v) for k, v in extras.items()}
    sargs = (means, quats, scales)
    for rep in (1, 2):
        for name, fn in jfns.items():
            bench(fn, sargs, f"S2 {name} r{rep}")


# ---------------------------------------------------------------- S3
def run_s3():
    target3 = jnp.zeros((3, H, W))
    args5 = scene(5000)

    def loss5(*a):
        return jnp.abs(rasterize(*a, cam, RasterizeConfig()).im
                       - target3).mean()

    step5 = jax.jit(jax.value_and_grad(loss5, argnums=(0, 1, 2, 3, 4)))

    n = 65536
    args65 = scene(n, seed=2)

    def loss65(*a):
        return jnp.abs(rasterize(*a, cam, RasterizeConfig()).im
                       - target3).mean()

    step65 = jax.jit(jax.value_and_grad(loss65, argnums=(0, 1, 2, 3, 4)))

    def fwd5(*a):
        return rasterize(*a, cam, RasterizeConfig()).im.sum()

    jfwd5 = jax.jit(fwd5)

    def fwd65(*a):
        return rasterize(*a, cam, RasterizeConfig()).im.sum()

    jfwd65 = jax.jit(fwd65)

    for rep in (1, 2):
        bench(jfwd5, args5, f"S3 5k auto fwd r{rep}")
        bench(step5, args5, f"S3 5k auto fwd+bwd r{rep}")
        bench(jfwd65, args65, f"S3 65k-live auto fwd r{rep}")
        bench(step65, args65, f"S3 65k-live auto fwd+bwd r{rep}")


if __name__ == "__main__":
    t0 = time.time()
    print("=== S2 marginal costs ===", flush=True)
    run_s2()
    print("=== S1 binning variants, n=5000 ===", flush=True)
    run_s1(5000, seed=0)
    print("=== S1 binning variants, n=65536 ===", flush=True)
    run_s1(65536, seed=2)
    print("=== S3 anchors ===", flush=True)
    run_s3()
    print(f"TOTAL {time.time()-t0:.0f}s", flush=True)
