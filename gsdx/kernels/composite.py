"""Pallas TPU tile compositor for Gaussian splatting (forward + backward).

Replaces the sequential per-pixel alpha-blending loop of the CUDA reference
rasterizer (`diff-gaussian-rasterization-w-depth`, consumed by
`src/tracking/train_utils.py:178`) with an order-independent-transmittance
formulation that vectorizes over both pixels and Gaussians:

    T_k = prod_{j<k} (1 - a_j) = exp( cumsum log(1 - a_j) )
    out_c = sum_k a_k T_k c_k            (an MXU matmul per chunk)

Alpha compositing is sequential only through the cumulative product; with the
log-space cumsum it becomes an associative scan, so each (chunk x pixel) alpha
block is pure VPU work and the color/depth accumulation is a (4 x CH) @
(CH x P) matmul on the MXU. The backward pass re-traverses chunks in reverse,
reconstructing per-Gaussian transmittance from the stored final log-T
(logT_before_k = logT_final - logT_suffix_k) — no atomics, no per-pixel
contributor stacks; per-tile gradient blocks are dense and scattered back to
Gaussians outside the kernel by the VJP of the feature gather.

Feature row layout (FEAT_DIM rows x K gaussians per tile):
  0 mean_x | 1 mean_y | 2 conic_a | 3 conic_b | 4 conic_c | 5 opacity |
  6 r | 7 g | 8 b | 9 depth | 10..15 padding

Semantics vs CUDA: alpha clamped to 0.99, contributions with power > 0 or
alpha < 1/255 dropped — identical. The CUDA early termination at T < 1e-4
(`diff-gaussian-rasterization` forward.cu) is implemented at TILE granularity:
the chunk loop stops once EVERY pixel's transmittance is below 1e-4, so the
dropped tail is a subset of what the per-pixel CUDA stop drops (error bound
< 1e-4 per channel, same as the reference's own truncation). The forward
records chunks-processed per tile; the backward traverses exactly that
prefix, making gradients exact for the early-stopped primal. Measured
reality (TPU v5e, 65k dense-opaque scene): the all-2048-pixels condition is
conservative — ~35/450 tiles fire, full tiles skip ~8% of their chunks, so
this is a worst-case guard (pathological saturation) and a semantics-parity
feature, not a bulk-throughput win at 16x128 tile granularity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FEAT_DIM = 16
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
# Tile-level early-termination threshold: stop compositing once max-pixel
# log-transmittance falls below log(1e-4) — the CUDA reference's per-pixel
# T < 1e-4 stop, applied per tile (strictly conservative vs CUDA).
LOG_T_STOP = -9.210340371976182
# default accumulated channels: r, g, b, depth. The kernels are generic over
# n_accum (= n_color_channels + 1 for depth), letting callers fuse several
# color targets (e.g. rgb + segmentation) into one pass over the same bins.
ACCUM_DIM = 4


def _prefix_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix sum over axis 0 of (CH, P) via a triangular matmul.

    Pallas TPU has no cumsum lowering; a (CH x CH) lower-triangular ones
    matrix on the MXU is both supported and essentially free next to the
    alpha evaluation (CH=128 makes it one native MXU tile).
    """
    ch = x.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (ch, ch), 1)
    tri = (row >= col).astype(jnp.float32)
    return jax.lax.dot_general(
        tri, x, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pixel_coords(tile_idx, tiles_x: int, tile_h: int, tile_w: int):
    """Pixel-center coordinates for tile ``tile_idx`` as (1, P) f32 arrays."""
    P = tile_h * tile_w
    ty = tile_idx // tiles_x
    tx = tile_idx % tiles_x
    p = jax.lax.broadcasted_iota(jnp.int32, (1, P), 1)
    px = (tx * tile_w + p % tile_w).astype(jnp.float32)
    py = (ty * tile_h + p // tile_w).astype(jnp.float32)
    return px, py


def _chunk_alpha(chunk, px, py, smask):
    """Alpha for one (FEAT_DIM, CH) feature chunk against (1, P) pixels.

    Returns (alpha (CH, P), e=exp(power) (CH, P), clamp_gate (CH, P), dx, dy).
    """
    mx = chunk[0, :][:, None]  # (CH, 1)
    my = chunk[1, :][:, None]
    ca = chunk[2, :][:, None]
    cb = chunk[3, :][:, None]
    cc = chunk[4, :][:, None]
    op = chunk[5, :][:, None]
    dx = px - mx  # (CH, P)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    e = jnp.exp(power)
    pre = op * e
    clamp_gate = pre <= ALPHA_MAX
    alpha = jnp.minimum(ALPHA_MAX, pre)
    keep = (power <= 0) & (alpha >= ALPHA_MIN) & smask
    alpha = jnp.where(keep, alpha, 0.0)
    return alpha, e, clamp_gate & keep, dx, dy


def _load_subchunk(feats_ref, j, chunk: int, sub: int, lead: bool = True):
    """Sub-chunk j of width ``sub`` from the (1, F, K) feats block.

    Mosaic can only prove 128-lane alignment for dynamic lane slices, so the
    load grabs the containing 128-wide block and a `lax.switch` picks the
    static sub-slice — letting the compositor work in sub-128 granules
    without unaligned vector loads. ``lead=False`` reads a (F, K) scratch
    block (the presorted copy) instead of the (1, F, K) input block.
    """
    def block(k0):
        if lead:
            return feats_ref[0, :, k0]
        return feats_ref[:, k0]

    if sub == chunk:
        return block(pl.ds(j * chunk, chunk))
    per = chunk // sub
    b = j // per
    h = j - b * per
    cf_full = block(pl.ds(b * chunk, chunk))  # (F, chunk)
    return jax.lax.switch(
        h, [lambda hh=hh: cf_full[:, hh * sub:(hh + 1) * sub]
            for hh in range(per)]
    )


# Every dot that moves f32 keys/ranks/features MUST run at HIGHEST
# precision: the TPU MXU's default one-pass bf16 truncates f32 operands
# (nearby depth keys collide; ranks > 256 aren't even representable),
# silently corrupting the permutation. The split passes are exact here
# because one operand of every product is an exactly-representable 0/1.
_HI = jax.lax.Precision.HIGHEST


def _row_to_col(row: jnp.ndarray) -> jnp.ndarray:
    """(1, K) -> (K, 1) via an identity MXU contraction.

    Mosaic has no cheap lane->sublane relayout; one HIGHEST-precision matmul
    against the identity one-hot is exact and a single MXU call.
    """
    K = row.shape[1]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
           ).astype(jnp.float32)
    return jax.lax.dot_general(
        eye, row, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )  # (K, 1)


def _rank_by_depth(keys_row: jnp.ndarray, count) -> jnp.ndarray:
    """Front-to-back rank (1, K) of every column from its (1, K) depth keys.

    rank_j = #{i : (key_i, i) < (key_j, j)} — ties broken by slot index,
    matching the stable global argsort of the sort-based binners. One
    full-width (K, K) pairwise compare reduced by one MXU matmul (two MXU
    calls total — per-tile call latency, not FLOPs, dominates this kernel,
    so full-width single calls beat count-gated slab loops). Columns past
    ``count`` get a finite sentinel (NOT +inf: 0 * inf would poison the
    selection contractions with NaNs) and rank count..K-1 in index order,
    landing in the masked slot range.
    """
    K = keys_row.shape[1]
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, K), 1)
    keys = jnp.where(slot < count, keys_row, jnp.float32(1e30))
    kT = _row_to_col(keys)  # (K, 1): key_i down rows
    iT = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
    before = (kT < keys) | ((kT == keys) & (iT < col))  # (K, K)
    ones = jnp.ones((1, K), jnp.bfloat16)
    return jax.lax.dot_general(
        ones, before.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (1, K) integer-valued, exact in f32 (K <= 2^24)


def _onehot_from_rank(rank: jnp.ndarray) -> jnp.ndarray:
    """(K, K) permutation one-hot P[k, c] = (rank_k == c) from (1, K) ranks.

    sorted = blk @ P permutes feature columns front-to-back in ONE MXU call;
    the backward un-sorts with g @ P^T. Exact: each output element is a sum
    with exactly one nonzero f32 term.
    """
    K = rank.shape[1]
    rT = _row_to_col(rank)  # (K, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1).astype(jnp.float32)
    return (rT == col).astype(jnp.float32)


def _fwd_kernel(
    counts_ref,
    tile_ids_ref,
    feats_ref,
    accum_ref,
    logt_ref,
    nproc_ref,
    *rest,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_accum: int,
    sub_chunk: int,
    presort: bool = False,
    early_stop: bool = True,
):
    i = pl.program_id(0)
    t = tile_ids_ref[i]  # global tile id (differs from i under shard_map)
    count = counts_ref[i]
    K = feats_ref.shape[2]
    P = tile_h * tile_w
    px, py = _pixel_coords(t, tiles_x, tile_h, tile_w)

    if presort:
        # rank + sorted features are OUTPUTS: the backward consumes them
        # instead of recomputing the depth-rank permutation (the sort
        # recompute used to dominate the backward's per-tile MXU call count).
        rank_ref, sort_ref = rest
        rank_ref[0] = jnp.zeros((1, K), jnp.float32)
        sort_ref[0] = jnp.zeros((FEAT_DIM, K), jnp.float32)

        @pl.when(count > 0)
        def _sort():
            rank = _rank_by_depth(feats_ref[0, 5 + n_accum:6 + n_accum, :],
                                  count)
            osl = _onehot_from_rank(rank)
            rank_ref[0] = rank
            sort_ref[0] = jax.lax.dot_general(
                feats_ref[0], osl, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )

        src, lead = sort_ref, True
    else:
        src, lead = feats_ref, True

    sub = sub_chunk
    nchunks = pl.cdiv(count, sub)

    def body(j, carry):
        accum, logt = carry  # (ACCUM_DIM, P), (1, P)
        k0 = j * sub
        cf = _load_subchunk(src, j, chunk, sub, lead)  # (FEAT_DIM, SUB)
        slot = k0 + jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
        smask = slot < count  # (SUB, 1)
        alpha, _, _, _, _ = _chunk_alpha(cf, px, py, smask)
        l = jnp.log1p(-alpha)  # (SUB, P)
        cum = _prefix_sum(l)
        log_t_before = logt + cum - l  # exclusive prefix + carry
        w = alpha * jnp.exp(log_t_before)  # (SUB, P)
        rgbd = cf[6:6 + n_accum, :]  # (n_accum, SUB)
        accum = accum + jax.lax.dot_general(
            rgbd,
            w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logt = logt + cum[-1:, :]
        return accum, logt

    accum0 = jnp.zeros((n_accum, P), jnp.float32)
    logt0 = jnp.zeros((1, P), jnp.float32)
    if early_stop:
        # Dynamic trip count: stop once every pixel is saturated (max-pixel
        # log-T < LOG_T_STOP). The backward replays exactly `nproc`
        # sub-chunks, so gradients are exact for this primal.
        def w_cond(state):
            j, _, logt = state
            return (j < nchunks) & (jnp.max(logt) >= LOG_T_STOP)

        def w_body(state):
            j, accum, logt = state
            accum, logt = body(j, (accum, logt))
            return j + 1, accum, logt

        nproc, accum, logt = jax.lax.while_loop(
            w_cond, w_body, (jnp.int32(0), accum0, logt0)
        )
    else:
        accum, logt = jax.lax.fori_loop(0, nchunks, body, (accum0, logt0))
        nproc = nchunks
    accum_ref[0] = accum
    logt_ref[0] = logt
    # Mosaic requires the block's trailing dims to equal the array's:
    # broadcast the scalar into a (1, 128) i32 row (lane 0 read back outside).
    nproc_ref[0] = jnp.full((1, 128), nproc, jnp.int32)


def _bwd_kernel(
    counts_ref,
    tile_ids_ref,
    nproc_ref,
    feats_ref,
    logt_final_ref,
    g_accum_ref,
    g_logt_ref,
    *rest,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    n_accum: int,
    sub_chunk: int,
    presort: bool = False,
):
    if presort:
        # With presort, feats_ref holds the SORTED features persisted by the
        # forward and rank_ref its (1, K) depth ranks — no sort recompute.
        # Grads are computed in sorted space and un-sorted at the end with
        # one transposed-one-hot MXU matmul.
        rank_ref, grad_ref = rest
    else:
        (grad_ref,) = rest
    i = pl.program_id(0)
    t = tile_ids_ref[i]
    count = counts_ref[i]
    K = feats_ref.shape[2]
    P = tile_h * tile_w
    px, py = _pixel_coords(t, tiles_x, tile_h, tile_w)
    # Early-stop consistency: traverse exactly the sub-chunks the forward
    # processed; grads of dropped tail chunks are exactly zero for the
    # stopped primal.
    count_eff = jnp.minimum(count, nproc_ref[i] * sub_chunk)

    logt_final = logt_final_ref[0]  # (1, P)
    g_accum = g_accum_ref[0]  # (n_accum, P)
    g_logt = g_logt_ref[0]  # (1, P)

    src, lead = feats_ref, True
    grad_ref[0] = jnp.zeros((FEAT_DIM, K), jnp.float32)

    sub = sub_chunk
    per = chunk // sub
    nblocks = pl.cdiv(count_eff, chunk)

    # Tile-local pixel-moment basis for the spatial gradients: every
    # per-gaussian reduction sum_p q*{1, dx, dy, dx^2, dx*dy, dy^2} expands
    # (dx = px - mean_x) into moments of q against the FIXED basis
    # {1, x, y, x^2, xy, y^2} in tile-local coordinates — ONE (6, P)@(P, SUB)
    # matmul replaces five (SUB, P) elementwise products + six (SUB, P)
    # row-reductions per sub-chunk (the backward's dominant VPU traffic).
    # HIGHEST precision: the mean-shift expansion cancels up to ~3 orders
    # (x^2 terms ~4k vs results ~sigma^2); one-pass bf16 would destroy it.
    cx = jnp.sum(px) / px.shape[1]  # tile-center x (scalar)
    cy = jnp.sum(py) / py.shape[1]
    xl = px - cx  # (1, P) tile-local coords
    yl = py - cy
    basis = jnp.concatenate(
        [jnp.ones_like(xl), xl, yl, xl * xl, xl * yl, yl * yl], axis=0
    )  # (6, P)

    def sub_grads(cf, k0, s_after, b_after):
        """Gradient math for one (FEAT_DIM, SUB) sub-chunk (reverse order)."""
        slot = k0 + jax.lax.broadcasted_iota(jnp.int32, (sub, 1), 0)
        smask = slot < count_eff
        alpha, e, pgate, _, _ = _chunk_alpha(cf, px, py, smask)
        l = jnp.log1p(-alpha)

        rgbd = cf[6:6 + n_accum, :]  # (n_accum, SUB)
        # dL/dw_k per pixel = sum_c g_c * c_k  -> (SUB, P) matmul
        dldw = jax.lax.dot_general(
            rgbd,
            g_accum,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        cum = _prefix_sum(l)  # inclusive prefix within sub-chunk
        rcum = cum[-1:, :] - cum + l  # inclusive suffix within sub-chunk
        t_before = jnp.exp(logt_final - (s_after + rcum))
        w = alpha * t_before
        wd = w * dldw
        cw = _prefix_sum(wd)
        # exclusive suffix of w*dLdw over ALL later gaussians
        b_k = b_after + (cw[-1:, :] - cw)
        one_m = 1.0 - alpha  # >= 0.01 wherever alpha participates
        dalpha = t_before * dldw - (b_k + g_logt) / one_m
        dalpha = jnp.where(alpha > 0, dalpha, 0.0)

        # color/depth grads: contraction over pixels
        dcol = jax.lax.dot_general(
            w,
            g_accum,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (SUB, n_accum)

        if sub >= 128:
            # moment form (big granules): dop = sum_p q with q = dalpha*e on
            # unclamped covers; dpower = opacity*q contracted against the
            # tile-local basis in ONE matmul. Two HI matmuls per sub-chunk of
            # fixed cost — a win at sub=128 (measured -0.28 ms at 65k), a
            # LOSS at sub=64 where the fixed costs double per tile (5k
            # per-dispatch/t0 regressed ~8% before this gate).
            q = dalpha * jnp.where(pgate, e, 0.0)
            mom = jax.lax.dot_general(
                basis, q, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )  # (6, SUB)
            m0, m1x, m1y, m2xx, m2xy, m2yy = (mom[0:1], mom[1:2], mom[2:3],
                                              mom[3:4], mom[4:5], mom[5:6])
            mx = cf[0:1, :] - cx  # (1, SUB) tile-local mean
            my = cf[1:2, :] - cy
            ca = cf[2:3, :]
            cb = cf[3:4, :]
            cc = cf[4:5, :]
            op = cf[5:6, :]
            s_dx = m1x - mx * m0  # sum_p q * dx, etc.
            s_dy = m1y - my * m0
            s_dx2 = m2xx - 2.0 * mx * m1x + mx * mx * m0
            s_dxy = m2xy - mx * m1y - my * m1x + mx * my * m0
            s_dy2 = m2yy - 2.0 * my * m1y + my * my * m0
            rows = [
                op * (ca * s_dx + cb * s_dy),  # d mean_x = -rsum(ddx)
                op * (cc * s_dy + cb * s_dx),  # d mean_y
                op * (-0.5) * s_dx2,  # d conic_a
                op * (-1.0) * s_dxy,  # d conic_b
                op * (-0.5) * s_dy2,  # d conic_c
                m0,  # d opacity
            ]
            # assemble via broadcast-select, NOT an 8-way concat of (1, SUB)
            # row slices: the mom/cf slices carry distinct sublane/lane
            # offsets and Mosaic's tpu.concatenate rejects offset-mismatched
            # inputs (hit on hardware; interpret mode doesn't see layouts)
            riota = jax.lax.broadcasted_iota(jnp.int32, (6, sub), 0)
            top = rows[0] * (riota == 0)
            for i in range(1, 6):
                top = top + rows[i] * (riota == i)
            # canonicalize the block's vector layout through a tiny identity
            # matmul (sub-chunk h > 0 data sits at lane offset h*sub from
            # the aligned-load switch slice; MXU outputs are canonical).
            # HIGHEST: f32 gradients — one-pass bf16 would truncate.
            eye6 = (jax.lax.broadcasted_iota(jnp.int32, (6, 6), 0)
                    == jax.lax.broadcasted_iota(jnp.int32, (6, 6), 1)
                    ).astype(jnp.float32)
            top = jax.lax.dot_general(
                eye6, top, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI)
            gsub = jnp.concatenate(
                [
                    top,  # (6, SUB)
                    dcol.T,  # (n_accum, SUB): d colors..., depth
                    jnp.zeros((FEAT_DIM - 6 - n_accum, sub), jnp.float32),
                ],
                axis=0,
            )  # (FEAT_DIM, SUB)
            return gsub, s_after + cum[-1:, :], b_after + cw[-1:, :]

        # elementwise form (fine granules): direct (SUB, P) products +
        # row reductions — no per-sub-chunk fixed matmul costs
        dx = px - cf[0, :][:, None]
        dy = py - cf[1, :][:, None]
        op = cf[5, :][:, None]
        pre = op * e
        dop = dalpha * jnp.where(pgate, e, 0.0)
        dpower = dalpha * jnp.where(pgate, pre, 0.0)
        ca = cf[2, :][:, None]
        cb = cf[3, :][:, None]
        cc = cf[4, :][:, None]
        da = dpower * (-0.5 * dx * dx)
        db = dpower * (-dx * dy)
        dc = dpower * (-0.5 * dy * dy)
        ddx = dpower * (-ca * dx - cb * dy)
        ddy = dpower * (-cc * dy - cb * dx)

        def rsum(x):  # (SUB, P) -> row (1, SUB)
            return jnp.sum(x, axis=1)[None, :]

        gsub = jnp.concatenate(
            [
                rsum(-ddx),  # d mean_x
                rsum(-ddy),  # d mean_y
                rsum(da),
                rsum(db),
                rsum(dc),
                rsum(dop),
                dcol.T,  # (n_accum, SUB): d colors..., depth
                jnp.zeros((FEAT_DIM - 6 - n_accum, sub), jnp.float32),
            ],
            axis=0,
        )  # (FEAT_DIM, SUB)
        return gsub, s_after + cum[-1:, :], b_after + cw[-1:, :]

    def body(jj, carry):
        s_after, b_after = carry  # (1, P) suffixes over later gaussians
        b = nblocks - 1 - jj
        k0b = b * chunk
        if lead:
            cf_full = src[0, :, pl.ds(k0b, chunk)]  # (FEAT_DIM, chunk)
        else:
            cf_full = src[:, pl.ds(k0b, chunk)]
        gsubs = [None] * per
        # sub-chunks in reverse depth order; lax.cond skips fully-dead ones
        for h in range(per - 1, -1, -1):
            k0 = k0b + h * sub
            cf = cf_full[:, h * sub:(h + 1) * sub]
            gsub, s_after, b_after = jax.lax.cond(
                k0 < count_eff,
                lambda cf, s_a, b_a, k0=k0: sub_grads(cf, k0, s_a, b_a),
                lambda cf, s_a, b_a: (
                    jnp.zeros((FEAT_DIM, sub), jnp.float32), s_a, b_a
                ),
                cf, s_after, b_after,
            )
            gsubs[h] = gsub
        gblock = gsubs[0] if per == 1 else jnp.concatenate(gsubs, axis=1)
        grad_ref[0, :, pl.ds(k0b, chunk)] = gblock
        return s_after, b_after

    zero = jnp.zeros((1, P), jnp.float32)
    jax.lax.fori_loop(0, nblocks, body, (zero, zero))
    if presort:
        # un-sort in place: grad_unsorted[:, k] = grad_sorted[:, rank_k] =
        # (g_sorted @ P^T)[:, k] — one HIGHEST MXU matmul (exact f32 x 0/1
        # products; the MXU default would truncate f32 grads to bf16).
        @pl.when(count_eff > 0)
        def _unsort():
            osl = _onehot_from_rank(rank_ref[0])
            grad_ref[0] = jax.lax.dot_general(
                grad_ref[0], osl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HI,
            )


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tile_h", "tile_w", "chunk", "interpret",
                     "n_accum", "sub_chunk", "presort", "early_stop"),
)
def composite_tiles_pallas(
    tile_feats: jnp.ndarray,
    counts: jnp.ndarray,
    *,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,
    n_accum: int = ACCUM_DIM,
    sub_chunk: int | None = None,
    presort: bool = False,
    early_stop: bool = True,
):
    """Forward compositing. tile_feats (T, FEAT_DIM, K), counts (T,) int32.

    tile_ids maps array rows to global tile indices for pixel-coordinate
    computation (defaults to arange; sharded callers pass their slice).
    With ``presort`` the per-tile lists may arrive in ANY order: the kernel
    sorts feature columns front-to-back in VMEM first (`_rank_by_depth` +
    one one-hot MXU matmul).
    Returns accum (T, ACCUM_DIM, P), final log-transmittance (T, 1, P), and
    nproc (T,) — sub-chunks processed before the early-termination stop
    (== ceil(count/sub_chunk) when ``early_stop`` is off or never fires).
    With ``presort`` two more outputs follow: rank (T, 1, K) and the sorted
    features (T, F, K) — feed all three to `composite_tiles_pallas_bwd` so
    the backward skips the sort recompute entirely.
    """
    T, F, K = tile_feats.shape
    assert F == FEAT_DIM and K % chunk == 0
    if tile_ids is None:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
    P = tile_h * tile_w
    out_specs = [
        pl.BlockSpec((1, n_accum, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 128), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, n_accum, P), jnp.float32),
        jax.ShapeDtypeStruct((T, 1, P), jnp.float32),
        jax.ShapeDtypeStruct((T, 1, 128), jnp.int32),
    ]
    if presort:
        out_specs += [
            pl.BlockSpec((1, 1, K), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, K), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct((T, 1, K), jnp.float32),
            jax.ShapeDtypeStruct((T, F, K), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, F, K), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
    )
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w,
        chunk=chunk, n_accum=n_accum, sub_chunk=sub_chunk or chunk,
        presort=presort, early_stop=early_stop,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * T * K * P * 12,
            bytes_accessed=T * (F * K + n_accum * P + P) * 4,
            transcendentals=3 * T * K * P,
        ),
    )(counts, tile_ids, tile_feats)
    accum, logt, nproc = outs[:3]
    if presort:
        return accum, logt, nproc[:, 0, 0], outs[3], outs[4]
    return accum, logt, nproc[:, 0, 0]


@functools.partial(
    jax.jit,
    static_argnames=("tiles_x", "tile_h", "tile_w", "chunk", "interpret",
                     "n_accum", "sub_chunk", "presort"),
)
def composite_tiles_pallas_bwd(
    tile_feats: jnp.ndarray,
    counts: jnp.ndarray,
    logt_final: jnp.ndarray,
    g_accum: jnp.ndarray,
    g_logt: jnp.ndarray,
    *,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    interpret: bool = False,
    tile_ids: jnp.ndarray | None = None,
    n_accum: int = ACCUM_DIM,
    sub_chunk: int | None = None,
    presort: bool = False,
    nproc: jnp.ndarray | None = None,
    rank: jnp.ndarray | None = None,
):
    """Backward compositing: gradient w.r.t. tile_feats, dense (T, F, K).

    With ``presort``, ``tile_feats`` must be the SORTED features persisted
    by the forward and ``rank`` its (T, 1, K) depth ranks; the gradient
    comes back in the ORIGINAL input column order (one transposed-one-hot
    un-sort matmul per tile — no sort recompute).
    ``nproc`` (T,) is the forward's early-termination chunk count; the
    traversal covers exactly that prefix (defaults to all chunks).
    """
    T, F, K = tile_feats.shape
    assert F == FEAT_DIM and K % chunk == 0
    assert (rank is not None) == presort, "presort needs the forward's rank"
    if tile_ids is None:
        tile_ids = jnp.arange(T, dtype=jnp.int32)
    sub = sub_chunk or chunk
    if nproc is None:
        nproc = jnp.full((T,), K // sub, jnp.int32)
    P = tile_h * tile_w
    in_specs = [
        pl.BlockSpec((1, F, K), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n_accum, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    ]
    inputs = [tile_feats, logt_final, g_accum, g_logt]
    if presort:
        in_specs.append(
            pl.BlockSpec((1, 1, K), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM))
        inputs.append(rank)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, F, K), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, tile_h=tile_h, tile_w=tile_w,
        chunk=chunk, n_accum=n_accum, sub_chunk=sub,
        presort=presort,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((T, F, K), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * K * P * 30,
            bytes_accessed=T * (2 * F * K + 2 * n_accum * P + 2 * P) * 4,
            transcendentals=3 * T * K * P,
        ),
    )(counts, tile_ids, nproc.astype(jnp.int32), *inputs)


def composite_tiles_xla(
    tile_feats: jnp.ndarray,
    counts: jnp.ndarray,
    *,
    tiles_x: int,
    tile_h: int,
    tile_w: int,
    chunk: int = 128,
    tile_ids: jnp.ndarray | None = None,
    n_accum: int = ACCUM_DIM,
    sub_chunk: int | None = None,
    presort: bool = False,
    early_stop: bool = True,
):
    """Pure-XLA twin of the Pallas forward (any backend, differentiable).

    Identical math on full-K blocks, `lax.map` over tiles to bound memory.
    Used as the CPU/GPU fallback and as the test oracle for the kernels.
    ``presort`` accepts unordered per-tile lists (sorts columns by the depth
    row, stop-gradient permutation — autodiff routes grads through the
    gather). ``early_stop`` emulates the kernel's tile-level termination at
    exactly the same sub-chunk granularity: contributions from sub-chunks
    past the first fully-saturated boundary (max-pixel log-T < LOG_T_STOP)
    are dropped, so twin and kernel stay bit-comparable.

    Memory: `one_tile` is rematerialized (`jax.checkpoint`) — under `jax.vjp`
    only the (F, K) tile inputs are saved and the (K, P) alpha/cumsum
    intermediates are recomputed in the backward. Without this, a 720p
    backward saves ~10 (512, 2048) f32 arrays per tile x 450 tiles x
    n_devices and OOMs the host (the round-2 `dryrun_multichip` rc-137 at
    127 GB RSS). The early-stop gate reuses ONE alpha pass (stop-gradient
    cumsum over the same alpha), not a second `_chunk_alpha` call.
    """
    T, F, K = tile_feats.shape
    P = tile_h * tile_w
    sub = sub_chunk or chunk

    @jax.checkpoint
    def one_tile(args):
        cf, count, tile_idx = args  # (F, K), (), ()
        px, py = _pixel_coords(tile_idx, tiles_x, tile_h, tile_w)
        if presort:
            key = jnp.where(jnp.arange(K) < count,
                            cf[5 + n_accum], jnp.float32(1e30))
            perm = jax.lax.stop_gradient(jnp.argsort(key, stable=True))
            cf = cf[:, perm]
        slot = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)
        alpha, _, _, _, _ = _chunk_alpha(cf, px, py, slot < count)
        if early_stop:
            a0 = jax.lax.stop_gradient(alpha)
            cum0 = jnp.cumsum(jnp.log1p(-a0), axis=0)
            b = cum0[sub - 1::sub].max(axis=1)
            sat = b < LOG_T_STOP  # (K//sub,)
            nproc = jnp.where(sat.any(), jnp.argmax(sat) + 1, K // sub)
            nproc = jnp.minimum(nproc, -(-count // sub))
            count_eff = jnp.minimum(count, nproc * sub)
            alpha = jnp.where(slot < count_eff, alpha, 0.0)
        l = jnp.log1p(-alpha)
        cum = jnp.cumsum(l, axis=0)
        w = alpha * jnp.exp(cum - l)
        rgbd = cf[6:6 + n_accum, :]
        accum = rgbd @ w  # (n_accum, P)
        logt = cum[-1:, :]
        return accum, logt

    tile_idxs = (
        jnp.arange(T, dtype=jnp.int32) if tile_ids is None else tile_ids
    )
    accum, logt = jax.lax.map(
        one_tile, (tile_feats, counts, tile_idxs), batch_size=min(T, 32)
    )
    return accum, logt
