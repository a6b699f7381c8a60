"""Differentiable Gaussian rasterization: projection -> binning -> compositing.

Public TPU-native replacement for the CUDA `GaussianRasterizer` consumed by
the reference (`src/render/renderer.py:3-4,22`, `src/tracking/train_utils.py:178`).
The pipeline is:

  1. `project_gaussians` — pure JAX, differentiated by autodiff.
  2. `bin_gaussians`     — integer index tables, non-differentiable.
  3. feature gather      — plain `take`, whose VJP is the scatter-add that
                           routes per-tile gradient blocks back to Gaussians.
  4. `composite`         — custom_vjp around the Pallas fwd/bwd kernels
                           (XLA twin on non-TPU backends).
  5. background blend + tile reassembly — pure JAX.

Outputs match the reference rasterizer contract: (im (3,H,W), radius (N,),
depth (H,W)), plus final transmittance. An optional (N, 2) ``mean2d_offset``
input reproduces the reference's ``means2D`` dummy whose gradient drives
densification (`src/tracking/helpers.py:43`, `external.py:141-145`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp

from gsdx.core.cameras import Camera
from gsdx.kernels.composite import (
    FEAT_DIM,
    composite_tiles_pallas,
    composite_tiles_pallas_bwd,
    composite_tiles_xla,
)
from gsdx.render.binning import (
    TileBins,
    TileGrid,
    bin_gaussians,
    bin_gaussians_blocksearch,
    bin_gaussians_mask,
    bin_gaussians_unsorted,
    sort_bins_by_depth,
)
from gsdx.render.projection import project_gaussians


# Static-N crossover for binning="auto": below this the mask binner's
# O(tiles*N*K) compare-sum beats the latency-bound pair sort (TPU v5e
# fwd+bwd: 5k: 6.0 vs 8.7 ms; 16k: ~14 vs 10.0; 65k: 61 vs 14.7).
BINNING_AUTO_N = 8192

# For binning="blocksearch": backward feature-gradient routing crossover.
# Below this the (N, max_dup) inverse-map gather-sum wins; above it the T*K
# scatter-add does: gather cost scales with N*max_dup rows while the scatter
# is a fixed T*K rows, and big-source row gathers degrade sharply on TPU v5e
# (benchmarks/profile_binning_variants.py: +16..+27 ms for (65k, 16) maps).
BWD_INVMAP_MAX_N = 12288

# Live-tile compaction cap for frozen-bin callers (see the compact branch in
# `rasterize`): when a scene's live tile count is at most this, the feature
# gather + compositor grid shrink to the leading live tiles of the bin-time
# live-first order (160 of 450 tiles at 720p/16x128 — the measured optimum
# for object-centric scenes: TPU v5e 65k A/B 160: 4.67 ms/iter vs 192: 4.76
# vs 256: 4.92 vs uncompacted: 5.24). Scenes with broader coverage take the
# exact full-grid fallback branch.
LIVE_COMPACT_CAP = 160


class RasterizeConfig(NamedTuple):
    """Static rasterizer configuration (hashable; part of jit cache keys).

    Defaults tuned on TPU v5e (tile 16x128, dup 16, K 512): per-tile work
    (gathers + compositor VMEM) scales with tiles*K, while max_dup bounds
    the pair-table size; gaussians whose bbox exceeds max_dup tiles get
    truncated coverage, so keep max_dup >= the expected splat footprint
    (radius <= ~50 px at 16x128 tiles).
    """

    # 0 = auto by static N: 32 below ~BINNING_AUTO_N, 16 above. The
    # compositor is bound by a ~2-3 us FIXED cost per (tile, sub-chunk)
    # granule (benchmarks/probe_transcendental.py), so taller tiles amortize
    # it: 5k/720p fwd+bwd scan measured 353.6 Mpix/s at tile_h=32/sub 64 vs
    # 250.9 at 16 (+41%, benchmarks/probe_tile32.py). At 65k it LOSES (193.5
    # vs 206.7: saturated tiles early-stop later when a granule must wait on
    # 4096 pixels, and K-overflow doubles) — hence the N-gated auto.
    tile_h: int = 0
    tile_w: int = 128
    max_per_tile: int = 512  # K: per-tile Gaussian capacity (multiple of chunk)
    max_dup: int = 16  # tile duplicates per Gaussian
    chunk: int = 128  # Gaussians per aligned compositing block
    # Compute granule within a block (divides chunk). 0 = auto by static N:
    # 64 in the low-occupancy mask regime (finer count-gating wins), 128 at
    # large N where near-full tiles favor full-width granules (within-session
    # A/B, TPU v5e fwd+bwd: 5k 64: 5.51 vs 128: ~5.5+; 65k 128: 12.35 vs
    # 64: 12.58 vs 32: 13.1).
    sub_chunk: int = 0
    # Tile-level early termination once every pixel's transmittance < 1e-4
    # (the CUDA reference's per-pixel stop, applied conservatively per tile;
    # output differs from no-stop by < 1e-4 — the reference's own bound).
    early_stop: bool = True
    backend: str = "auto"  # "auto" | "pallas" | "pallas_interpret" | "xla"
    # "auto" picks per static N: "mask" (sort-free compare-sum binning, wins
    # below ~BINNING_AUTO_N where its O(tiles*N) work beats the latency-bound
    # pair sort) else "sort". "blocksearch" is the two-phase block-search
    # variant (opt-in). All produce bit-identical bins.
    # "nosort": original-order binning + in-kernel per-tile depth sort
    binning: str = "auto"  # "auto"|"sort"|"mask"|"blocksearch"|"unsorted"|"nosort"
    # K-overflow depth-threshold resolution for the unsorted/nosort binners
    # (`bin_gaussians_unsorted`): overflow tiles keep covers up to the bucket
    # that cumulatively holds K. More buckets = tighter approximate
    # nearest-K on very dense scenes (>=30k live: 256 buckets cost up to
    # ~1 dB vs exact nearest-K, see benchmarks/drive_koverflow.py); the
    # histogram is one (T,N)@(N,D) bf16 matmul, so the cost is ~linear in D.
    depth_buckets: int = 256

    def use_pallas(self) -> bool:
        if self.backend == "auto":
            return jax.default_backend() == "tpu"
        return self.backend in ("pallas", "pallas_interpret")

    @property
    def interpret(self) -> bool:
        return self.backend == "pallas_interpret"


@flax.struct.dataclass
class RenderOutput:
    im: jnp.ndarray  # (3, H, W) color with background blended
    radius: jnp.ndarray  # (N,) screen radius in pixels (0 = culled)
    depth: jnp.ndarray  # (H, W) alpha-composited depth
    final_t: jnp.ndarray  # (H, W) residual transmittance


# --------------------------------------------------------------------------
# composite: custom_vjp boundary around the Pallas kernels
# --------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite(tile_feats, counts, tile_ids, grid: TileGrid,
               cfg: RasterizeConfig, n_accum: int):
    accum, logt, _ = _composite_impl(tile_feats, counts, tile_ids, grid, cfg,
                                     n_accum)
    return accum, logt


def _composite_impl(tile_feats, counts, tile_ids, grid: TileGrid,
                    cfg: RasterizeConfig, n_accum: int):
    """Returns (accum, logt, aux) — aux is (nproc, rank, sorted_feats) from
    the Pallas forward: early-stop chunk counts plus (with presort) the
    persisted depth ranks and sorted features the backward consumes instead
    of recomputing the sort. aux is None on the XLA path, whose autodiff
    handles everything internally."""
    presort = cfg.binning == "nosort"
    kwargs = dict(
        tiles_x=grid.tiles_x, tile_h=grid.tile_h, tile_w=grid.tile_w,
        chunk=cfg.chunk, n_accum=n_accum, presort=presort,
        early_stop=cfg.early_stop, tile_ids=tile_ids,
    )
    if cfg.use_pallas():
        out = composite_tiles_pallas(
            tile_feats, counts, interpret=cfg.interpret,
            sub_chunk=cfg.sub_chunk, **kwargs
        )
        if presort:
            accum, logt, nproc, rank, sorted_feats = out
            return accum, logt, (nproc, rank, sorted_feats)
        accum, logt, nproc = out
        return accum, logt, (nproc, None, None)
    accum, logt = composite_tiles_xla(
        tile_feats, counts, sub_chunk=cfg.sub_chunk, **kwargs)
    return accum, logt, None


def _composite_fwd(tile_feats, counts, tile_ids, grid, cfg, n_accum):
    accum, logt, aux = _composite_impl(tile_feats, counts, tile_ids, grid,
                                       cfg, n_accum)
    if aux is not None and aux[2] is not None:
        # presort: residuals carry the SORTED features + rank instead of the
        # input features (same footprint; the backward needs sorted space).
        nproc, rank, sorted_feats = aux
        return (accum, logt), (sorted_feats, counts, tile_ids, logt, nproc,
                               rank)
    nproc = aux[0] if aux is not None else None
    return (accum, logt), (tile_feats, counts, tile_ids, logt, nproc, None)


def _composite_bwd(grid, cfg, n_accum, res, g):
    tile_feats, counts, tile_ids, logt, nproc, rank = res
    g_accum, g_logt = g
    kwargs = dict(
        tiles_x=grid.tiles_x, tile_h=grid.tile_h, tile_w=grid.tile_w,
        chunk=cfg.chunk, n_accum=n_accum, presort=cfg.binning == "nosort",
        tile_ids=tile_ids,
    )
    if cfg.use_pallas():
        grad_feats = composite_tiles_pallas_bwd(
            tile_feats, counts, logt, g_accum, g_logt, nproc=nproc,
            rank=rank, interpret=cfg.interpret, sub_chunk=cfg.sub_chunk,
            **kwargs
        )
    else:
        # Differentiate the XLA twin directly.
        _, vjp = jax.vjp(
            lambda f: composite_tiles_xla(
                f, counts, sub_chunk=cfg.sub_chunk,
                early_stop=cfg.early_stop, **kwargs),
            tile_feats,
        )
        (grad_feats,) = vjp((g_accum, g_logt))
    return grad_feats, None, None


_composite.defvjp(_composite_fwd, _composite_bwd)


# Static cap on the live-tile compaction in `_take_rows`'s backward: tiles
# whose gradient block is entirely zero (empty tiles — most of the frame in
# object-centric scenes) are skipped, and the scatter-add runs on at most
# this many compacted tiles; a cond-gated fallback scatters the rest only
# when more tiles are live. TPU scatter cost is index-count-bound
# (sort + segmented apply, ~3.3 ms for the full 450x512 table at 720p), so
# dropping dead tiles cuts it proportionally; skipped all-zero rows change
# nothing — bitwise-exact either way.
_SCATTER_LIVE_CAP = 128


@jax.custom_vjp
def _take_rows(feats, idx):
    """Row gather with an explicit compacted scatter-add backward.

    XLA's autodiff-generated transpose of gather lowers to a serialized
    scatter on TPU (measured ~5 ms at (450, 512) x 16 vs 0.03 ms for an
    explicit `.at[].add`); this custom VJP pins the fast lowering and
    compacts away all-zero tile rows first (see `_SCATTER_LIVE_CAP`).
    """
    return feats[idx]


def _take_rows_fwd(feats, idx):
    return feats[idx], (idx, feats.shape[0])


def _take_rows_bwd(res, g):
    idx, n = res
    T = g.shape[0]
    cap = min(T, _SCATTER_LIVE_CAP)
    if cap == T:
        grad = jnp.zeros((n, g.shape[-1]), g.dtype).at[idx].add(g)
        return grad, None
    # live tiles first (stable 450-key argsort — small sorts are cheap; it's
    # the quarter-million-index scatter that isn't)
    live = jnp.any(g != 0.0, axis=tuple(range(1, g.ndim)))
    order = jnp.argsort(jnp.where(live, 0, 1), stable=True).astype(jnp.int32)
    head = order[:cap]
    grad = jnp.zeros((n, g.shape[-1]), g.dtype).at[idx[head]].add(g[head])
    tail = order[cap:]
    grad = jax.lax.cond(
        live.sum() > cap,
        lambda gr: gr.at[idx[tail]].add(g[tail]),
        lambda gr: gr,
        grad,
    )
    return grad, None


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


@jax.custom_vjp
def _permute_rows(x, perm, inv_perm):
    """Permutation row gather; backward is the inverse-permutation gather
    (autodiff would transpose it into a scatter)."""
    return x[perm]


def _permute_rows_fwd(x, perm, inv_perm):
    return x[perm], inv_perm


def _permute_rows_bwd(inv_perm, g):
    return g[inv_perm], None, None


_permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@jax.custom_vjp
def _take_rows_invmap(feats, idx, inv_tile, inv_slot):
    """Row gather whose backward is a gather-sum over the binning inverse map.

    Each Gaussian's gradient is the sum of its <= max_dup per-tile gradient
    rows, located by (inv_tile, inv_slot) — all gathers, no scatter at all
    (the scatter-add VJP of `_take_rows` still costs ~2.8 ms at bench scale;
    this runs in the gather regime TPUs are fast at).
    """
    return feats[idx]


def _take_rows_invmap_fwd(feats, idx, inv_tile, inv_slot):
    return feats[idx], (inv_tile, inv_slot, idx.shape[1])


def _take_rows_invmap_bwd(res, g):
    inv_tile, inv_slot, k = res
    gflat = g.reshape(-1, g.shape[-1])  # (T*K, F)
    lin = inv_tile * k + jnp.maximum(inv_slot, 0)  # (N, max_dup)
    used = (inv_slot >= 0).astype(g.dtype)[..., None]
    grad = (gflat[lin] * used).sum(axis=1)  # (N, F)
    return grad, None, None, None


_take_rows_invmap.defvjp(_take_rows_invmap_fwd, _take_rows_invmap_bwd)


# --------------------------------------------------------------------------
# full rasterization
# --------------------------------------------------------------------------


def _assemble_image(tiled: jnp.ndarray, grid: TileGrid) -> jnp.ndarray:
    """(T, C, P) per-tile channel-major pixels -> (C, H, W) cropped image."""
    T, C, P = tiled.shape
    ty, tx = grid.tiles_y, grid.tiles_x
    th, tw = grid.tile_h, grid.tile_w
    x = tiled.reshape(ty, tx, C, th, tw)
    x = x.transpose(2, 0, 3, 1, 4).reshape(C, ty * th, tx * tw)
    return x[:, : grid.height, : grid.width]


def resolve_binning(cfg: RasterizeConfig, n: int) -> RasterizeConfig:
    """Pin `binning="auto"` / `sub_chunk=0` / `tile_h=0` to their static-N
    choices. Must run before any TileGrid is built from the config."""
    binning = cfg.binning
    if binning == "auto":
        binning = "mask" if n <= BINNING_AUTO_N else "nosort"
    sub_chunk = cfg.sub_chunk or (64 if n <= BINNING_AUTO_N else 128)
    # tall tiles only with sub<=64 granules: 32x128 tiles with 128-wide
    # granules exceed the 16 MB scoped-VMEM budget in the backward
    tile_h = cfg.tile_h or (
        32 if (n <= BINNING_AUTO_N and sub_chunk <= 64) else 16)
    return cfg._replace(binning=binning, sub_chunk=sub_chunk, tile_h=tile_h)


def compute_bins(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    camera: Camera,
    cfg: RasterizeConfig,
    live: jnp.ndarray | None = None,
    margin_px: float = 0.0,
) -> TileBins:
    """Project + bin only, for callers that reuse bins across several
    optimizer steps (`bin_refresh` in the tracking loop): per-step Gaussian
    motion is a fraction of a pixel, so tile coverage goes stale far slower
    than depth order — which the `"nosort"` compositor re-sorts in-kernel
    from CURRENT depths every step. Gradients stay exact for the
    stale-coverage forward (the routing tables are the ones the forward
    used). ``margin_px`` inflates the binning radius so coverage stays a
    SUPERSET of the true coverage for any drift up to that many pixels —
    extra covers evaluate to alpha ~ 0, so reused bins change the output
    only through K-capacity pressure, not through dropped contributions.
    Always bins in `"nosort"` form (original-order lists + inverse map below
    `BWD_INVMAP_MAX_N`) — the only form whose tables stay valid under
    changing depths.
    """
    n = means3d.shape[0]
    cfg = resolve_binning(cfg, n)
    grid = TileGrid(height=camera.height, width=camera.width,
                    tile_h=cfg.tile_h, tile_w=cfg.tile_w)
    proj = project_gaussians(means3d, quats, scales, camera, live=live)
    radius = proj.radius
    if margin_px:
        radius = jnp.where(radius > 0, radius + margin_px, radius)
    bins = bin_gaussians_unsorted(
        jax.lax.stop_gradient(proj.mean2d),
        jax.lax.stop_gradient(radius),
        jax.lax.stop_gradient(proj.depth),
        proj.mask, grid,
        max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup,
        depth_buckets=cfg.depth_buckets,
        with_inverse=n <= BWD_INVMAP_MAX_N,
    )
    # live-first tile order for the compaction fast path (a ~450-key sort,
    # amortized over the frozen-bin block like everything else here)
    dead = (bins.counts <= 0).astype(jnp.int32)
    tile_order = jnp.argsort(dead, stable=True).astype(jnp.int32)
    return bins.replace(tile_order=tile_order,
                        n_live=jnp.sum(1 - dead).astype(jnp.int32))


def rasterize(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    camera: Camera,
    cfg: RasterizeConfig = RasterizeConfig(),
    live: jnp.ndarray | None = None,
    mean2d_offset: jnp.ndarray | None = None,
    bg: jnp.ndarray | None = None,
    bins: TileBins | None = None,
) -> RenderOutput:
    """Render N Gaussians through one camera. Differentiable in all float args.

    Args mirror the reference rendervar (`src/tracking/helpers.py:36-45`):
    quats may be unnormalized; opacities in [0,1] (post-sigmoid); scales
    positive (post-exp); colors (N, C) precomputed channels — C may exceed 3
    to fuse several color targets (e.g. rgb + seg) into one pass; ``bg``
    overrides the camera background (broadcast/zero-padded to C channels).
    """
    n = means3d.shape[0]
    n_chan = colors.shape[1]
    assert 6 + n_chan + 1 <= FEAT_DIM, f"too many color channels: {n_chan}"
    if bins is not None and cfg.binning == "auto":
        # Caller-supplied bins (reuse across passes/steps) are built by
        # `compute_bins` in original-order "nosort" form — the compositor's
        # in-kernel depth sort keeps them valid under changing depths.
        cfg = cfg._replace(binning="nosort")
    # Resolve auto choices (binning / sub_chunk / tile_h) BEFORE the grid is
    # built — compute_bins resolves with the same static n, so caller-
    # supplied bins always match this grid.
    cfg = resolve_binning(cfg, n)
    grid = TileGrid(
        height=camera.height, width=camera.width, tile_h=cfg.tile_h, tile_w=cfg.tile_w
    )

    proj = project_gaussians(means3d, quats, scales, camera, live=live)
    mean2d = proj.mean2d
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    bin_args = (
        jax.lax.stop_gradient(mean2d),
        jax.lax.stop_gradient(proj.radius),
        jax.lax.stop_gradient(proj.depth),
        proj.mask,
        grid,
    )
    # Measured crossovers (benchmarks/bench_unsorted_ab.py, TPU v5e,
    # fwd+bwd 720p): mask compare-sum wins below ~8k (5k: 6.2 vs 7.8
    # nosort); above it the sort-free nosort path (original-order
    # binning + in-kernel depth-rank sort) beats the pair sort by
    # 13-25% (16k: 9.1 vs 10.4; 65k: 12.3 vs 15.7; 65k-cap/15k-live
    # 6ch: 12.4 vs 15.3). Trade-off above: K-overflow tiles truncate to
    # approximately (bucket-resolution) nearest-K instead of exactly
    # nearest-K — see `bin_gaussians_unsorted`. (cfg already resolved above.)
    binning = cfg.binning
    if bins is not None:
        pass  # caller-supplied bins (reuse across passes / steps)
    elif binning in ("unsorted", "nosort"):
        # No global depth argsort anywhere: bin over the original gaussian
        # axis. "unsorted" restores front-to-back order with a batched
        # (T, K) stable sort here; "nosort" leaves the lists unordered and
        # the compositor sorts columns in VMEM (`_presort_onehot`).
        bins = bin_gaussians_unsorted(
            *bin_args, max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup,
            depth_buckets=cfg.depth_buckets,
            with_inverse=n <= BWD_INVMAP_MAX_N,
        )
        if binning == "unsorted":
            bins = sort_bins_by_depth(
                TileBins(gauss_idx=bins.gauss_idx, counts=bins.counts),
                bin_args[2])
    elif binning == "blocksearch":
        use_invmap = n <= BWD_INVMAP_MAX_N
        bins = bin_gaussians_blocksearch(
            *bin_args, max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup,
            with_inverse=use_invmap, with_gauss_idx=not use_invmap,
        )
    elif binning == "mask":
        bins = bin_gaussians_mask(
            *bin_args, max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup,
            with_gauss_idx=False,
        )
    else:
        bins = bin_gaussians(
            *bin_args, max_per_tile=cfg.max_per_tile, max_dup=cfg.max_dup,
        )

    feats = jnp.concatenate(
        [
            mean2d,  # 0:2
            proj.conic,  # 2:5
            opacities.reshape(n, 1) * proj.mask[:, None],  # 5
            colors,  # 6:6+C
            proj.depth[:, None],  # 6+C
            jnp.zeros((n, FEAT_DIM - 7 - n_chan), mean2d.dtype),
        ],
        axis=-1,
    )  # (N, FEAT_DIM)
    all_tiles = jnp.arange(grid.num_tiles, dtype=jnp.int32)
    if bins.inv_tile is not None and bins.order is not None:
        # Sorted-space composition: one permutation gather, then a row gather
        # by per-tile positions; gradients ride the inverse map + inverse
        # permutation (gathers only — no scatter on the backward path).
        feats_sorted = _permute_rows(feats, bins.order, bins.inv_order)
        tile_feats = _take_rows_invmap(
            feats_sorted, bins.pos, bins.inv_tile, bins.inv_slot
        ).transpose(0, 2, 1)  # (T, F, K)
        accum, logt = _composite(tile_feats, bins.counts, all_tiles, grid,
                                 cfg, n_chan + 1)
    elif bins.inv_tile is not None:
        # Original-order inverse map (nosort binning): same gather-only
        # backward, no permutation at all.
        tile_feats = _take_rows_invmap(
            feats, bins.gauss_idx, bins.inv_tile, bins.inv_slot
        ).transpose(0, 2, 1)
        accum, logt = _composite(tile_feats, bins.counts, all_tiles, grid,
                                 cfg, n_chan + 1)
    elif (bins.tile_order is not None
          and grid.num_tiles > LIVE_COMPACT_CAP):
        # Live-tile compaction (frozen-bin big-N regime): when the live
        # tile count fits the static cap, gather + composite only the
        # leading live tiles of the bin-time live-first order and scatter
        # the per-tile outputs back (object-centric scenes leave most of
        # the frame empty; the r4 probe measured ~0.5 ms/iter of dead-tile
        # gather/grid overhead at 65k/720p). The fallback branch is the
        # exact full-grid path, so results are identical either way (dead
        # tiles have counts == 0 and contribute zeros).
        T = grid.num_tiles
        cap = LIVE_COMPACT_CAP

        def compact_branch(feats):
            sel = jax.lax.stop_gradient(bins.tile_order[:cap])
            tf = _take_rows(feats, bins.gauss_idx[sel]).transpose(0, 2, 1)
            acc_c, logt_c = _composite(tf, bins.counts[sel], sel, grid, cfg,
                                       n_chan + 1)
            accum = jnp.zeros((T,) + acc_c.shape[1:], acc_c.dtype
                              ).at[sel].set(acc_c)
            logt = jnp.zeros((T,) + logt_c.shape[1:], logt_c.dtype
                             ).at[sel].set(logt_c)
            return accum, logt

        def full_branch(feats):
            tf = _take_rows(feats, bins.gauss_idx).transpose(0, 2, 1)
            return _composite(tf, bins.counts, all_tiles, grid, cfg,
                              n_chan + 1)

        accum, logt = jax.lax.cond(
            bins.n_live <= cap, compact_branch, full_branch, feats)
    else:
        # Original-order gather; backward is a T*K-row scatter-add (wins at
        # large N where (N, max_dup) inverse-map gathers degrade).
        tile_feats = _take_rows(feats, bins.gauss_idx).transpose(0, 2, 1)
        accum, logt = _composite(tile_feats, bins.counts, all_tiles, grid,
                                 cfg, n_chan + 1)

    img = _assemble_image(accum, grid)  # (C+1, H, W)
    final_logt = _assemble_image(logt, grid)[0]  # (H, W)
    final_t = jnp.exp(final_logt)
    if bg is None:
        bg = camera.bg
    bg = jnp.asarray(bg)
    if bg.shape[0] < n_chan:
        bg = jnp.concatenate([bg, jnp.zeros((n_chan - bg.shape[0],), bg.dtype)])
    im = img[:n_chan] + final_t[None] * bg[:, None, None]
    depth = img[n_chan]
    return RenderOutput(im=im, radius=proj.radius, depth=depth, final_t=final_t)


def render(rendervar: dict, camera: Camera, cfg: RasterizeConfig = RasterizeConfig()):
    """Dict-style entry matching the reference rasterizer call signature.

    rendervar keys: means3D, colors_precomp, rotations, opacities, scales,
    means2D (optional zeros dummy), live (optional mask) — the contract of
    `params2rendervar` (`src/tracking/helpers.py:36-45`).
    """
    return rasterize(
        rendervar["means3D"],
        rendervar["rotations"],
        rendervar["scales"],
        rendervar["opacities"],
        rendervar["colors_precomp"],
        camera,
        cfg,
        live=rendervar.get("live"),
        mean2d_offset=rendervar.get("means2D"),
    )
