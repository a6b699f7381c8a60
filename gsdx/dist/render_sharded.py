"""Mesh-sharded rasterization and tracking steps.

Rendering scales by *tile ownership* (SURVEY.md §2.8): Gaussians are
replicated (N <= ~200k fits every chip), the per-tile work — the compositor,
the dominant cost — shards over the mesh. Gradients w.r.t. Gaussian features
scatter locally per shard and all-reduce once (XLA psum from the sharding
annotations via shard_map's reverse-mode transpose).

Tracking scales by *camera ownership*: each device fits its camera views'
losses; parameter gradients psum across the mesh — the multi-chip version of
the reference's one-camera-per-iteration loop (`src/tracking/train_gs.py:27`),
equivalent to batching all views per iteration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.7 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from gsdx.kernels.composite import composite_tiles_pallas, composite_tiles_xla
from gsdx.render.binning import TileGrid
from gsdx.track.losses import LossWeights, tracking_loss


def _pad_to(x, size, axis=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def sharded_composite(tile_feats, counts, grid: TileGrid, cfg, mesh: Mesh,
                      axis: str = "data"):
    """Tile-sharded compositing: same contract as the single-chip composite.

    Pads T to a multiple of the mesh axis (padded tiles have count 0 and are
    dropped at reassembly), then shard_maps the compositor with each shard's
    global tile-id slice.
    """
    n = mesh.shape[axis]
    T = tile_feats.shape[0]
    T_pad = -(-T // n) * n
    tile_feats_p = _pad_to(tile_feats, T_pad)
    counts_p = _pad_to(counts, T_pad)
    tile_ids = jnp.arange(T_pad, dtype=jnp.int32)

    kwargs = dict(
        tiles_x=grid.tiles_x, tile_h=grid.tile_h, tile_w=grid.tile_w,
        chunk=cfg.chunk,
    )

    def local(feats, cts, ids):
        if cfg.use_pallas():
            accum, logt, _ = composite_tiles_pallas(
                feats, cts, interpret=cfg.interpret, tile_ids=ids, **kwargs
            )
            return accum, logt
        return composite_tiles_xla(feats, cts, tile_ids=ids, **kwargs)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    accum, logt = fn(tile_feats_p, counts_p, tile_ids)
    return accum[:T], logt[:T]


def make_sharded_tracking_step(cfg, mesh: Mesh, weights: LossWeights,
                               is_initial: bool, axis: str = "data"):
    """Camera-sharded tracking loss+grad: all views per step, grads psummed.

    Returns loss_and_grad(params, m2d, cams, ims, segs, variables) where the
    camera-stacked inputs shard over ``axis`` (num cameras must divide the
    mesh axis or vice versa).
    """

    def loss_fn(params, m2d, cams, ims, segs, variables):
        def shard(params, m2d, cams, ims, segs, variables):
            # local leading dim: cameras owned by this device
            def body(carry, xs):
                cam, im, seg = xs
                loss, _ = tracking_loss(
                    params, m2d, cam, im, seg, variables, weights,
                    is_initial_timestep=is_initial, raster_cfg=cfg,
                )
                return carry + loss, None

            n_local = ims.shape[0]
            total, _ = jax.lax.scan(body, 0.0, (cams, ims, segs))
            total = jax.lax.psum(total, axis)
            n_total = jax.lax.psum(jnp.asarray(n_local, jnp.float32), axis)
            return total / n_total

        return shard_map(
            shard,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis), P()),
            out_specs=P(),
            check_vma=False,
        )(params, m2d, cams, ims, segs, variables)

    return jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
