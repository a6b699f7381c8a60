"""Fixed-capacity densification: clone / split / prune / opacity reset.

Functional TPU re-design of the reference's shape-changing optimizer surgery
(`src/tracking/external.py:171-299`). The parameter arrays never change shape;
instead dead slots (live == 0) are recycled:

  * clone  — small, high-gradient Gaussians are copied into dead slots with
             zeroed Adam moments (reference cat_params_to_optimizer).
  * split  — large, high-gradient Gaussians are replaced by n=2 children
             sampled from the parent's covariance with scales / (0.8 n);
             child 1 overwrites the parent slot, child 2 takes a dead slot;
             both get zeroed moments (the reference prunes the parent and
             appends two fresh rows, `external.py:262-276`).
  * prune  — low-opacity (and, after iter 3000, oversized) Gaussians have
             live set to 0 (`external.py:279-289`).
  * reset  — every 3000 iters opacities snap to logit(0.01) and their Adam
             moments clear (`external.py:292-296`).

Slot allocation under jit uses argsort-packing: dead slots and source rows are
rank-matched, and overflowing allocations are dropped via out-of-bounds
scatter indices (mode="drop").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsdx.core.gaussians import GaussianParams, TrackingVariables
from gsdx.core.transforms import quat_to_rotmat
from gsdx.track.optimizer import AdamState


class DensifyConfig(NamedTuple):
    grad_thresh: float = 0.0002  # `external.py:237`
    remove_thresh: float = 0.005  # CLI default (`train_gs.py:53`)
    remove_thresh_5k: float = 0.25  # `train_gs.py:54`
    scale_scene_radius: float = 0.05  # clone/split size boundary (`train_gs.py:64`)
    big_point_ws: float = 0.1  # prune scale fraction after iter 3000
    split_n: int = 2
    # Schedule (reference `external.py:243-293`): clone/split/prune every
    # `interval` iters in [start, end]; opacity reset every `reset_interval`
    # iters while i <= end (0 disables the reset); big-point pruning starts
    # at `big_point_start` (a separate constant from the reset cadence in the
    # reference, `external.py:283`).
    start: int = 500
    interval: int = 100
    end: int = 5000
    reset_interval: int = 3000
    big_point_start: int = 3000


_GAUSS_FIELDS = (
    "means3d",
    "rgb_colors",
    "seg_colors",
    "unnorm_rotations",
    "logit_opacities",
    "log_scales",
    "live",
)


def _copy_rows(params: GaussianParams, src_idx, dst_idx, valid, overrides=None):
    """Scatter params[src] -> params[dst] where valid; else drop.

    overrides: dict field -> (M, ...) array replacing the gathered source rows.
    """
    n = params.capacity
    dst = jnp.where(valid, dst_idx, n)  # OOB -> dropped by scatter mode
    out = {}
    for f in _GAUSS_FIELDS:
        arr = getattr(params, f)
        rows = overrides[f] if overrides and f in overrides else arr[src_idx]
        out[f] = arr.at[dst].set(rows, mode="drop")
    return params.replace(**out)


def _zero_rows(tree, dst_idx, valid, capacity):
    """Zero moment rows at dst slots across all per-Gaussian leaves."""
    dst = jnp.where(valid, dst_idx, capacity)

    def z(arr):
        if arr.ndim >= 1 and arr.shape[0] == capacity:
            return arr.at[dst].set(jnp.zeros_like(arr[dst_idx]), mode="drop")
        return arr
    return jax.tree.map(z, tree)


def _packed_indices(mask):
    """Indices of True entries packed to the front (stable), plus count."""
    n = mask.shape[0]
    order = jnp.argsort(~mask, stable=True).astype(jnp.int32)
    return order, jnp.sum(mask).astype(jnp.int32)


def densify_step(
    params: GaussianParams,
    variables: TrackingVariables,
    opt_state: AdamState,
    key: jax.Array,
    i: jnp.ndarray,
    cfg: DensifyConfig,
):
    """One clone/split/prune pass (runs when 500 <= i <= 5000, i % 100 == 0).

    Mirrors `densify` (`src/tracking/external.py:229-299`) minus the
    accumulation (done per-iter by the trainer). Returns updated
    (params, variables, opt_state).
    """
    n = params.capacity
    grads = variables.means2d_grad_accum / jnp.maximum(variables.denom, 1e-12)
    grads = jnp.nan_to_num(grads, nan=0.0)

    live = params.live > 0
    max_scale = jnp.max(jnp.exp(params.log_scales), axis=1)
    size_cut = cfg.scale_scene_radius * variables.scene_radius
    high_grad = (grads >= cfg.grad_thresh) & live

    # ---- clone (small) --------------------------------------------------
    to_clone = high_grad & (max_scale <= size_cut)
    src_order, n_clone = _packed_indices(to_clone)
    dead_order, n_dead = _packed_indices(~live)
    k_idx = jnp.arange(n, dtype=jnp.int32)
    valid = (k_idx < n_clone) & (k_idx < n_dead)
    params = _copy_rows(params, src_order, dead_order, valid)
    opt_state = opt_state.replace(
        mu=_zero_rows(opt_state.mu, dead_order, valid, n),
        nu=_zero_rows(opt_state.nu, dead_order, valid, n),
    )

    # ---- split (large) --------------------------------------------------
    live = params.live > 0
    to_split = high_grad & (max_scale > size_cut)  # clones are never splits
    src_order, n_split = _packed_indices(to_split)
    dead_order, n_dead = _packed_indices(~live)
    valid_child2 = (k_idx < n_split) & (k_idx < n_dead)
    valid_child1 = k_idx < n_split

    stds = jnp.exp(params.log_scales)[src_order]  # (n, 3)
    rots = quat_to_rotmat(params.unnorm_rotations[src_order])  # (n, 3, 3)
    key1, key2 = jax.random.split(key)
    samp1 = jax.random.normal(key1, (n, 3)) * stds
    samp2 = jax.random.normal(key2, (n, 3)) * stds
    base_means = params.means3d[src_order]
    new_scales = jnp.log(jnp.exp(params.log_scales[src_order]) / (0.8 * cfg.split_n))

    ovr1 = {
        "means3d": base_means + jnp.einsum("nij,nj->ni", rots, samp1),
        "log_scales": new_scales,
    }
    ovr2 = {
        "means3d": base_means + jnp.einsum("nij,nj->ni", rots, samp2),
        "log_scales": new_scales,
    }
    # child 1 overwrites the parent slot (dst == src)
    params = _copy_rows(params, src_order, src_order, valid_child1, overrides=ovr1)
    # child 2 goes to a dead slot
    params = _copy_rows(params, src_order, dead_order, valid_child2, overrides=ovr2)
    opt_state = opt_state.replace(
        mu=_zero_rows(
            _zero_rows(opt_state.mu, src_order, valid_child1, n),
            dead_order, valid_child2, n),
        nu=_zero_rows(
            _zero_rows(opt_state.nu, src_order, valid_child1, n),
            dead_order, valid_child2, n),
    )

    # ---- prune ----------------------------------------------------------
    opac = jax.nn.sigmoid(params.logit_opacities[:, 0])
    # The aggressive final threshold applies on the LAST densify step of the
    # schedule (the reference's i == 5000 with its 100-iter cadence); gating
    # on the last multiple of `interval` <= end keeps it effective for
    # schedules where end % interval != 0.
    final_i = (cfg.end // max(cfg.interval, 1)) * cfg.interval
    thresh = jnp.where(i == final_i, cfg.remove_thresh_5k, cfg.remove_thresh)
    to_remove = opac < thresh
    big_ws = jnp.max(jnp.exp(params.log_scales), axis=1) > (
        cfg.big_point_ws * variables.scene_radius
    )
    to_remove = jnp.where(i >= cfg.big_point_start, to_remove | big_ws,
                          to_remove)
    new_live = params.live * (1.0 - to_remove.astype(jnp.float32))
    params = params.replace(live=new_live)

    # ---- reset stats (reference zeroes after every densify) -------------
    variables = variables.replace(
        means2d_grad_accum=jnp.zeros((n,)),
        denom=jnp.zeros((n,)),
        max_2d_radius=jnp.zeros((n,)),
    )
    return params, variables, opt_state


def reset_opacities(params: GaussianParams, opt_state: AdamState):
    """Opacity reset every 3000 iters (`external.py:292-296`)."""
    new_lo = jnp.full_like(params.logit_opacities, _inverse_sigmoid(0.01))
    params = params.replace(logit_opacities=new_lo)
    opt_state = opt_state.replace(
        mu=opt_state.mu.replace(logit_opacities=jnp.zeros_like(new_lo)),
        nu=opt_state.nu.replace(logit_opacities=jnp.zeros_like(new_lo)),
    )
    return params, opt_state


def _inverse_sigmoid(x: float) -> float:
    import math

    return math.log(x / (1.0 - x))


def accumulate_densify_stats(
    variables: TrackingVariables,
    mean2d_grad: jnp.ndarray,
    seen: jnp.ndarray,
    radius: jnp.ndarray,
    width: int,
    height: int,
) -> TrackingVariables:
    """Accumulate screen-space gradient stats (`external.py:138-143`).

    The CUDA backward reports mean2D gradients in NDC-half units
    (dL/dpix * [W/2, H/2]); we rasterize in pixel units, so scale here to
    keep the 2e-4 threshold compatible.
    """
    g = mean2d_grad * jnp.array([[0.5 * width, 0.5 * height]], jnp.float32)
    gnorm = jnp.linalg.norm(g, axis=-1)
    seen_f = seen.astype(jnp.float32)
    return variables.replace(
        means2d_grad_accum=variables.means2d_grad_accum + gnorm * seen_f,
        denom=variables.denom + seen_f,
        max_2d_radius=jnp.maximum(variables.max_2d_radius, radius * seen_f),
    )
