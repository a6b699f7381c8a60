"""Dynamic-GS tracking driver: per-timestep scan-compiled optimization.

TPU re-design of `src/tracking/train_gs.py:10-46`:

  * the reference's python per-iteration loop (render -> backward -> densify
    -> Adam step) becomes one `lax.scan` per timestep, compiled once;
  * camera selection without replacement is a precomputed permutation array;
  * densification runs inside the scan via `lax.cond` on fixed-capacity
    buffers (see `gsdx/track/densify.py`);
  * timestep warm-starting, KNN table building, and parameter snapshots stay
    at host level (dozens of events per sequence, not hot).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.core.cameras import Camera
from gsdx.core.gaussians import (
    GaussianParams,
    TrackingVariables,
    init_tracking_variables,
)
from gsdx.core.transforms import quat_conjugate, quat_normalize
from gsdx.kernels.knn import knn
from gsdx.render.rasterize import RasterizeConfig
from gsdx.track.densify import (
    DensifyConfig,
    accumulate_densify_stats,
    densify_step,
    reset_opacities,
)
from gsdx.track.losses import LossWeights, tracking_loss
from gsdx.track.optimizer import AdamState, GroupAdam, tracking_lrs


class TrackingConfig(NamedTuple):
    iters_first: int = 10000  # `train_gs.py:25`
    iters_rest: int = 2000
    num_knn: int = 20
    weights: LossWeights = LossWeights()
    densify: DensifyConfig = DensifyConfig()
    raster: RasterizeConfig = RasterizeConfig()
    seed: int = 0
    # t>0 block-frozen bin reuse: tile bins for ALL cameras are rebuilt every
    # `bin_refresh` iterations (at inner-scan block boundaries — measured
    # faster than a lax.cond-gated refresh, which splits fusion) and held
    # frozen in between. `bin_margin_px` inflates the binning radius so the
    # frozen coverage stays a SUPERSET of true coverage for per-step drift up
    # to margin/refresh px (tracking Adam steps move points ~0.1 px). 1
    # disables (bins rebuilt inside rasterize every iteration, t=0 behavior).
    bin_refresh: int = 40
    bin_margin_px: float = 4.0
    # Cap on optimization iterations per XLA dispatch: the axon-tunneled TPU
    # worker is killed on single dispatches running longer than ~2-4 min
    # (reproduced: a 10000-iter 720p t=0 fit dies mid-execution; the same
    # fit split into <=2500-iter segments completes). Long fits run as a
    # python loop of segments (last one may be shorter) carrying
    # (params, opt, variables);
    # per-iteration math is unchanged (absolute iteration indices are
    # threaded through for the densify schedule); only the densify PRNG
    # stream differs from the single-dispatch form when segmentation kicks
    # in. <= max_dispatch_iters fits are bit-identical to before.
    max_dispatch_iters: int = 2500


def _index_pytree(tree, i):
    return jax.tree.map(lambda x: x[i], tree)


def _refresh_divisor(num_iters: int, refresh: int) -> int:
    """Largest divisor of num_iters that is <= refresh (1 = no reuse)."""
    for d in range(min(refresh, num_iters), 0, -1):
        if num_iters % d == 0:
            return d
    return 1


def make_fit_timestep(cfg: TrackingConfig, is_initial: bool, num_iters: int):
    """Build the jitted scan over one timestep's optimization iterations.

    For t>0 (no densification — the Gaussian set is fixed) the scan is
    nested: an outer scan over blocks of `cfg.bin_refresh` iterations
    rebuilds all cameras' tile bins from current params at each block start
    (with `bin_margin_px` coverage slack), and the inner scan runs the
    optimization steps against the frozen bins. Measured TPU v5e (720p,
    `benchmarks/probe_binreuse.py`): frozen bins take the fwd+bwd iteration
    from 199 -> 250 Mpix/s at 5k and 125 -> 169 at 65k, while a cond-gated
    in-scan refresh LOSES ~0.3 ms/iter to fusion splitting — hence block
    boundaries, not conds.
    """
    if is_initial and cfg.densify.interval < 1:
        raise ValueError(
            f"DensifyConfig.interval must be >= 1, got {cfg.densify.interval}"
            " (the densify cadence is i % interval == 0)"
        )
    adam = GroupAdam()

    def loss_fn(params, m2d, cam, im, seg, variables, bins):
        return tracking_loss(
            params, m2d, cam, im, seg, variables, cfg.weights,
            is_initial_timestep=is_initial, raster_cfg=cfg.raster,
            bins=bins,
        )

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)

    # Split long fits into <= max_dispatch_iters segments (see
    # TrackingConfig.max_dispatch_iters: the tunneled worker kills
    # multi-minute single dispatches). The last segment may be shorter
    # (ragged tail — one extra compile, never degenerate one-iteration
    # dispatches for awkward num_iters). nseg == 1 is bit-identical to the
    # unsegmented form.
    nseg = 1
    if cfg.max_dispatch_iters and num_iters > cfg.max_dispatch_iters:
        nseg = -(-num_iters // cfg.max_dispatch_iters)
    seg_iters = -(-num_iters // nseg)
    tail_iters = num_iters - seg_iters * (nseg - 1)

    def _make_fit_seg(seg_len: int):
      refresh = 1 if is_initial else _refresh_divisor(seg_len, cfg.bin_refresh)

      @jax.jit
      def fit_seg(params, opt_state, variables, lrs, cams, ims, segs,
                  cam_order, key, iter_offset):
        num_cams = ims.shape[0]

        def step(bins_all, carry, inputs):
            params, opt_state, variables = carry
            cam_idx, i, key = inputs
            cam = _index_pytree(cams, cam_idx)
            im = ims[cam_idx]
            seg = segs[cam_idx]
            bins = (None if bins_all is None
                    else _index_pytree(bins_all, cam_idx))
            m2d = jnp.zeros_like(params.means3d[:, :2])
            (loss, aux), (g_params, g_m2d) = grad_fn(
                params, m2d, cam, im, seg, variables, bins
            )

            if is_initial:
                dcfg = cfg.densify
                variables = jax.lax.cond(
                    i <= dcfg.end,
                    lambda v: accumulate_densify_stats(
                        v, g_m2d, aux.seen, aux.radius, cams.width, cams.height
                    ),
                    lambda v: v,
                    variables,
                )
                do_densify = ((i >= dcfg.start) & (i % dcfg.interval == 0)
                              & (i <= dcfg.end))
                params, variables, opt_state = jax.lax.cond(
                    do_densify,
                    lambda p, v, o: densify_step(p, v, o, key, i, cfg.densify),
                    lambda p, v, o: (p, v, o),
                    params, variables, opt_state,
                )
                do_reset = ((dcfg.reset_interval > 0) & (i > 0)
                            & (i % max(dcfg.reset_interval, 1) == 0)
                            & (i <= dcfg.end))
                params, opt_state = jax.lax.cond(
                    do_reset,
                    lambda p, o: reset_opacities(p, o),
                    lambda p, o: (p, o),
                    params, opt_state,
                )

            params, opt_state = adam.update(g_params, opt_state, params, lrs)
            out = {"loss": loss, "psnr": aux.psnr, "num_pts": params.num_live}
            return (params, opt_state, variables), out

        keys = jax.random.split(key, seg_len)
        iters = iter_offset + jnp.arange(seg_len, dtype=jnp.int32)

        if refresh == 1:
            (params, opt_state, variables), logs = jax.lax.scan(
                lambda c, x: step(None, c, x),
                (params, opt_state, variables), (cam_order, iters, keys)
            )
            return params, opt_state, variables, logs

        from gsdx.render.rasterize import compute_bins

        def block(carry, inputs):
            params, opt_state, variables = carry
            bins_all = jax.tree.map(
                lambda *x: jnp.stack(x),
                *[
                    compute_bins(
                        params.means3d,
                        params.unnorm_rotations,
                        jnp.exp(params.log_scales),
                        _index_pytree(cams, c),
                        cfg.raster,
                        live=params.live,
                        margin_px=cfg.bin_margin_px,
                    )
                    for c in range(num_cams)
                ],
            )
            return jax.lax.scan(
                lambda c, x: step(bins_all, c, x), carry, inputs
            )

        nb = seg_len // refresh
        blocked = jax.tree.map(
            lambda x: x.reshape((nb, refresh) + x.shape[1:]),
            (cam_order, iters, keys),
        )
        (params, opt_state, variables), logs = jax.lax.scan(
            block, (params, opt_state, variables), blocked
        )
        logs = jax.tree.map(
            lambda x: x.reshape((seg_len,) + x.shape[2:]), logs
        )
        return params, opt_state, variables, logs

      return fit_seg

    if nseg == 1:
        fit_seg = _make_fit_seg(num_iters)

        def fit(params, opt_state, variables, lrs, cams, ims, segs,
                cam_order, key):
            return fit_seg(params, opt_state, variables, lrs, cams, ims,
                           segs, cam_order, key, jnp.int32(0))
        return fit

    fit_main = _make_fit_seg(seg_iters)
    fit_tail = (fit_main if tail_iters == seg_iters
                else _make_fit_seg(tail_iters))

    def fit(params, opt_state, variables, lrs, cams, ims, segs, cam_order,
            key):
        seg_keys = jax.random.split(key, nseg)
        logs_all = []
        off = 0
        for s in range(nseg):
            n = seg_iters if s < nseg - 1 else tail_iters
            fn = fit_main if s < nseg - 1 else fit_tail
            params, opt_state, variables, logs = fn(
                params, opt_state, variables, lrs, cams, ims, segs,
                cam_order[off : off + n], seg_keys[s], jnp.int32(off),
            )
            off += n
            logs_all.append(jax.tree.map(jnp.asarray, logs))
        logs = jax.tree.map(lambda *x: jnp.concatenate(x), *logs_all)
        return params, opt_state, variables, logs

    return fit


def camera_order(num_iters: int, num_cams: int, rng: np.random.Generator):
    """Random-without-replacement camera schedule (`get_batch`,
    `src/tracking/train_utils.py:82-86`)."""
    reps = -(-num_iters // num_cams)
    order = np.concatenate([rng.permutation(num_cams) for _ in range(reps)])
    return jnp.asarray(order[:num_iters].astype(np.int32))


def initialize_per_timestep(params: GaussianParams, variables: TrackingVariables,
                            opt_state: AdamState):
    """Momentum warm start + rigidity reference state (`train_utils.py:331-351`).

    Also zeroes Adam moments for means3d/rotations, matching
    `update_params_and_optimizer` (`external.py:145-158`).
    """
    pts = params.means3d
    rot = quat_normalize(params.unnorm_rotations)
    new_pts = pts + (pts - variables.prev_pts)
    new_rot = quat_normalize(rot + (rot - variables.prev_rot))

    prev_inv_rot = quat_conjugate(rot)
    nbr_pts = pts[variables.neighbor_indices]  # (N, K, 3)
    prev_offset = nbr_pts - pts[:, None]

    variables = variables.replace(
        prev_inv_rot=prev_inv_rot,
        prev_offset=prev_offset,
        prev_pts=pts,
        prev_rot=rot,
    )
    params = params.replace(means3d=new_pts, unnorm_rotations=new_rot)
    zeros3 = jnp.zeros_like(pts)
    zeros4 = jnp.zeros_like(rot)
    opt_state = opt_state.replace(
        mu=opt_state.mu.replace(means3d=zeros3, unnorm_rotations=zeros4),
        nu=opt_state.nu.replace(means3d=zeros3, unnorm_rotations=zeros4),
    )
    return params, variables, opt_state


def initialize_post_first_timestep(
    params: GaussianParams, variables: TrackingVariables, num_knn: int = 20
):
    """KNN tables + background anchors after t=0 (`train_utils.py:354-374`)."""
    is_fg = (params.seg_colors[:, 0] > 0.5) & (params.live > 0)
    sq_dist, idx = knn(params.means3d, num_knn, valid=is_fg)
    rot = quat_normalize(params.unnorm_rotations)
    variables = variables.replace(
        neighbor_indices=idx,
        neighbor_weight=jnp.exp(-2000.0 * sq_dist),
        neighbor_dist=jnp.sqrt(sq_dist),
        neighbor_valid=jnp.broadcast_to(
            is_fg[:, None], idx.shape
        ).astype(jnp.float32),
        init_bg_pts=params.means3d,
        init_bg_rot=rot,
        prev_pts=params.means3d,
        prev_rot=rot,
    )
    return variables


def compact_params(params: GaussianParams, variables: TrackingVariables,
                   pad_to: int = 128):
    """Repack live Gaussians to the front and shrink capacity.

    Called once after the initial timestep: densification only runs at t=0
    (`train_gs.py:33-35`), so the live count is static afterwards. Shrinking
    removes dead-slot work from the remaining (T-1) * 2000 iterations.
    """
    live = np.asarray(params.live) > 0
    keep = np.nonzero(live)[0]
    n = len(keep)
    cap = int(-(-n // pad_to) * pad_to)

    def pack(arr, fill=0.0):
        arr = np.asarray(arr)
        if arr.ndim >= 1 and arr.shape[0] == live.shape[0]:
            out = np.full((cap,) + arr.shape[1:], fill, dtype=arr.dtype)
            out[:n] = arr[keep]
            return jnp.asarray(out)
        return jnp.asarray(arr)

    new_params = jax.tree.map(pack, params)
    new_live = np.zeros((cap,), np.float32)
    new_live[:n] = 1.0
    new_params = new_params.replace(
        live=jnp.asarray(new_live),
        log_scales=pack(params.log_scales, fill=-20.0),
    )
    new_vars = init_tracking_variables(
        cap, variables.neighbor_indices.shape[1], variables.scene_radius
    )
    return new_params, new_vars


def save_tracking_state(path: str, t: int, params, opt_state, variables,
                        key, output_params):
    """Mid-sequence checkpoint for resumable tracking (the reference only
    snapshots params every 5 timesteps with no optimizer state,
    SURVEY.md §5 'no mid-episode resume')."""
    import pickle

    from gsdx.io.checkpoint import save_checkpoint

    save_checkpoint(path, {
        "t": jnp.asarray(t), "params": params, "opt_state": opt_state,
        "variables": variables, "key": key,
    })
    with open(path + ".outputs", "wb") as f:
        pickle.dump(output_params, f)


def load_tracking_state(path: str, template: dict):
    import pickle

    from gsdx.io.checkpoint import load_checkpoint

    state = load_checkpoint(path, template)
    with open(path + ".outputs", "rb") as f:
        outputs = pickle.load(f)
    return state, outputs


def track_sequence(
    params: GaussianParams,
    cams: Camera,
    ims: jnp.ndarray,  # (T, C, 3, H, W) or callable t -> (C,3,H,W)
    segs: jnp.ndarray,
    num_timesteps: int,
    cfg: TrackingConfig = TrackingConfig(),
    scene_radius: float = 1.0,
    progress: bool = False,
    state_path: Optional[str] = None,
    resume: bool = False,
    on_timestep=None,
):
    """Full tracking loop over a sequence (`train_gs.py:10-46`).

    ims/segs may be arrays indexed by timestep or callables returning the
    per-timestep stack (for sequences too large for host memory).
    ``state_path``/``resume`` enable mid-sequence checkpointing.
    ``on_timestep(t, wall_seconds)`` is called after each timestep's fit
    completes (timing telemetry for drives/benchmarks). Returns a list of
    per-timestep host param snapshots (params2cpu equivalent,
    `helpers.py:141-147`).
    """
    import os

    rng = np.random.default_rng(cfg.seed)
    adam = GroupAdam()
    variables = init_tracking_variables(params.capacity, cfg.num_knn, scene_radius)
    opt_state = adam.init(params)
    lrs = tracking_lrs(scene_radius, post_first_timestep=False)
    key = jax.random.PRNGKey(cfg.seed)

    num_cams = np.asarray(ims(0) if callable(ims) else ims[0]).shape[0]
    output_params = []

    start_t = 0
    if resume and state_path and os.path.exists(state_path):
        # Resume requires post-t0 shapes (compacted capacity); only supported
        # from t >= 1, which is when the expensive tail begins. The saved
        # capacity is derived from the outputs snapshot (t=0 is always a full
        # snapshot of the compacted params), so the restore template is picked
        # deterministically — any exception out of the actual load means a
        # corrupt checkpoint and propagates instead of resuming silently from
        # rebuilt state.
        import pickle

        with open(state_path + ".outputs", "rb") as f:
            output_params = pickle.load(f)
        n0 = output_params[0]["means3D"].shape[0]
        cap = int(-(-n0 // 128) * 128)
        if cap == params.capacity:
            template = {
                "t": jnp.asarray(0), "params": params, "opt_state": opt_state,
                "variables": variables, "key": key,
            }
        else:
            tmpl_params, tmpl_vars = _template_after_compact(
                cap, cfg.num_knn, scene_radius
            )
            template = {
                "t": jnp.asarray(0), "params": tmpl_params,
                "opt_state": adam.init(tmpl_params),
                "variables": tmpl_vars, "key": key,
            }
        from gsdx.io.checkpoint import load_checkpoint

        state = load_checkpoint(state_path, template)
        params = state["params"]
        opt_state = state["opt_state"]
        variables = state["variables"]
        key = state["key"]
        start_t = int(state["t"]) + 1
        lrs = tracking_lrs(scene_radius, post_first_timestep=True)
        if progress:
            print(f"[track] resumed at t={start_t}")

    fit_first = make_fit_timestep(cfg, is_initial=True, num_iters=cfg.iters_first)
    fit_rest = None

    for t in range(start_t, num_timesteps):
        t_ims = ims(t) if callable(ims) else ims[t]
        t_segs = segs(t) if callable(segs) else segs[t]
        is_initial = t == 0
        if not is_initial:
            params, variables, opt_state = initialize_per_timestep(
                params, variables, opt_state
            )
        num_iters = cfg.iters_first if is_initial else cfg.iters_rest
        order = camera_order(num_iters, num_cams, rng)
        key, sub = jax.random.split(key)
        if is_initial:
            fit = fit_first
        else:
            if fit_rest is None:
                fit_rest = make_fit_timestep(
                    cfg, is_initial=False, num_iters=cfg.iters_rest
                )
            fit = fit_rest
        import time as _time

        _t0 = _time.perf_counter()
        params, opt_state, variables, logs = fit(
            params, opt_state, variables, lrs, cams, t_ims, t_segs, order, sub
        )
        jax.block_until_ready(params.means3d)
        if on_timestep is not None:
            on_timestep(t, _time.perf_counter() - _t0)
        if progress:
            print(
                f"[track] t={t} loss={float(logs['loss'][-1]):.5f} "
                f"psnr={float(logs['psnr'][-1]):.3f} pts={int(logs['num_pts'][-1])}"
            )
        if state_path:
            # densification telemetry (`train_gs.py:36-37` num_pts.txt)
            with open(os.path.join(os.path.dirname(state_path) or ".",
                                   "num_pts.txt"), "w") as f:
                f.write(f"Number of points: {int(logs['num_pts'][-1])}\n")
        output_params.append(snapshot_params(params, full=is_initial))
        if is_initial:
            params, variables = compact_params(params, variables)
            variables = initialize_post_first_timestep(params, variables, cfg.num_knn)
            opt_state = adam.init(params)
            lrs = tracking_lrs(scene_radius, post_first_timestep=True)
            # re-snapshot after compaction so all timesteps share indexing
            output_params[-1] = snapshot_params(params, full=True)
        if state_path and not is_initial:
            save_tracking_state(state_path, t, params, opt_state, variables,
                                key, output_params)
    return output_params


def _template_after_compact(capacity: int, num_knn: int, scene_radius):
    """Zero pytrees with post-compaction shapes (resume deserialization)."""
    z = jnp.zeros
    params = GaussianParams(
        means3d=z((capacity, 3)), rgb_colors=z((capacity, 3)),
        seg_colors=z((capacity, 3)), unnorm_rotations=z((capacity, 4)),
        logit_opacities=z((capacity, 1)), log_scales=z((capacity, 3)),
        cam_m=z((50, 3)), cam_c=z((50, 3)), live=z((capacity,)),
    )
    variables = init_tracking_variables(capacity, num_knn, scene_radius)
    return params, variables


def snapshot_params(params: GaussianParams, full: bool) -> dict:
    """Host copy; t=0 keeps everything, later steps only moving fields
    (`params2cpu`, `src/tracking/helpers.py:141-147`)."""
    live = np.asarray(params.live) > 0
    out = {
        "means3D": np.asarray(params.means3d)[live],
        "rgb_colors": np.asarray(params.rgb_colors)[live],
        "unnorm_rotations": np.asarray(params.unnorm_rotations)[live],
    }
    if full:
        out.update(
            seg_colors=np.asarray(params.seg_colors)[live],
            logit_opacities=np.asarray(params.logit_opacities)[live],
            log_scales=np.asarray(params.log_scales)[live],
            cam_m=np.asarray(params.cam_m),
            cam_c=np.asarray(params.cam_c),
        )
    return out
