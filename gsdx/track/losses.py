"""Dynamic-GS tracking losses (reference `src/tracking/train_utils.py:167-246`).

All losses operate on fixed-capacity arrays with liveness/foreground masks
instead of boolean indexing (which would change shapes under jit). Masked
means divide by the mask population, reproducing the reference's means over
dynamically-sized subsets.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gsdx.core.cameras import Camera
from gsdx.core.gaussians import GaussianParams, TrackingVariables
from gsdx.core.transforms import quat_multiply, quat_normalize, quat_to_rotmat
from gsdx.render.rasterize import RasterizeConfig, rasterize
from gsdx.render.renderer import params_to_rendervar


class LossWeights(NamedTuple):
    """Defaults from the tracking CLI (`src/tracking/train_gs.py:55-62`)."""

    im: float = 50.0
    seg: float = 200.0
    rigid: float = 200.0
    bg: float = 200.0
    iso: float = 1000.0
    rot: float = 4.0
    floor: float = 2.0
    soft_col_cons: float = 0.01  # computed as 0 in the reference (train_utils.py:232)


def l1_loss(x, y):
    return jnp.abs(x - y).mean()


def _masked_mean(x, mask, eps=1e-8):
    return jnp.sum(x * mask) / jnp.maximum(jnp.sum(mask), eps)


def weighted_l2_v1(x, y, w, mask):
    """sqrt((x-y)^2 * w + 1e-20), masked mean (`helpers.py:66-67`)."""
    v = jnp.sqrt((x - y) ** 2 * w + 1e-20)
    return _masked_mean(v, mask)


def weighted_l2_v2(x, y, w, mask):
    """sqrt(sum_last((x-y)^2) * w + 1e-20), masked mean (`helpers.py:70-71`)."""
    v = jnp.sqrt(jnp.sum((x - y) ** 2, axis=-1) * w + 1e-20)
    return _masked_mean(v, mask)


def _gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


_WINDOW = _gaussian_window()
_WINDOW_1D = np.exp(
    -((np.arange(11) - 5) ** 2) / (2 * 1.5**2)
).astype(np.float32)
_WINDOW_1D /= _WINDOW_1D.sum()

_BAND_CACHE: dict = {}


def _band_matrix(n: int) -> np.ndarray:
    """(n, n) banded matrix applying the zero-padded 1D Gaussian window —
    row i holds the window centered at i, truncated at the edges (identical
    to SAME zero-padded convolution)."""
    if n not in _BAND_CACHE:
        m = np.zeros((n, n), np.float32)
        for off, w in zip(range(-5, 6), _WINDOW_1D):
            i = np.arange(max(0, -off), min(n, n - off))
            m[i, i + off] = w
        _BAND_CACHE[n] = m
    return _BAND_CACHE[n]


_TOEPLITZ_CACHE: dict = {}


def _toeplitz_block(blk: int) -> np.ndarray:
    """(blk, blk+10) Toeplitz window block: out_local[i] = sum_o w[o] *
    padded[i + o] for an 11-tap window and a 5-padded source slice."""
    if blk not in _TOEPLITZ_CACHE:
        m = np.zeros((blk, blk + 10), np.float32)
        i = np.arange(blk)
        for o, w in enumerate(_WINDOW_1D):
            m[i, i + o] = w
        _TOEPLITZ_CACHE[blk] = m
    return _TOEPLITZ_CACHE[blk]


def _blur_h(img: jnp.ndarray, blk: int = 128) -> jnp.ndarray:
    """1D Gaussian blur along axis 1 of (C, H, W), zero-padded SAME.

    Block-Toeplitz form: overlapping (blk+10)-row slices against ONE
    (blk, blk+10) window matrix — ~6x fewer MXU FLOPs than the dense
    (H, H) banded matmul (band 11 << H; zeros still cost MXU work), and
    exactly equal (padded/zero terms contribute exact f32 zeros).
    """
    C, H, W = img.shape
    bk = H if H <= 2 * blk else blk
    Hp = -(-H // bk) * bk
    x = jnp.pad(img, ((0, 0), (5, 5 + Hp - H), (0, 0)))
    blocks = jnp.stack(
        [x[:, b * bk:b * bk + bk + 10] for b in range(Hp // bk)], axis=1
    )  # (C, nb, bk+10, W)
    t = jnp.asarray(_toeplitz_block(bk))
    out = jnp.einsum("ik,cbkw->cbiw", t, blocks, precision="float32")
    return out.reshape(C, Hp, W)[:, :H]


def _blur_w(img: jnp.ndarray, blk: int = 128) -> jnp.ndarray:
    """Same as `_blur_h` along the last axis."""
    C, H, W = img.shape
    bk = W if W <= 2 * blk else blk
    Wp = -(-W // bk) * bk
    x = jnp.pad(img, ((0, 0), (0, 0), (5, 5 + Wp - W)))
    blocks = jnp.stack(
        [x[..., b * bk:b * bk + bk + 10] for b in range(Wp // bk)], axis=2
    )  # (C, H, nb, bk+10)
    t = jnp.asarray(_toeplitz_block(bk))
    out = jnp.einsum("chbk,ik->chbi", blocks, t, precision="float32")
    return out.reshape(C, H, Wp)[..., :W]


def _filter2d(img: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 11x11 Gaussian filter over (C, H, W), SAME padding.

    The window is separable, and on TPU each 1D pass is a block-Toeplitz
    matmul on the MXU (`_blur_h`/`_blur_w`): depthwise/grouped convolutions
    lower to shifted adds on the VPU and dominated the tracking step (26 ms
    fwd+bwd at 720p); dense (H, H)/(W, W) banded matmuls (`_band_matrix`,
    kept as the reference form) spend >85% of their MXU FLOPs on structural
    zeros.
    """
    return _blur_w(_blur_h(img))


def calc_ssim(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """11x11 Gaussian-window SSIM, sigma 1.5 (`src/tracking/external.py:101-135`)."""
    mu1 = _filter2d(img1)
    mu2 = _filter2d(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _filter2d(img1 * img1) - mu1_sq
    sigma2_sq = _filter2d(img2 * img2) - mu2_sq
    sigma12 = _filter2d(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


def calc_psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean((img1 - img2) ** 2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


@flax.struct.dataclass
class LossAux:
    """Side outputs threaded back to the optimizer step."""

    radius: jnp.ndarray  # (N,)
    seen: jnp.ndarray  # (N,) bool
    psnr: jnp.ndarray  # scalar (color render vs target)
    losses: dict  # name -> scalar


def tracking_loss(
    params: GaussianParams,
    mean2d_dummy: jnp.ndarray,
    camera: Camera,
    target_im: jnp.ndarray,
    target_seg: jnp.ndarray,
    variables: TrackingVariables,
    weights: LossWeights,
    is_initial_timestep: bool,
    raster_cfg: RasterizeConfig,
    with_seg: bool = True,
    fused: bool = True,
    bins=None,
):
    """Total tracking loss for one camera view (`train_utils.py:167-246`).

    mean2d_dummy: (N, 2) zeros; grad w.r.t. it feeds densification stats.
    bins: optional precomputed TileBins for this camera (block-frozen bin
    reuse, see `gsdx.render.rasterize.compute_bins`).

    fused=True renders rgb and seg targets as 6 channels in ONE rasterizer
    pass (identical projection/binning are shared), halving the dominant
    render cost. Deviation from the reference: the means2D densification
    gradient then also includes the seg loss contribution (the reference
    accumulates it from the color render only, `train_utils.py:185`);
    set fused=False for strict stat parity. Returns (loss, LossAux).
    """
    losses = {}

    rendervar = params_to_rendervar(params)
    cid = camera.cam_id

    if fused and with_seg:
        colors6 = jnp.concatenate(
            [rendervar["colors_precomp"], params.seg_colors], axis=1
        )
        out = rasterize(
            rendervar["means3D"],
            rendervar["rotations"],
            rendervar["scales"],
            rendervar["opacities"],
            colors6,
            camera,
            raster_cfg,
            live=params.live,
            mean2d_offset=mean2d_dummy,
            bins=bins,
        )
        im = jnp.exp(params.cam_m[cid])[:, None, None] * out.im[:3] + (
            params.cam_c[cid][:, None, None]
        )
        seg_im = out.im[3:6]
        losses["im"] = 0.8 * l1_loss(im, target_im) + 0.2 * (
            1.0 - calc_ssim(im, target_im)
        )
        losses["seg"] = 0.8 * l1_loss(seg_im, target_seg) + 0.2 * (
            1.0 - calc_ssim(seg_im, target_seg)
        )
    else:
        out = rasterize(
            rendervar["means3D"],
            rendervar["rotations"],
            rendervar["scales"],
            rendervar["opacities"],
            rendervar["colors_precomp"],
            camera,
            raster_cfg,
            live=params.live,
            mean2d_offset=mean2d_dummy,
            bins=bins,
        )
        # Per-camera affine color correction (`train_utils.py:182`).
        im = jnp.exp(params.cam_m[cid])[:, None, None] * out.im + params.cam_c[
            cid
        ][:, None, None]
        losses["im"] = 0.8 * l1_loss(im, target_im) + 0.2 * (
            1.0 - calc_ssim(im, target_im)
        )
        if with_seg:
            seg_out = rasterize(
                rendervar["means3D"],
                rendervar["rotations"],
                rendervar["scales"],
                rendervar["opacities"],
                params.seg_colors,
                camera,
                raster_cfg,
                live=params.live,
                bins=bins,
            )
            losses["seg"] = 0.8 * l1_loss(seg_out.im, target_seg) + 0.2 * (
                1.0 - calc_ssim(seg_out.im, target_seg)
            )

    if not is_initial_timestep:
        losses.update(_rigidity_losses(params, variables))

    weight_map = {
        "im": weights.im,
        "seg": weights.seg,
        "rigid": weights.rigid,
        "iso": weights.iso,
        "rot": weights.rot,
        "floor": weights.floor,
        "bg": weights.bg,
    }
    loss = sum(weight_map[k] * v for k, v in losses.items())

    aux = LossAux(
        radius=out.radius,
        seen=out.radius > 0,
        psnr=calc_psnr(im, target_im),
        losses=losses,
    )
    return loss, aux


def _rigidity_losses(params: GaussianParams, v: TrackingVariables) -> dict:
    """rigid / rot / iso / floor / bg losses over fixed-shape KNN tables.

    Mirrors `train_utils.py:198-232` with masks instead of fancy indexing:
    foreground = seg channel 0 > 0.5 (and live); neighbor tables are built
    once per timestep over foreground points (`initialize_post_first_timestep`,
    `train_utils.py:354-374`).
    """
    is_fg = (params.seg_colors[:, 0] > 0.5) & (params.live > 0)
    is_bg = (params.seg_colors[:, 0] <= 0.5) & (params.live > 0)
    fg_f = is_fg.astype(jnp.float32)

    pts = params.means3d  # (N, 3)
    rot = quat_normalize(params.unnorm_rotations)  # (N, 4)

    rel_rot = quat_multiply(rot, v.prev_inv_rot)  # (N, 4)
    R = quat_to_rotmat(rel_rot)  # (N, 3, 3)

    nbr_idx = v.neighbor_indices  # (N, K)
    nbr_pts = pts[nbr_idx]  # (N, K, 3)
    curr_offset = nbr_pts - pts[:, None]  # (N, K, 3)
    # Offsets rotated into the previous frame: R^T @ offset.
    curr_offset_prev = jnp.einsum("nij,nki->nkj", R, curr_offset)

    nbr_mask = v.neighbor_valid * fg_f[:, None]  # (N, K)

    losses = {}
    losses["rigid"] = weighted_l2_v2(
        curr_offset_prev, v.prev_offset, v.neighbor_weight, nbr_mask
    )
    losses["rot"] = weighted_l2_v2(
        rel_rot[nbr_idx], rel_rot[:, None], v.neighbor_weight, nbr_mask
    )
    curr_mag = jnp.sqrt(jnp.sum(curr_offset**2, axis=-1) + 1e-20)
    losses["iso"] = weighted_l2_v1(curr_mag, v.neighbor_dist, v.neighbor_weight, nbr_mask)
    losses["floor"] = _masked_mean(jnp.maximum(pts[:, 1], 0.0), fg_f)
    bg_f = is_bg.astype(jnp.float32)
    losses["bg"] = _masked_mean(
        jnp.sum(jnp.abs(pts - v.init_bg_pts), axis=-1), bg_f
    ) + _masked_mean(jnp.sum(jnp.abs(rot - v.init_bg_rot), axis=-1), bg_f)
    return losses
