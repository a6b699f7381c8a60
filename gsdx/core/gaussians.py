"""Gaussian scene parameter pytrees (fixed capacity + liveness mask).

The reference stores Gaussian parameters as a dict of torch Parameters whose
leading dimension N changes during densification via optimizer surgery
(`src/tracking/train_utils.py:89-149`, `src/tracking/external.py:145-299`).
On TPU, shape changes would retrigger XLA compilation, so we keep a static
capacity ``N`` and a ``live`` mask: dead slots render with opacity 0 and take
no gradient. Densification (clone/split/prune) writes into dead slots and
flips masks — see `gsdx/track/densify.py`.

Parameterization matches `params2rendervar` (`src/tracking/helpers.py:36-45`):
colors are direct RGB (SH degree 0), rotations are unnormalized quats
(normalized at render), opacities go through sigmoid, scales through exp.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gsdx.core.transforms import quat_normalize

MAX_CAMS = 50  # reference `max_cams` (`src/tracking/train_utils.py:116`)


@flax.struct.dataclass
class GaussianParams:
    """Learnable Gaussian parameters, fixed capacity N.

    Attributes:
      means3d: (N, 3) world-space centers.
      rgb_colors: (N, 3) precomputed colors (SH degree 0).
      seg_colors: (N, 3) segmentation colors (seg, 0, 1-seg); not optimized.
      unnorm_rotations: (N, 4) unnormalized quats (w, x, y, z).
      logit_opacities: (N, 1) sigmoid-parameterized opacities.
      log_scales: (N, 3) exp-parameterized anisotropic scales.
      cam_m, cam_c: (MAX_CAMS, 3) per-camera affine color correction
        (`exp(cam_m)*im + cam_c`, `src/tracking/train_utils.py:182`).
      live: (N,) float mask, 1 for active Gaussians. Kept float so it can sit
        in the same pytree without confusing optimizers (it gets no grads).
    """

    means3d: jnp.ndarray
    rgb_colors: jnp.ndarray
    seg_colors: jnp.ndarray
    unnorm_rotations: jnp.ndarray
    logit_opacities: jnp.ndarray
    log_scales: jnp.ndarray
    cam_m: jnp.ndarray
    cam_c: jnp.ndarray
    live: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.means3d.shape[0]

    @property
    def num_live(self) -> jnp.ndarray:
        return jnp.sum(self.live).astype(jnp.int32)

    def opacities(self) -> jnp.ndarray:
        """(N, 1) opacities in [0, 1], zeroed for dead slots."""
        return jax.nn.sigmoid(self.logit_opacities) * self.live[:, None]

    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.log_scales)

    def rotations(self) -> jnp.ndarray:
        return quat_normalize(self.unnorm_rotations)


def init_gaussian_params(
    init_pt_cld: np.ndarray,
    mean3_sq_dist: np.ndarray,
    capacity: Optional[int] = None,
    dtype=jnp.float32,
) -> GaussianParams:
    """Initialize params from an (N, 7) point cloud [xyz, rgb, seg].

    Mirrors `initialize_params` (`src/tracking/train_utils.py:89-149`):
    identity rotations, zero logit opacities (sigmoid -> 0.5), isotropic
    log-scales from the mean 3-NN squared distance, seg colors (seg, 0, 1-seg).
    ``capacity`` pads to a fixed slot count for densification headroom
    (default: 4x the initial count, rounded up to a multiple of 256).
    """
    pts = np.asarray(init_pt_cld, dtype=np.float32)
    n = pts.shape[0]
    if capacity is None:
        capacity = int(np.ceil(4 * n / 256.0) * 256)
    if capacity < n:
        raise ValueError(f"capacity {capacity} < initial point count {n}")

    seg = pts[:, 6]
    log_scales_live = np.tile(
        np.log(np.sqrt(np.clip(mean3_sq_dist, 1e-7, None)))[:, None], (1, 3)
    )

    def padded(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, dtype=np.float32)
        out[:n] = x
        return jnp.asarray(out, dtype=dtype)

    live = np.zeros((capacity,), dtype=np.float32)
    live[:n] = 1.0

    quats = np.zeros((n, 4), dtype=np.float32)
    quats[:, 0] = 1.0

    return GaussianParams(
        means3d=padded(pts[:, :3]),
        rgb_colors=padded(pts[:, 3:6]),
        seg_colors=padded(np.stack([seg, np.zeros_like(seg), 1.0 - seg], axis=-1)),
        unnorm_rotations=padded(quats),
        logit_opacities=padded(np.zeros((n, 1), dtype=np.float32)),
        # Dead slots get tiny scales so they never cover pixels even if a bug
        # lets one through culling.
        log_scales=padded(log_scales_live, fill=-20.0),
        cam_m=jnp.zeros((MAX_CAMS, 3), dtype=dtype),
        cam_c=jnp.zeros((MAX_CAMS, 3), dtype=dtype),
        live=jnp.asarray(live),
    )


@flax.struct.dataclass
class TrackingVariables:
    """Non-learnable tracking state threaded through the optimizer loop.

    Mirrors the reference `variables` dict (`src/tracking/train_utils.py:140-148`
    plus per-timestep fields added at `train_utils.py:331-374`), with fixed
    shapes: KNN neighbor arrays are (N_fg_cap, K) and padded.
    """

    max_2d_radius: jnp.ndarray  # (N,)
    means2d_grad_accum: jnp.ndarray  # (N,)
    denom: jnp.ndarray  # (N,)
    scene_radius: jnp.ndarray  # scalar
    # Per-timestep rigidity-loss state (valid for t > 0):
    neighbor_indices: jnp.ndarray  # (N, K) int32, indices into the param array
    neighbor_weight: jnp.ndarray  # (N, K)
    neighbor_dist: jnp.ndarray  # (N, K)
    neighbor_valid: jnp.ndarray  # (N, K) 1 where the neighbor entry is real
    prev_inv_rot: jnp.ndarray  # (N, 4)
    prev_offset: jnp.ndarray  # (N, K, 3)
    prev_pts: jnp.ndarray  # (N, 3)
    prev_rot: jnp.ndarray  # (N, 4)
    init_bg_pts: jnp.ndarray  # (N, 3)
    init_bg_rot: jnp.ndarray  # (N, 4)


def init_tracking_variables(capacity: int, num_knn: int, scene_radius) -> TrackingVariables:
    z = jnp.zeros
    return TrackingVariables(
        max_2d_radius=z((capacity,)),
        means2d_grad_accum=z((capacity,)),
        denom=z((capacity,)),
        scene_radius=jnp.asarray(scene_radius, dtype=jnp.float32),
        neighbor_indices=z((capacity, num_knn), dtype=jnp.int32),
        neighbor_weight=z((capacity, num_knn)),
        neighbor_dist=z((capacity, num_knn)),
        neighbor_valid=z((capacity, num_knn)),
        prev_inv_rot=z((capacity, 4)),
        prev_offset=z((capacity, num_knn, 3)),
        prev_pts=z((capacity, 3)),
        prev_rot=z((capacity, 4)),
        init_bg_pts=z((capacity, 3)),
        init_bg_rot=z((capacity, 4)),
    )
