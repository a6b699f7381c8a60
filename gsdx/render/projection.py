"""EWA projection of 3D Gaussians to screen space (pure JAX, differentiable).

Re-derivation of the projection stage of the CUDA rasterizer the reference
consumes (`diff-gaussian-rasterization-w-depth`, called from
`src/render/renderer.py:22` / `src/tracking/train_utils.py:178`):

  * camera transform  p_cam = w2c @ p_world, depth = z
  * 3D covariance     Sigma = R S S^T R^T  (quat -> R, exp(log_scales) -> S)
  * EWA 2D covariance cov2d = J W Sigma W^T J^T + 0.3 I, with the Jacobian's
    tx/tz, ty/tz clamped to 1.3x the field of view
  * conic = inverse(cov2d), radius = ceil(3 sqrt(lambda_max))
  * pixel center      pix = (fx x/z + cx - 0.5, fy y/z + cy - 0.5)
  * near culling at z <= 0.2 (the CUDA kernel's hardcoded in_frustum bound)

Everything is batched over N and left to XLA; the backward pass is plain
autodiff (no custom kernel needed — it is bandwidth-trivial next to
compositing).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from gsdx.core.cameras import Camera
from gsdx.core.transforms import quat_to_rotmat

# The CUDA reference culls against a hardcoded 0.2 view-space z regardless of
# the projection matrix near plane.
NEAR_CULL_Z = 0.2


@flax.struct.dataclass
class ProjectedGaussians:
    """Screen-space Gaussians ready for binning + compositing.

    mean2d: (N, 2) pixel coordinates.
    conic:  (N, 3) upper-triangular inverse 2D covariance (a, b, c) such that
            power = -0.5 (a dx^2 + c dy^2) - b dx dy.
    depth:  (N,) view-space z.
    radius: (N,) float extent in pixels (3 sigma), 0 for culled Gaussians.
    mask:   (N,) bool — in front of camera, invertible covariance, visible.
    """

    mean2d: jnp.ndarray
    conic: jnp.ndarray
    depth: jnp.ndarray
    radius: jnp.ndarray
    mask: jnp.ndarray


def compute_cov3d(quats: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3) world covariance from unit-normalized quats and scales."""
    R = quat_to_rotmat(quats)  # (N, 3, 3)
    M = R * scales[:, None, :]  # R @ diag(s)
    return M @ jnp.swapaxes(M, -1, -2)


def project_gaussians(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    camera: Camera,
    live: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project N world-space Gaussians into screen space for one camera."""
    R_w2c = camera.w2c[:3, :3]
    t_w2c = camera.w2c[:3, 3]
    p_cam = means3d @ R_w2c.T + t_w2c  # (N, 3)
    tx, ty, tz = p_cam[:, 0], p_cam[:, 1], p_cam[:, 2]

    in_front = tz > NEAR_CULL_Z
    # Keep tz usable for masked-out entries to avoid NaNs poisoning grads.
    tz_safe = jnp.where(in_front, tz, 1.0)

    # EWA Jacobian with FOV clamping (matches the CUDA computeCov2D).
    lim_x = 1.3 * camera.tan_fovx
    lim_y = 1.3 * camera.tan_fovy
    txz = jnp.clip(tx / tz_safe, -lim_x, lim_x)
    tyz = jnp.clip(ty / tz_safe, -lim_y, lim_y)

    fx, fy = camera.fx, camera.fy
    # cov2d = (J W M)(J W M)^T with M = R(q) diag(s). Rather than batched
    # (N,3,3) matmul chains — which XLA lowers as tiny per-row matmuls at
    # ~1.6 GFLOP/s on TPU — expand everything to (N,) vector arithmetic.
    # J rows: [fx/tz, 0, -fx*txz/tz], [0, fy/tz, -fy*tyz/tz]
    # V = J @ W (2, 3 per gaussian): V0 = (fx W0 - fx*txz W2) / tz, etc.
    inv_tz = 1.0 / tz_safe
    W0, W1, W2 = R_w2c[0], R_w2c[1], R_w2c[2]  # constant (3,) rows
    v0 = (fx * inv_tz)[:, None] * W0[None] - (fx * txz * inv_tz)[:, None] * W2[None]
    v1 = (fy * inv_tz)[:, None] * W1[None] - (fy * tyz * inv_tz)[:, None] * W2[None]

    Rg = quat_to_rotmat(quats)  # (N, 3, 3) — elementwise quat polynomials
    # U = V @ (Rg * s): U[i, j] = sum_k V[i, k] Rg[k, j] s[j]
    u0 = jnp.einsum("nk,nkj->nj", v0, Rg) * scales  # (N, 3)
    u1 = jnp.einsum("nk,nkj->nj", v1, Rg) * scales

    # Low-pass dilation: ensure every splat covers at least ~1 pixel.
    c00 = jnp.sum(u0 * u0, axis=-1) + 0.3
    c11 = jnp.sum(u1 * u1, axis=-1) + 0.3
    c01 = jnp.sum(u0 * u1, axis=-1)

    det = c00 * c11 - c01 * c01
    invertible = det != 0.0
    det_safe = jnp.where(invertible, det, 1.0)
    conic = jnp.stack([c11 / det_safe, -c01 / det_safe, c00 / det_safe], axis=-1)

    mid = 0.5 * (c00 + c11)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    pix_x = fx * tx / tz_safe + camera.cx - 0.5
    pix_y = fy * ty / tz_safe + camera.cy - 0.5
    mean2d = jnp.stack([pix_x, pix_y], axis=-1)

    mask = in_front & invertible & (radius > 0)
    if live is not None:
        mask = mask & (live > 0)

    radius = jnp.where(mask, radius, 0.0)
    return ProjectedGaussians(
        mean2d=mean2d, conic=conic, depth=tz, radius=radius, mask=mask
    )
