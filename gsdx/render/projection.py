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
from gsdx.core.transforms import quat_normalize, quat_to_rotmat

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
    mxw, myw, mzw = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    tx = mxw * R_w2c[0, 0] + myw * R_w2c[0, 1] + mzw * R_w2c[0, 2] + t_w2c[0]
    ty = mxw * R_w2c[1, 0] + myw * R_w2c[1, 1] + mzw * R_w2c[1, 2] + t_w2c[1]
    tz = mxw * R_w2c[2, 0] + myw * R_w2c[2, 1] + mzw * R_w2c[2, 2] + t_w2c[2]

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
    # (N,3,3) matmul chains or batched einsum matvecs — both of which XLA
    # lowers as tiny per-row matmuls at ~1.6 GFLOP/s on TPU (the r4 fwd
    # decomposition measured 0.5 ms of the 65k step in this stage) — expand
    # EVERYTHING, including the rotation application, to (N,) vector
    # arithmetic. J rows: [fx/tz, 0, -fx*txz/tz], [0, fy/tz, -fy*tyz/tz];
    # V = J @ W; U = V @ R(q) diag(s); cov2d = U U^T + 0.3 I.
    inv_tz = 1.0 / tz_safe
    W = R_w2c  # constant (3, 3)
    a0 = fx * inv_tz
    b0 = -fx * txz * inv_tz
    a1 = fy * inv_tz
    b1 = -fy * tyz * inv_tz
    v00 = a0 * W[0, 0] + b0 * W[2, 0]
    v01 = a0 * W[0, 1] + b0 * W[2, 1]
    v02 = a0 * W[0, 2] + b0 * W[2, 2]
    v10 = a1 * W[1, 0] + b1 * W[2, 0]
    v11 = a1 * W[1, 1] + b1 * W[2, 1]
    v12 = a1 * W[1, 2] + b1 * W[2, 2]

    qn = quat_normalize(quats)
    qr, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    r00 = 1 - 2 * (qy * qy + qz * qz)
    r01 = 2 * (qx * qy - qr * qz)
    r02 = 2 * (qx * qz + qr * qy)
    r10 = 2 * (qx * qy + qr * qz)
    r11 = 1 - 2 * (qx * qx + qz * qz)
    r12 = 2 * (qy * qz - qr * qx)
    r20 = 2 * (qx * qz - qr * qy)
    r21 = 2 * (qy * qz + qr * qx)
    r22 = 1 - 2 * (qx * qx + qy * qy)

    s0, s1, s2 = scales[:, 0], scales[:, 1], scales[:, 2]
    u00 = (v00 * r00 + v01 * r10 + v02 * r20) * s0
    u01 = (v00 * r01 + v01 * r11 + v02 * r21) * s1
    u02 = (v00 * r02 + v01 * r12 + v02 * r22) * s2
    u10 = (v10 * r00 + v11 * r10 + v12 * r20) * s0
    u11 = (v10 * r01 + v11 * r11 + v12 * r21) * s1
    u12 = (v10 * r02 + v11 * r12 + v12 * r22) * s2

    # Low-pass dilation: ensure every splat covers at least ~1 pixel.
    c00 = u00 * u00 + u01 * u01 + u02 * u02 + 0.3
    c11 = u10 * u10 + u11 * u11 + u12 * u12 + 0.3
    c01 = u00 * u10 + u01 * u11 + u02 * u12

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
