"""Quaternion and rotation utilities (batched, jit-friendly).

Functional equivalents of the reference's quaternion helpers
(`src/tracking/helpers.py:80-92` quat_mult, `src/tracking/external.py:24-41`
build_rotation, `src/render/utils.py:52-113` quat2mat/mat2quat) written as
pure JAX ops over trailing-axis quats. Quaternions are (..., 4) in (w, x, y, z)
order. All functions are shape-polymorphic over leading axes and safe under
vmap/jit/grad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray, eps: float = 1e-24) -> jnp.ndarray:
    """L2-normalize quaternions along the last axis.

    Uses rsqrt(|q|^2 + eps) rather than division by max(|q|, eps): the latter
    has a NaN gradient at q = 0, which dead fixed-capacity slots (zero quats)
    would propagate into the whole gradient tree via masked reductions.
    """
    sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return q * jax.lax.rsqrt(sq + eps)


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion conjugate (w, -x, -y, -z); inverse for unit quats."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of two (..., 4) quaternion arrays."""
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    w = w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2
    x = w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2
    y = w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2
    z = w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2
    return jnp.stack([w, x, y, z], axis=-1)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 4) quats to (..., 3, 3) rotation matrices.

    Normalizes first, matching the reference `build_rotation`
    (`src/tracking/external.py:24-41`).
    """
    q = quat_normalize(q)
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def rotmat_to_quat(rot: jnp.ndarray) -> jnp.ndarray:
    """Convert (..., 3, 3) rotation matrices to (..., 4) unit quats.

    Branchless Shepperd's method: computes all four candidate quats and
    selects by the largest diagonal element via `where` (replaces the masked
    four-branch torch code at `src/render/utils.py:73-113` with a form that
    is jit/vmap-safe and NaN-free for any proper rotation).
    """
    m = rot
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each valid when its pivot is the largest.
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q0 = jnp.stack(
        [safe_sqrt(1.0 + tr), m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    q1 = jnp.stack(
        [m21 - m12, safe_sqrt(1.0 + m00 - m11 - m22), m01 + m10, m02 + m20], axis=-1
    )
    q2 = jnp.stack(
        [m02 - m20, m01 + m10, safe_sqrt(1.0 + m11 - m00 - m22), m12 + m21], axis=-1
    )
    q3 = jnp.stack(
        [m10 - m01, m02 + m20, m12 + m21, safe_sqrt(1.0 + m22 - m00 - m11)], axis=-1
    )

    # Pick the numerically best pivot. Candidate i's off-pivot components are
    # scaled by 0.5 / pivot_term; the pivot component itself equals
    # 0.5 * pivot_term and is patched in afterwards.
    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)

    cands = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4 cand, 4)
    pivot_terms = jnp.stack(
        [q0[..., 0], q1[..., 1], q2[..., 2], q3[..., 3]], axis=-1
    )  # (..., 4)
    sel = jnp.take_along_axis(
        cands, jnp.broadcast_to(best[..., None, None], best.shape + (1, 4)), axis=-2
    )[..., 0, :]
    sel_pivot = jnp.take_along_axis(pivot_terms, best[..., None], axis=-1)[..., 0]
    q = sel * (0.5 / sel_pivot)[..., None]
    q = jnp.where(
        jnp.arange(4) == best[..., None], (0.5 * sel_pivot)[..., None], q
    )
    return quat_normalize(q)
