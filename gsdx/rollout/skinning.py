"""Gaussian skinning: interpolate sparse bone motions to the full splat set.

Re-design of `interpolate_motions` (`src/render/utils.py:129-243`). The
reference runs a python loop over bones, one SVD each (~100 host-synced SVDs
per rollout step). Here every per-bone rigid fit is a batched masked
covariance + one vmapped SVD, and the particle blend is a pair of einsums —
the whole skinning step is a single fused XLA computation.

Math: per bone i, F_i = sum_j rel_ij (nbr_new_j - self_new_i)(nbr_j - self_i)^T;
R_i = Kabsch(F_i) (det-corrected orthogonal Procrustes, replacing the
reference's rank-special-casing at `utils.py:168-198` with the standard
well-defined fit; rank-1 F still yields the closest proper rotation).
Particles blend bone transforms with inverse-distance weights and update
quaternions by the weighted-blended base rotations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsdx.core.transforms import quat_multiply, quat_normalize, rotmat_to_quat


def relations_to_matrix(Rr: jnp.ndarray, Rs: jnp.ndarray, n: int) -> jnp.ndarray:
    """(max_nR, N) one-hot pairs -> (n, n) adjacency (`utils.py:135-141`)."""
    valid = jnp.sum(Rr, axis=1) > 0  # (max_nR,)
    contrib = jnp.einsum("er,es->rs", Rr * valid[:, None], Rs)
    return (contrib[:n, :n] > 0).astype(jnp.float32)


def bone_rotations(bones, motions, relations, bone_mask=None):
    """Per-bone rigid rotations from neighbor offsets. (n_bones, 3, 3)."""
    nb = bones.shape[0]
    rel = relations
    if bone_mask is not None:
        m = bone_mask.astype(jnp.float32)
        rel = rel * m[:, None] * m[None, :]
    old_off = bones[None, :, :] - bones[:, None, :]  # (i, j, 3): nbr - self
    new_pts = bones + motions
    new_off = new_pts[None, :, :] - new_pts[:, None, :]
    # F_i = sum_j rel_ij new_off_ij old_off_ij^T  (3x3 per bone)
    F = jnp.einsum("ij,ija,ijb->iab", rel, new_off, old_off)

    def kabsch(Fi, n_adj):
        U, S, Vt = jnp.linalg.svd(Fi)
        d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
        D = jnp.diag(jnp.array([1.0, 1.0, 1.0]))
        D = D.at[2, 2].set(d)
        R = U @ D @ Vt
        # no neighbors -> identity (`utils.py:160-162`)
        return jnp.where(n_adj > 0, R, jnp.eye(3))

    n_adj = jnp.sum(rel, axis=1)
    return jax.vmap(kabsch)(F, n_adj)


def interpolate_motions(
    bones: jnp.ndarray,  # (n_bones, 3)
    motions: jnp.ndarray,  # (n_bones, 3)
    relations: jnp.ndarray,  # (n_bones, n_bones) adjacency
    xyz: jnp.ndarray,  # (n_particles, 3)
    quat: jnp.ndarray | None = None,  # (n_particles, 4)
    bone_mask: jnp.ndarray | None = None,  # (n_bones,) valid bones
    weights: jnp.ndarray | None = None,  # (n_particles, n_bones)
):
    """Returns (xyz_new, quat_new, weights) like `utils.py:143-243`."""
    R = bone_rotations(bones, motions, relations, bone_mask)  # (nb, 3, 3)

    if weights is None:
        d = jnp.linalg.norm(xyz[:, None, :] - bones[None, :, :], axis=-1)
        d = jnp.maximum(d, 1e-4)
        w = 1.0 / d  # (np, nb)
        if bone_mask is not None:
            w = w * bone_mask.astype(w.dtype)[None, :]
        weights = w / jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1e-12)

    # per-bone rigid transform of every particle, IDW blended
    rel_pos = xyz[:, None, :] - bones[None, :, :]  # (np, nb, 3)
    moved = (
        jnp.einsum("pbj,bij->pbi", rel_pos, R)
        + motions[None]
        + bones[None]
    )  # (np, nb, 3)
    xyz_new = jnp.einsum("pbi,pb->pi", moved, weights)

    quat_new = None
    if quat is not None:
        base_quats = quat_normalize(rotmat_to_quat(R))  # (nb, 4)
        q = jnp.einsum("bq,pb->pq", base_quats, weights)
        q = quat_normalize(q)
        quat_new = quat_multiply(q, quat)
    return xyz_new, quat_new, weights
