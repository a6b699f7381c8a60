"""Dynamics training utilities: Umeyama alignment + auxiliary losses.

Ports the semantics of `src/gnn/utils.py:7-40` (batched masked Umeyama) and
the loss functions of `src/train.py:32-103` to pure JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def umeyama(src, dst, mask, fixed_scale: bool = True):
    """Batched masked rigid alignment src -> dst.

    Args:
      src, dst: (B, N, 3); mask: (B, N) bool.
    Returns (scale (B,), R (B, 3, 3), t (B, 3)) such that
    dst ~= scale * src @ R^T + t. Mirrors `umeyama_algorithm`
    (`src/gnn/utils.py:7-40`).
    """
    m = mask.astype(src.dtype)[..., None]
    n = jnp.maximum(jnp.sum(m, axis=1), 1e-6)  # (B, 1)
    mu_src = jnp.sum(src * m, axis=1) / n
    mu_dst = jnp.sum(dst * m, axis=1) / n
    sc = (src - mu_src[:, None]) * m
    dc = (dst - mu_dst[:, None]) * m
    cov = jnp.einsum("bni,bnj->bij", dc, sc) / n[..., None]
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", U, Vt))
    D = jnp.broadcast_to(jnp.eye(3), U.shape).copy()
    D = D.at[:, 2, 2].set(jnp.sign(det))
    R = jnp.einsum("bij,bjk,bkl->bil", U, D, Vt)
    if fixed_scale:
        scale = jnp.ones(src.shape[0], src.dtype)
    else:
        var = jnp.sum(sc * sc, axis=(1, 2)) / n[:, 0]
        scale = jnp.sum(S * D[:, jnp.arange(3), jnp.arange(3)], axis=1) / var
    t = mu_dst - scale[:, None] * jnp.einsum("bij,bj->bi", R, mu_src)
    return scale, R, t


def mse_loss(pred, gt):
    """Unmasked MSE over padded arrays — matches `src/train.py:62-63`,
    which does NOT mask padded particles (see SURVEY.md §7.4)."""
    return jnp.mean((pred - gt) ** 2)


def length_loss(pred, state, Rr, Rs):
    """Edge-length preservation (`src/train.py:69-84`).

    pos is the OLDEST frame of the current history window (state[:, 0]),
    detached; Rr/Rs sliced to object columns.
    """
    n_p = pred.shape[1]
    pos = jax.lax.stop_gradient(state[:, 0, :n_p])
    Rr_o = Rr[:, :, :n_p]
    Rs_o = Rs[:, :, :n_p]
    pos_diff = Rr_o @ pos - Rs_o @ pos
    pred_diff = Rr_o @ pred - Rs_o @ pred
    pos_len = jnp.sqrt(jnp.sum(pos_diff**2, -1) + 1e-12)
    pred_len = jnp.sqrt(jnp.sum(pred_diff**2, -1) + 1e-12)
    return jnp.mean((pred_len - pos_len) ** 2)


def rigid_loss(pred, state, obj_mask):
    """Soft-rigidity regularizer (`src/train.py:32-40`): penalize deviation
    from the best-fit rigid transform of the original positions."""
    orig = state[:, 0, : pred.shape[1]]
    _, R, t = umeyama(orig, pred, obj_mask, fixed_scale=True)
    pred_ume = jnp.einsum("bni,bji->bnj", orig, R) + t[:, None]
    pred_ume = jax.lax.stop_gradient(pred_ume)
    m = obj_mask.astype(pred.dtype)[..., None]
    return jnp.sum(((pred - pred_ume) ** 2) * m) / jnp.maximum(jnp.sum(m) * 3, 1e-6)
