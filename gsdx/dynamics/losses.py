"""Set-distance losses (reference `src/gnn/model.py:249-359`).

Chamfer/Hausdorff are plain device ops. EMD: the reference solves an exact
Hungarian assignment on CPU per batch item (scipy `linear_sum_assignment`,
`model.py:319`); EMD is eval-only in the pipeline, so we provide an on-device
Sinkhorn approximation (default) and an exact host fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_dist(x, y):
    # (B, N, D), (B, M, D) -> (B, N, M) euclidean
    d2 = (
        jnp.sum(x * x, -1)[:, :, None]
        - 2 * jnp.einsum("bnd,bmd->bnm", x, y)
        + jnp.sum(y * y, -1)[:, None, :]
    )
    return jnp.sqrt(jnp.maximum(d2, 1e-12))


def chamfer_distance(pred, target):
    """Mean of min-row + mean of min-col distances (`model.py:252-263`)."""
    d = _pairwise_dist(pred, target)
    return jnp.mean(jnp.min(d, axis=2)) + jnp.mean(jnp.min(d, axis=1))


def hausdorff_distance(pred, target):
    d = _pairwise_dist(pred, target)
    return jnp.max(jnp.min(d, axis=2)) + jnp.max(jnp.min(d, axis=1))


def emd_distance(pred, target, n_iters: int = 50, eps: float = 0.01):
    """Entropy-regularized OT (Sinkhorn) approximation of the reference EMD.

    The reference computes mean distance under the optimal assignment
    (`model.py:305-330`). Sinkhorn with a small epsilon converges to the same
    value for point sets of equal size while staying on device and
    differentiable.
    """
    d = _pairwise_dist(pred, target)  # (B, N, M)
    B, N, M = d.shape
    log_k = -d / eps
    log_u = jnp.zeros((B, N))
    log_v = jnp.zeros((B, M))
    log_a = -jnp.log(N)
    log_b = -jnp.log(M)

    def body(_, carry):
        log_u, log_v = carry
        log_u = log_a - jax.nn.logsumexp(log_k + log_v[:, None, :], axis=2)
        log_v = log_b - jax.nn.logsumexp(log_k + log_u[:, :, None], axis=1)
        return log_u, log_v

    log_u, log_v = jax.lax.fori_loop(0, n_iters, body, (log_u, log_v))
    pi = jnp.exp(log_u[:, :, None] + log_k + log_v[:, None, :])
    # transport cost, rescaled to the reference's mean-over-N convention
    return jnp.sum(pi * d) / B


def emd_distance_exact(pred, target):
    """Exact Hungarian EMD on host (numpy/scipy), non-differentiable."""
    from scipy.optimize import linear_sum_assignment

    pred = np.asarray(pred)
    target = np.asarray(target)
    total = 0.0
    for i in range(pred.shape[0]):
        d = np.linalg.norm(pred[i][:, None] - target[i][None], axis=-1)
        ri, ci = linear_sum_assignment(d)
        total += np.linalg.norm(pred[i][ri] - target[i][ci], axis=-1).mean()
    return total / pred.shape[0]
