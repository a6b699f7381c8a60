"""K-nearest-neighbor search on device (replaces Open3D's C++ KDTree).

The reference calls `o3d.geometry.KDTreeFlann.search_knn_vector_3d` on the
host per point (`src/tracking/helpers.py:97-115`), forcing a GPU->CPU->GPU
round trip every timestep. For the point counts in this workload (<= ~200k)
a brute-force chunked distance matrix is faster on TPU than any tree: each
row chunk is one |chunk| x N matmul on the MXU followed by a top-k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e10


@functools.partial(jax.jit, static_argnames=("k", "row_chunk", "exclude_self"))
def knn(
    points: jnp.ndarray,
    k: int,
    valid: jnp.ndarray | None = None,
    row_chunk: int = 2048,
    exclude_self: bool = True,
):
    """k nearest neighbors among ``points`` for each point.

    Args:
      points: (N, 3) float array.
      k: neighbor count (excluding the query point when exclude_self).
      valid: optional (N,) mask; invalid points are never neighbors and get
        arbitrary results themselves.
      row_chunk: query rows per matmul block.

    Returns:
      (sq_dists (N, k), indices (N, k) int32) sorted ascending by distance —
      matching the reference `o3d_knn` contract (`src/tracking/helpers.py:97`).
    """
    n = points.shape[0]
    sq_norms = jnp.sum(points * points, axis=-1)  # (N,)
    if valid is None:
        valid = jnp.ones((n,), bool)
    else:
        valid = valid.astype(bool)

    def chunk_fn(args):
        rows, row_idx = args
        d2 = (
            jnp.sum(rows * rows, axis=-1)[:, None]
            - 2.0 * rows @ points.T
            + sq_norms[None, :]
        )
        d2 = jnp.where(valid[None, :], d2, _INF)
        if exclude_self:
            d2 = jnp.where(row_idx[:, None] == jnp.arange(n)[None, :], _INF, d2)
        neg_d, idx = jax.lax.top_k(-d2, k)
        return -neg_d, idx.astype(jnp.int32)

    pad = (-n) % row_chunk
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    idx_pad = jnp.arange(n + pad)
    pts_blocks = pts_pad.reshape(-1, row_chunk, 3)
    idx_blocks = idx_pad.reshape(-1, row_chunk)
    d, i = jax.lax.map(chunk_fn, (pts_blocks, idx_blocks))
    d = d.reshape(-1, k)[:n]
    i = i.reshape(-1, k)[:n]
    # Brute-force distances can go slightly negative from cancellation.
    return jnp.maximum(d, 0.0), i
