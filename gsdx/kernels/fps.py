"""Farthest-point sampling on device (replaces DGL's CUDA kernel).

The reference calls `dgl.geometry.farthest_point_sampler`
(`src/data/dataset.py:10,376`, `src/data/utils.py:12-14`). Here FPS is a
fixed-trip-count `lax.fori_loop` with O(n_samples * N) masked distance
updates — fully jit/vmap-compatible, static shapes.

Also provides the radius-stopping variant `fps_rad_idx`
(`src/data/utils.py:36-49`): greedy FPS that stops once every point is within
``radius`` of a sample. On TPU the loop runs a fixed ``max_samples`` trips and
returns a validity mask instead of a dynamic-length list.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = 1e10


@functools.partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(
    points: jnp.ndarray,
    n_samples: int,
    start_idx: jnp.ndarray | int = 0,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Indices (n_samples,) of greedy farthest points; first is start_idx.

    If fewer than n_samples valid points exist, indices repeat (distance hits
    zero) — callers should mask with their own counts, as the reference does
    via min(max_nobj, N) (`src/data/dataset.py:375`).
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    start_idx = jnp.asarray(start_idx, jnp.int32)

    def body(i, carry):
        dist, idxs, farthest = carry
        idxs = idxs.at[i].set(farthest)
        centroid = points[farthest]
        d = jnp.sum((points - centroid) ** 2, axis=-1)
        d = jnp.where(valid, d, -_INF)
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist).astype(jnp.int32)
        return dist, idxs, farthest

    dist0 = jnp.where(valid, _INF, -_INF)
    idxs0 = jnp.zeros((n_samples,), jnp.int32)
    _, idxs, _ = jax.lax.fori_loop(0, n_samples, body, (dist0, idxs0, start_idx))
    return idxs


@functools.partial(jax.jit, static_argnames=("max_samples",))
def fps_rad_idx(
    points: jnp.ndarray,
    radius: jnp.ndarray | float,
    max_samples: int,
    start_idx: jnp.ndarray | int = 0,
    valid: jnp.ndarray | None = None,
):
    """Radius-stopping FPS. Returns (indices (max_samples,), keep_mask).

    Matches `fps_rad_idx` (`src/data/utils.py:36-49`): keep adding the
    farthest point while max distance > radius. keep_mask marks samples taken
    before the stopping criterion fired.
    """
    n = points.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    start_idx = jnp.asarray(start_idx, jnp.int32)
    radius = jnp.asarray(radius, jnp.float32)

    def body(i, carry):
        dist, idxs, keep, farthest, active = carry
        idxs = idxs.at[i].set(farthest)
        keep = keep.at[i].set(active)
        centroid = points[farthest]
        d = jnp.sum((points - centroid) ** 2, axis=-1)
        d = jnp.where(valid, d, -_INF)
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist).astype(jnp.int32)
        # Reference loops `while dist.max() > radius` on euclidean distance.
        active = active & (jnp.max(dist) > radius * radius)
        return dist, idxs, keep, farthest, active

    dist0 = jnp.where(valid, _INF, -_INF)
    idxs0 = jnp.zeros((max_samples,), jnp.int32)
    keep0 = jnp.zeros((max_samples,), bool)
    _, idxs, keep, _, _ = jax.lax.fori_loop(
        0, max_samples, body, (dist0, idxs0, keep0, start_idx, True)
    )
    return idxs, keep
