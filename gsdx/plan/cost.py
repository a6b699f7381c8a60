"""MPPI reward (reference `running_cost`, `src/real_world/plan.py:157-201`).

reward = -chamfer(final state, target)
         - 5 * mean collision penalty (pusher spawning inside the object)
         - 5 * mean out-of-workspace penalty.
"""

from __future__ import annotations

import jax.numpy as jnp

from gsdx.dynamics.losses import _pairwise_dist

PUSHER_SIZE = 0.01  # `plan.py:182`


def _chamfer(x, y):
    """Batched chamfer (B, N, 3) vs (B, M, 3) -> (B,) (`plan_utils.py:18-24`)."""
    d = _pairwise_dist(x, y)
    return jnp.mean(jnp.min(d, axis=2), axis=1) + jnp.mean(jnp.min(d, axis=1), axis=1)


def box_loss(state, target_box):
    """Distance of particles outside a target x-y box, mean over particles
    (`box_loss`, `plan_utils.py:147-157`). state (B, N, 3),
    target_box (2, 2) [[xmin, xmax], [ymin, ymax]] -> (B,)."""
    xmin, xmax = target_box[0, 0], target_box[0, 1]
    ymin, ymax = target_box[1, 0], target_box[1, 1]
    x = state[:, :, 0]
    y = state[:, :, 2]  # reference indexes z-up layouts with [:, :, 2]
    x_diff = jnp.maximum(xmin - x, 0.0) + jnp.maximum(x - xmax, 0.0)
    y_diff = jnp.maximum(ymin - y, 0.0) + jnp.maximum(y - ymax, 0.0)
    return jnp.mean(jnp.sqrt(x_diff**2 + y_diff**2), axis=1)


def running_cost(state, action, state_cur, target_state, bounding_box):
    """Args:
      state: (B, L, n_obj, 3) predicted states.
      action: (B, L, 4) decoded [x0, y0, x1, y1].
      state_cur: (n_obj, 3) current object state.
      target_state: (n_target, 3).
      bounding_box: (3, 2) workspace [[xmin, xmax], [ymin, ymax], [zmin, zmax]].
    Returns {"reward_seqs": (B,)}.
    """
    B, L = state.shape[:2]
    state_flat = state.reshape(B * L, state.shape[2], 3)
    target = jnp.tile(target_state[None], (B * L, 1, 1))
    cham = _chamfer(state_flat, target).reshape(B, L)

    start_2d = action[:, :, :2]  # (B, L, 2)
    state_2d = jnp.concatenate(
        [
            jnp.tile(state_cur[None, None, :, :2], (B, 1, 1, 1)),
            state[:, :-1, :, :2],
        ],
        axis=1,
    )  # (B, L, n_obj, 2)
    d = jnp.linalg.norm(start_2d[:, :, None] - state_2d, axis=-1)
    d = jnp.min(d, axis=-1)  # (B, L)
    d = jnp.maximum(d - PUSHER_SIZE, 0.0)
    collision = jnp.exp(-d * 100.0)

    bbox = bounding_box[:2]  # x-y plane
    xmin = jnp.min(state[..., 0], axis=2)
    xmax = jnp.max(state[..., 0], axis=2)
    ymin = jnp.min(state[..., 1], axis=2)
    ymax = jnp.max(state[..., 1], axis=2)
    box_pen = jnp.stack(
        [
            jnp.maximum(xmin - bbox[0, 0], 0.0),
            jnp.maximum(bbox[0, 1] - xmax, 0.0),
            jnp.maximum(ymin - bbox[1, 0], 0.0),
            jnp.maximum(bbox[1, 1] - ymax, 0.0),
        ],
        axis=-1,
    )
    box_pen = jnp.max(jnp.exp(-box_pen * 100.0), axis=-1)  # (B, L)

    reward = (
        -cham[:, -1]
        - 5.0 * jnp.mean(collision, axis=1)
        - 5.0 * jnp.mean(box_pen, axis=1)
    )
    return {"reward_seqs": reward}
