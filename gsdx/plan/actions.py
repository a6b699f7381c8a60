"""Push-action space: sampling, clipping, MPPI aggregation, decoding.

Re-implements `src/real_world/utils/plan_utils.py:49-144` in pure JAX.
An action is (x, y, theta, length): a pusher start point, push direction,
and a push length in units of `push_length` (0.01 m) that the dynamics
applies as repeated unit pushes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def angle_normalize(x):
    return ((x + jnp.pi) % (2 * jnp.pi)) - jnp.pi


def clip_actions(action, lower, upper):
    """Normalize theta then clamp to limits (`plan_utils.py:102-106`)."""
    action = action.at[..., 2].set(angle_normalize(action[..., 2]))
    return jnp.clip(action, lower, upper)


def sample_action_seq(
    key,
    act_seq,  # (n_look_ahead, 4) current mean sequence
    lower,
    upper,
    n_sample: int,
    iter_index: int | jnp.ndarray = 0,
    noise_level: float = 0.3,
    push_length: float = 0.01,
):
    """Sample n_sample action sequences (`plan_utils.py:49-99`).

    iter 0: uniform resample over the full action box; later iters: keep
    sample 0 as the incumbent mean and perturb the push start/end points
    with scaled Gaussian noise, re-deriving (theta, length).
    """
    n_look = act_seq.shape[0]

    def resample(key):
        u = jax.random.uniform(key, (n_sample, n_look, 4))
        return u * (upper - lower) + lower

    def refine(key):
        xs, ys = act_seq[:, 0], act_seq[:, 1]
        thetas, lengths = act_seq[:, 2], act_seq[:, 3]
        x_ends = xs - lengths * push_length * jnp.cos(thetas)
        y_ends = ys - lengths * push_length * jnp.sin(thetas)

        out = jnp.tile(act_seq[None], (n_sample, 1, 1))
        keys = jax.random.split(key, n_look)
        for i in range(n_look):
            beta = 0.1 * (10.0**i)  # `plan_utils.py:72`
            noise = beta * noise_level * jax.random.normal(keys[i], (n_sample, 4))
            xs_i = xs[i] + noise[:, 0]
            ys_i = ys[i] + noise[:, 1]
            x_ends_i = x_ends[i] + noise[:, 2]
            y_ends_i = y_ends[i] + noise[:, 3]
            thetas_i = jnp.arctan2(ys_i - y_ends_i, xs_i - x_ends_i)
            lengths_i = (
                jnp.sqrt((x_ends_i - xs_i) ** 2 + (y_ends_i - ys_i) ** 2)
                / push_length
            )
            cand = jnp.stack([xs_i, ys_i, thetas_i, lengths_i], axis=-1)
            cand = clip_actions(cand, lower, upper)
            # sample 0 keeps the incumbent (`plan_utils.py:97`)
            out = out.at[1:, i].set(cand[1:])
        return out

    return jax.lax.cond(
        jnp.asarray(iter_index) == 0, resample, refine, key
    )


def sample_action_seq_fps(lower, upper, n_sample: int, n_look_ahead: int = 1,
                          grid_size: float = 0.02):
    """Grid + farthest-point action coverage (`noise_type == "fps"`,
    `planner.py:125-140`): enumerate a regular grid over the action box and
    FPS-select n_sample maximally-spread actions."""
    import numpy as np

    from gsdx.kernels.fps import farthest_point_sampling

    lower_np = np.asarray(lower)
    upper_np = np.asarray(upper)
    axes = [np.arange(lower_np[i], upper_np[i], grid_size)
            for i in range(len(lower_np))]
    grid = np.stack(np.meshgrid(*axes), axis=-1).reshape(-1, len(lower_np))
    idx = farthest_point_sampling(
        jnp.asarray(grid.astype(np.float32)), n_sample, start_idx=0
    )
    acts = jnp.asarray(grid.astype(np.float32))[idx]  # (n_sample, 4)
    return jnp.tile(acts[:, None], (1, n_look_ahead, 1))


def optimize_action_mppi(act_seqs, reward_seqs, lower, upper,
                         reward_weight: float = 100.0,
                         push_length: float = 0.01):
    """Softmax-weighted endpoint aggregation (`plan_utils.py:108-132`)."""
    w = jax.nn.softmax(reward_seqs * reward_weight, axis=0)[:, None]
    xs, ys = act_seqs[:, :, 0], act_seqs[:, :, 1]
    thetas, lengths = act_seqs[:, :, 2], act_seqs[:, :, 3]
    x_ends = xs - lengths * push_length * jnp.cos(thetas)
    y_ends = ys - lengths * push_length * jnp.sin(thetas)
    x = jnp.sum(w * xs, axis=0)
    y = jnp.sum(w * ys, axis=0)
    x_end = jnp.sum(w * x_ends, axis=0)
    y_end = jnp.sum(w * y_ends, axis=0)
    theta = jnp.arctan2(y - y_end, x - x_end)
    length = jnp.sqrt((x_end - x) ** 2 + (y_end - y) ** 2) / push_length
    act = jnp.stack([x, y, theta, length], axis=-1)
    return clip_actions(act, lower, upper)


def decode_action(action, push_length: float = 0.01):
    """(B, L, 4) -> ((B, L, 4) [x0, y0, x1, y1], (B, L) int repeats)
    (`plan_utils.py:135-144`)."""
    x0, y0 = action[:, :, 0], action[:, :, 1]
    theta = action[:, :, 2]
    repeats = action[:, :, 3].astype(jnp.int32)
    x1 = x0 - push_length * jnp.cos(theta)
    y1 = y0 - push_length * jnp.sin(theta)
    return jnp.stack([x0, y0, x1, y1], axis=-1), repeats
