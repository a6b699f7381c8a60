"""On-device graph dataset assembly (reference `src/data/dataset.py:240-516`).

The reference builds each training sample in torch DataLoader worker
processes: FPS -> radius-FPS -> noise/rotation augmentation -> O(N^2) edge
construction -> padding. On TPU that host pipeline would starve the chip, so
sample assembly is a jit/vmapped device function over a resident episode
store: one `sample_batch(key, pair_rows)` call builds a whole batch on
device. All shapes are static; variable particle counts become masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gsdx.graph.edges import construct_edges
from gsdx.kernels.fps import farthest_point_sampling, fps_rad_idx


class GraphDatasetConfig(NamedTuple):
    """Mirrors the dataset_config yaml block (`src/config/rope.yaml:36-51`)."""

    n_his: int = 3
    n_future: int = 5
    max_nobj: int = 100
    max_tool: int = 1
    max_nR: int = 500
    fps_radius_range: tuple = (0.03, 0.03)
    adj_radius_range: tuple = (0.08, 0.08)
    state_noise_train: float = 0.003
    state_noise_valid: float = 0.0
    topk: int = 5
    connect_all: bool = False


@flax.struct.dataclass
class GraphBatch:
    """One training batch — the reference graph dict (`dataset.py:495-515`)."""

    state: jnp.ndarray  # (B, n_his, N, 3); N = max_nobj + max_tool
    action: jnp.ndarray  # (B, N, 3)
    tool_future: jnp.ndarray  # (B, n_future-1, N, 3)
    action_future: jnp.ndarray  # (B, n_future-1, N, 3)
    state_future: jnp.ndarray  # (B, n_future, max_nobj, 3)
    attrs: jnp.ndarray  # (B, N, 2)
    p_instance: jnp.ndarray  # (B, max_nobj, 1)
    obj_mask: jnp.ndarray  # (B, max_nobj) bool
    state_mask: jnp.ndarray  # (B, N) bool
    tool_mask: jnp.ndarray  # (B, N) bool
    Rr: jnp.ndarray  # (B, max_nR, N)
    Rs: jnp.ndarray  # (B, max_nR, N)


class EpisodeStore(NamedTuple):
    """Device-resident episode arrays.

    particle_pos: (E, T, P, 3) tracked/downsampled trajectories
                  (`param_downsampled.npy` per episode, padded over T).
    eef_pos: (E, T, n_tool, 3) gripper world positions.
    pair_list: (n_pairs, 1 + n_his + n_future) int32 [episode, frame...]
               rows from `frame_pairs/{ep}.txt` (`dataset.py:16-23`).
    """

    particle_pos: jnp.ndarray
    eef_pos: jnp.ndarray
    pair_list: jnp.ndarray

    @staticmethod
    def from_numpy(particle_pos: Sequence[np.ndarray],
                   eef_pos: Sequence[np.ndarray],
                   pair_lists: Sequence[np.ndarray]) -> "EpisodeStore":
        """Stack ragged per-episode arrays with time padding."""
        E = len(particle_pos)
        T = max(p.shape[0] for p in particle_pos)
        P = max(p.shape[1] for p in particle_pos)
        n_tool = eef_pos[0].shape[1]
        pp = np.zeros((E, T, P, 3), np.float32)
        ee = np.zeros((E, T, n_tool, 3), np.float32)
        for i, (p, e) in enumerate(zip(particle_pos, eef_pos)):
            pp[i, : p.shape[0], : p.shape[1]] = p
            ee[i, : e.shape[0]] = e[: T]
            # repeat last frame into padding so out-of-range gathers are sane
            pp[i, p.shape[0]:] = pp[i, p.shape[0] - 1]
            ee[i, e.shape[0]:] = ee[i, min(e.shape[0], T) - 1]
        pairs = np.concatenate(pair_lists, axis=0).astype(np.int32)
        return EpisodeStore(
            particle_pos=jnp.asarray(pp),
            eef_pos=jnp.asarray(ee),
            pair_list=jnp.asarray(pairs),
        )


def _rot_z(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [jnp.stack([c, -s, z]), jnp.stack([s, c, z]), jnp.stack([z, z, o])]
    )


def _sample_one(key, pair_row, store: EpisodeStore, cfg: GraphDatasetConfig,
                noise: float):
    """Build one graph sample (`DynDataset.__getitem__`, `dataset.py:332-516`)."""
    n_his, n_fut = cfg.n_his, cfg.n_future
    max_nobj, max_tool = cfg.max_nobj, cfg.max_tool
    N = max_nobj + max_tool

    ep = pair_row[0]
    frames = pair_row[1:]  # (n_his + n_future,)

    obj_kps = store.particle_pos[ep][frames]  # (n_his+n_fut, P, 3)
    tool_kps = store.eef_pos[ep][frames]  # (n_his+n_fut, n_tool, 3)

    k_start, k_rad, k_noise, k_rot = jax.random.split(key, 4)

    # FPS on the last history frame with a random start, then radius-FPS with
    # a random radius (`dataset.py:373-386`).
    anchor = obj_kps[n_his - 1]  # (P, 3)
    P = anchor.shape[0]
    start = jax.random.randint(k_start, (), 0, P)
    fps1 = farthest_point_sampling(anchor, min(max_nobj, P), start_idx=start)
    down = anchor[fps1]
    radius = jax.random.uniform(
        k_rad, (), minval=cfg.fps_radius_range[0], maxval=cfg.fps_radius_range[1]
    )
    idx2, keep = fps_rad_idx(down, radius, max_samples=min(max_nobj, P))
    fps_idx = fps1[idx2]  # (max_nobj,) in greedy selection order
    obj_mask = keep
    if fps_idx.shape[0] < max_nobj:
        fps_idx = jnp.pad(fps_idx, (0, max_nobj - fps_idx.shape[0]))
        obj_mask = jnp.pad(obj_mask, (0, max_nobj - obj_mask.shape[0]))
    keep_f = obj_mask[:, None].astype(jnp.float32)

    def take(frame_pts):  # (P, 3) -> (max_nobj, 3) packed + zero-padded
        return frame_pts[fps_idx] * keep_f

    n_tool = tool_kps.shape[1]

    # history states: object slots [0, max_nobj), tool at [max_nobj, ...)
    state_history = jnp.zeros((n_his, N, 3))
    for fi in range(n_his):
        state_history = state_history.at[fi, :max_nobj].set(take(obj_kps[fi]))
        state_history = state_history.at[fi, max_nobj:max_nobj + n_tool].set(
            tool_kps[fi]
        )

    # current action = tool delta between last history frame and next frame
    states_delta = jnp.zeros((N, 3))
    states_delta = states_delta.at[max_nobj:max_nobj + n_tool].set(
        tool_kps[n_his] - tool_kps[n_his - 1]
    )

    # future object ground truth
    state_future = jnp.stack(
        [take(obj_kps[n_his + fi]) for fi in range(n_fut)], axis=0
    )  # (n_fut, max_nobj, 3)

    # future tool poses + deltas
    tool_future = jnp.zeros((n_fut - 1, N, 3))
    action_future = jnp.zeros((n_fut - 1, N, 3))
    for fi in range(n_fut - 1):
        tool_future = tool_future.at[fi, max_nobj:max_nobj + n_tool].set(
            tool_kps[n_his + fi]
        )
        action_future = action_future.at[fi, max_nobj:max_nobj + n_tool].set(
            tool_kps[n_his + fi + 1] - tool_kps[n_his + fi]
        )

    state_mask = jnp.concatenate(
        [obj_mask, jnp.ones((max_tool,), bool)], axis=0
    )
    tool_mask = jnp.concatenate(
        [jnp.zeros((max_nobj,), bool), jnp.ones((max_tool,), bool)], axis=0
    )

    attrs = jnp.zeros((N, 2))
    attrs = attrs.at[:max_nobj, 0].set(obj_mask.astype(jnp.float32))
    attrs = attrs.at[max_nobj:, 1].set(1.0)

    p_instance = obj_mask[:, None].astype(jnp.float32)  # single instance

    # augmentation (`dataset.py:461-473`): uniform state noise + random z-rot
    state_history = state_history + jax.random.uniform(
        k_noise, state_history.shape, minval=-noise, maxval=noise
    )
    theta = jax.random.uniform(k_rot, (), minval=-jnp.pi, maxval=jnp.pi)
    R = _rot_z(theta)  # (3, 3); reference right-multiplies by rot_mat
    state_history = state_history @ R
    states_delta = states_delta @ R
    tool_future = tool_future @ R
    action_future = action_future @ R
    state_future = state_future @ R

    adj = jax.random.uniform(
        key, (), minval=cfg.adj_radius_range[0], maxval=cfg.adj_radius_range[1]
    )
    Rr, Rs = construct_edges(
        state_history[-1], adj, state_mask, tool_mask,
        n_obj=max_nobj, topk=cfg.topk, max_nR=cfg.max_nR,
        connect_all=cfg.connect_all,
    )

    return GraphBatch(
        state=state_history,
        action=states_delta,
        tool_future=tool_future,
        action_future=action_future,
        state_future=state_future,
        attrs=attrs,
        p_instance=p_instance,
        obj_mask=obj_mask,
        state_mask=state_mask,
        tool_mask=tool_mask,
        Rr=Rr,
        Rs=Rs,
    )


class GraphSampler:
    """Batched on-device sampler over an EpisodeStore."""

    def __init__(self, store: EpisodeStore, cfg: GraphDatasetConfig,
                 phase: str = "train"):
        self.store = store
        self.cfg = cfg
        self.noise = (
            cfg.state_noise_train if phase == "train" else cfg.state_noise_valid
        )
        self._sample = jax.jit(
            jax.vmap(
                functools.partial(
                    _sample_one, store=store, cfg=cfg, noise=self.noise
                )
            )
        )

    @property
    def num_pairs(self) -> int:
        return int(self.store.pair_list.shape[0])

    def sample(self, key: jax.Array, batch_size: int) -> GraphBatch:
        k_idx, k_batch = jax.random.split(key)
        rows = jax.random.randint(
            k_idx, (batch_size,), 0, self.store.pair_list.shape[0]
        )
        pair_rows = self.store.pair_list[rows]
        keys = jax.random.split(k_batch, batch_size)
        return self._sample(keys, pair_rows)
