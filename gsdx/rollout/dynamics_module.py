"""GNN rollout over a Gaussian scene (reference `src/render/dynamics_module.py`).

`DynamicsModule.rollout` maintains a 1000-point FPS proxy of the full splat
set, predicts sparse bone motions with the GNN each step the end-effector
moves, and skins the full Gaussian set with `interpolate_motions`. The
per-step compute (downsample -> edges -> GNN -> skinning) is one jitted
function; the python loop only sequences steps and applies the reference's
skip-when-eef-static rule (`dynamics_module.py:88-99`).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.graph.edges import construct_edges
from gsdx.kernels.fps import farthest_point_sampling, fps_rad_idx
from gsdx.rollout.skinning import interpolate_motions, relations_to_matrix


class RolloutConfig(NamedTuple):
    n_his: int = 3
    dist_thresh: float = 0.01  # skip steps with less eef motion
    max_nobj: int = 100
    fps_radius: float = 0.03
    adj_thresh: float = 0.08
    topk: int = 5
    connect_all: bool = False
    n_fps_proxy: int = 1000  # `dynamics_module.py:65`
    max_nR: int = 500


class DynamicsModule:
    """Rollout driver around a trained DynamicsPredictor."""

    def __init__(self, model_cfg: ModelConfig, params, cfg: RolloutConfig):
        self.model = DynamicsPredictor(model_cfg)
        self.params = params
        self.cfg = cfg
        self._step = jax.jit(self._make_step())

    def _make_step(self):
        cfg = self.cfg
        model = self.model

        def step(params, fps_pos_history, eef_pos_history, eef_delta,
                 all_pos, all_quat):
            """One dynamics step + skinning.

            fps_pos_history: (n_his, n_proxy, 3) proxy history.
            eef_pos_history: (n_his, n_tool, 3).
            all_pos/all_quat: full Gaussian set.
            Returns (new proxy positions, bones, new all_pos, new all_quat,
                     obj_mask).
            """
            n_proxy = fps_pos_history.shape[1]
            n_tool = eef_pos_history.shape[1]
            N = cfg.max_nobj + n_tool

            proxy = fps_pos_history[-1]
            fps1 = farthest_point_sampling(
                proxy, min(cfg.max_nobj, n_proxy), start_idx=0
            )
            down = proxy[fps1]
            idx2, keep = fps_rad_idx(
                down, cfg.fps_radius, max_samples=min(cfg.max_nobj, n_proxy)
            )
            fps_idx = fps1[idx2]
            obj_mask = keep
            keep_f = keep[:, None].astype(jnp.float32)

            # graph state: (n_his, N, 3)
            states = jnp.zeros((cfg.n_his, N, 3))
            states = states.at[:, : cfg.max_nobj].set(
                fps_pos_history[:, fps_idx] * keep_f[None]
            )
            states = states.at[:, cfg.max_nobj :].set(eef_pos_history)

            states_delta = jnp.zeros((N, 3))
            states_delta = states_delta.at[cfg.max_nobj :].set(eef_delta)

            attrs = jnp.zeros((N, 2))
            attrs = attrs.at[: cfg.max_nobj, 0].set(keep.astype(jnp.float32))
            attrs = attrs.at[cfg.max_nobj :, 1].set(1.0)

            state_mask = jnp.concatenate([keep, jnp.ones((n_tool,), bool)])
            tool_mask = jnp.concatenate(
                [jnp.zeros((cfg.max_nobj,), bool), jnp.ones((n_tool,), bool)]
            )
            p_instance = keep[:, None].astype(jnp.float32)

            Rr, Rs = construct_edges(
                states[-1], cfg.adj_thresh, state_mask, tool_mask,
                n_obj=cfg.max_nobj, topk=cfg.topk, max_nR=cfg.max_nR,
                connect_all=cfg.connect_all,
            )

            pred, _ = model.apply(
                params, states[None], attrs[None], Rr[None], Rs[None],
                p_instance[None], states_delta[None],
            )
            pred = pred[0]  # (max_nobj, 3)

            bones = states[-1, : cfg.max_nobj]
            motions = (pred - bones) * keep_f
            relations = relations_to_matrix(Rr, Rs, cfg.max_nobj)
            new_all_pos, new_all_quat, _ = interpolate_motions(
                bones, motions, relations, all_pos, quat=all_quat,
                bone_mask=keep,
            )
            return new_all_pos, new_all_quat, pred * keep_f, obj_mask

        return step

    def rollout(
        self,
        xyz_0: jnp.ndarray,  # (n_particles, 3)
        quat_0: jnp.ndarray,  # (n_particles, 4)
        eef_xyz: np.ndarray,  # (n_steps, n_tool, 3)
        n_steps: int,
        inlier_idx: Optional[np.ndarray] = None,
    ):
        """Autoregressive rollout (`dynamics_module.py:54-172`).

        Returns dict of stacked trajectories: xyz (n_steps, n_particles, 3),
        quat, xyz_bones (n_steps, max_nobj, 3), eef (n_steps, n_tool, 3).
        """
        cfg = self.cfg
        if inlier_idx is None:
            inlier_idx = np.arange(xyz_0.shape[0])
        inlier_idx = jnp.asarray(inlier_idx)

        fps_all_idx = farthest_point_sampling(
            xyz_0[inlier_idx], min(cfg.n_fps_proxy, len(inlier_idx)), start_idx=0
        )
        proxy = xyz_0[inlier_idx][fps_all_idx]
        fps_hist = jnp.tile(proxy[None], (cfg.n_his, 1, 1))
        eef_hist = jnp.tile(jnp.asarray(eef_xyz[0])[None], (cfg.n_his, 1, 1))

        all_pos, all_quat = xyz_0, quat_0
        eef_pos = np.asarray(eef_xyz[0])

        xyz_out = [np.asarray(xyz_0)]
        quat_out = [np.asarray(quat_0)]
        bones_out = [np.zeros((cfg.max_nobj, 3), np.float32)]
        eef_out = [eef_pos]

        for i in range(1, n_steps):
            delta = np.asarray(eef_xyz[i]) - eef_pos
            if np.linalg.norm(delta) < cfg.dist_thresh:
                xyz_out.append(xyz_out[-1])
                quat_out.append(quat_out[-1])
                bones_out.append(bones_out[-1])
                eef_out.append(eef_out[-1])
                continue

            all_pos, all_quat, bones, _ = self._step(
                self.params, fps_hist, eef_hist, jnp.asarray(delta),
                all_pos, all_quat,
            )
            proxy = all_pos[inlier_idx][fps_all_idx]
            fps_hist = jnp.concatenate([fps_hist[1:], proxy[None]], axis=0)
            eef_pos = np.asarray(eef_xyz[i])
            eef_hist = jnp.concatenate(
                [eef_hist[1:], jnp.asarray(eef_pos)[None]], axis=0
            )
            xyz_out.append(np.asarray(all_pos))
            quat_out.append(np.asarray(all_quat))
            bones_out.append(np.asarray(bones))
            eef_out.append(eef_pos)

        return {
            "xyz": np.stack(xyz_out),
            "quat": np.stack(quat_out),
            "xyz_bones": np.stack(bones_out),
            "eef": np.stack(eef_out),
        }


def smooth_trajectory(traj: dict) -> dict:
    """Temporal lerp between change points (`dynamics_module.py:219-236`).

    Frames where nothing moved (eef below dist_thresh) are replaced by linear
    interpolation toward the next change point, giving smooth renders.
    """
    xyz = traj["xyz"]
    moved = np.linalg.norm(np.diff(xyz, axis=0), axis=-1).sum(-1) > 0
    change = np.concatenate([[0], np.nonzero(moved)[0] + 1])
    out = {k: v.copy().astype(np.float32) for k, v in traj.items()}
    for a, b in zip(change[:-1], change[1:]):
        if b - a < 2:
            continue
        t = np.linspace(0, 1, b - a + 1, dtype=np.float32)[:-1]
        for k, v in out.items():
            shape = (len(t),) + (1,) * (v.ndim - 1)
            v[a:b] = v[a] + (v[b] - v[a]) * t.reshape(shape)
    # renormalize lerped quats
    q = out["quat"]
    out["quat"] = q / np.maximum(
        np.linalg.norm(q, axis=-1, keepdims=True), 1e-12
    )
    return out
