"""Graph neural dynamics model (interaction-network message passing).

Functional re-implementation of the reference `DynamicsPredictor`
(`src/gnn/model.py:70-246`): dense one-hot relation matrices Rr, Rs in
(B, n_rel, N) drive gather/scatter as batched matmuls — already the ideal
form for the TPU MXU at these sizes (N ~ 100-150, n_rel ~ 500-1200, nf 512).

Message passing (`model.py:212-237`): for pstep rounds,
  edge effect  = RelationPropagator([rel_encode, Rr e, Rs e])
  aggregation  = Rr^T edge_effect
  node effect  = ParticlePropagator([node_encode, agg]) + residual

Motion head output is clamped to +-100 and added to the last state
(`model.py:82,239-241`).
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax.numpy as jnp


class ModelConfig(NamedTuple):
    """Mirrors the reference model_config yaml block (`src/config/rope.yaml:12-33`)."""

    nf_particle: int = 512
    nf_relation: int = 512
    nf_effect: int = 512
    attr_dim: int = 2
    state_dim: int = 0  # 0, 1 (z-only) or 3
    action_dim: int = 3
    pstep: int = 3
    rel_attr_dim: int = 2
    rel_group_dim: int = 1
    rel_distance_dim: int = 3
    motion_dim: int = 0  # 0 or 3 (cloth/sloth use 3)
    n_his: int = 3
    motion_clamp: float = 100.0


class Encoder(nn.Module):
    """3-layer MLP with ReLU after every layer (`src/gnn/model.py:6-23`)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.relu(nn.Dense(self.out)(x))


class Propagator(nn.Module):
    """Linear + residual + ReLU (`src/gnn/model.py:26-47`)."""

    out: int

    @nn.compact
    def __call__(self, x, res=None):
        x = nn.Dense(self.out)(x)
        if res is not None:
            x = x + res
        return nn.relu(x)


class ParticlePredictor(nn.Module):
    """lin-relu-lin-relu-lin motion head (`src/gnn/model.py:50-67`)."""

    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return nn.Dense(self.out)(x)


class DynamicsPredictor(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, state, attrs, Rr, Rs, p_instance, action=None):
        """Predict next particle positions.

        Args (matching `src/gnn/model.py:112-131`):
          state: (B, n_his, N, 3) particle position history (obj + tool slots).
          attrs: (B, N, attr_dim) one-hot particle type.
          Rr, Rs: (B, n_rel, N) one-hot receiver/sender matrices.
          p_instance: (B, n_p, n_instance) instance assignment of object slots.
          action: (B, N, action_dim) per-particle action (tool motion delta).

        Returns (pred_pos (B, n_p, 3), pred_motion (B, n_p, 3)).
        """
        cfg = self.cfg
        B, n_his, N, state_dim = state.shape
        n_p = p_instance.shape[1]
        n_instance = p_instance.shape[2]
        n_s = N - n_p

        Rr_t = jnp.swapaxes(Rr, 1, 2)  # (B, N, n_rel)

        # (B, N, n_his * state_dim), history-major like torch transpose+view
        state_t = jnp.swapaxes(state, 1, 2).reshape(B, N, n_his * state_dim)

        p_inputs = attrs
        if cfg.state_dim == 3:
            p_inputs = jnp.concatenate([p_inputs, state_t], axis=2)
        elif cfg.state_dim == 1:  # z-only (cloth, `model.py:140-145`)
            state_z = state_t.reshape(B, N, n_his, state_dim)[..., 2]
            p_inputs = jnp.concatenate([attrs, state_z], axis=2)

        if cfg.motion_dim > 0:
            s = state_t.reshape(B, N, n_his, state_dim)
            motion = (s[:, :, 1:] - s[:, :, :-1]).reshape(B, N, (n_his - 1) * 3)
            p_inputs = jnp.concatenate([p_inputs, motion], axis=2)

        if cfg.action_dim > 0:
            p_inputs = jnp.concatenate([p_inputs, action], axis=2)

        rel_parts = []
        if cfg.rel_attr_dim > 0:
            rel_parts += [Rr @ attrs, Rs @ attrs]
        if cfg.rel_group_dim > 0:
            g = jnp.concatenate(
                [p_instance, jnp.zeros((B, n_s, n_instance), p_instance.dtype)],
                axis=1,
            )
            group_diff = jnp.sum(
                jnp.abs(Rr @ g - Rs @ g), axis=2, keepdims=True
            )
            rel_parts.append(group_diff)
        if cfg.rel_distance_dim > 0:
            rel_parts.append(Rr @ state_t - Rs @ state_t)
        rel_inputs = jnp.concatenate(rel_parts, axis=2)

        particle_encode = Encoder(cfg.nf_particle, cfg.nf_effect,
                                  name="particle_encoder")(p_inputs)
        relation_encode = Encoder(cfg.nf_relation, cfg.nf_effect,
                                  name="relation_encoder")(rel_inputs)

        relation_prop = Propagator(cfg.nf_effect, name="relation_propagator")
        particle_prop = Propagator(cfg.nf_effect, name="particle_propagator")

        effect = particle_encode
        for _ in range(cfg.pstep):
            effect_r = Rr @ effect
            effect_s = Rs @ effect
            effect_rel = relation_prop(
                jnp.concatenate([relation_encode, effect_r, effect_s], axis=2)
            )
            agg = Rr_t @ effect_rel
            effect = particle_prop(
                jnp.concatenate([particle_encode, agg], axis=2), res=effect
            )

        pred_motion = ParticlePredictor(
            cfg.nf_effect, 3, name="non_rigid_predictor"
        )(effect[:, :n_p])
        pred_pos = state[:, -1, :n_p] + jnp.clip(
            pred_motion, -cfg.motion_clamp, cfg.motion_clamp
        )
        return pred_pos, pred_motion
