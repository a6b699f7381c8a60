"""Batched GNN rollout for MPPI (reference `dynamics`, `src/real_world/plan.py:25-154`).

Evaluates n_sample push candidates in one batch: each action decodes into a
pusher start plus up to MAX_REPEAT unit pushes; the graph (radius edges) is
rebuilt every unit push; each sample's prediction freezes at its own repeat
count. The reference's dynamic `action_repeat.max()` python loop becomes a
fixed-bound `lax.fori_loop` with per-sample masks — the whole evaluation is
one XLA program, and the batch axis is the natural multi-chip sharding axis
(SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.graph.edges import construct_edges_batch
from gsdx.plan.actions import decode_action


class RolloutSpec(NamedTuple):
    n_his: int = 3
    max_nobj: int = 100
    max_nR: int = 500
    topk: int = 5
    adj_thresh: float = 0.08
    push_length: float = 0.01
    max_repeat: int = 20  # static bound on action length (upper_lim[3])
    connect_all: bool = False


def make_batched_rollout(model: DynamicsPredictor, spec: RolloutSpec):
    """Returns rollout(params, state (n_obj, 3), act_seqs (B, L, 4)) ->
    {"state_seqs": (B, L, n_obj, 3), "action_seqs": decoded}."""

    def rollout(params, state, act_seqs):
        B, L, _ = act_seqs.shape
        n_obj = state.shape[0]
        N = n_obj + 1  # single tool particle
        decoded, repeats = decode_action(act_seqs, spec.push_length)

        state_mask = jnp.ones((B, N), bool)
        tool_mask = jnp.zeros((B, N), bool).at[:, n_obj:].set(True)
        attrs = jnp.zeros((B, N, 2))
        attrs = attrs.at[:, :n_obj, 0].set(1.0).at[:, n_obj:, 1].set(1.0)
        p_instance = jnp.ones((B, n_obj, 1))

        obj_kp = jnp.tile(state[None, None], (B, spec.n_his, 1, 1))
        pred_seq = jnp.zeros((B, L, n_obj, 3))

        for li in range(L):  # static look-ahead unroll (L == 1 in practice)
            if li > 0:
                obj_kp = jnp.tile(
                    pred_seq[:, li - 1 : li], (1, spec.n_his, 1, 1)
                )
            # pusher spawns at the action (x, y) with z at the object's
            # minimum height (`plan.py:48-56`)
            z = jnp.min(obj_kp[:, -1, :, 2], axis=1)
            eef = jnp.stack(
                [decoded[:, li, 0], decoded[:, li, 1], z], axis=-1
            )[:, None]  # (B, 1, 3)
            delta = jnp.stack(
                [
                    decoded[:, li, 2] - decoded[:, li, 0],
                    decoded[:, li, 3] - decoded[:, li, 1],
                    jnp.zeros((B,)),
                ],
                axis=-1,
            )[:, None]  # (B, 1, 3)

            states = jnp.concatenate(
                [obj_kp, jnp.tile(eef[:, None], (1, spec.n_his, 1, 1))], axis=2
            )  # (B, n_his, N, 3)
            action = jnp.concatenate([jnp.zeros((B, n_obj, 3)), delta], axis=1)

            def push_step(ai, carry):
                states, pred_li = carry
                Rr, Rs = construct_edges_batch(
                    states[:, -1], spec.adj_thresh, state_mask, tool_mask,
                    n_obj=n_obj, topk=spec.topk, max_nR=spec.max_nR,
                    connect_all=spec.connect_all,
                )
                pred, _ = model.apply(
                    params, states, attrs, Rr, Rs, p_instance, action
                )  # (B, n_obj, 3)
                # freeze each sample's output at its own repeat count
                freeze = (repeats[:, li] == ai)[:, None, None]
                pred_li = jnp.where(freeze, pred, pred_li)

                z_cur = jnp.min(pred[:, :, 2], axis=1)
                eef_cur = states[:, -1, n_obj:] + action[:, n_obj:]
                eef_cur = eef_cur.at[:, 0, 2].set(z_cur)
                states_cur = jnp.concatenate([pred, eef_cur], axis=1)
                states = jnp.concatenate(
                    [states[:, 1:], states_cur[:, None]], axis=1
                )
                return states, pred_li

            max_rep = jnp.max(repeats[:, li])
            _, pred_li = jax.lax.fori_loop(
                1,
                jnp.minimum(max_rep, spec.max_repeat) + 1,
                push_step,
                (states, pred_seq[:, li]),
            )
            pred_seq = pred_seq.at[:, li].set(pred_li)

        return {"state_seqs": pred_seq, "action_seqs": decoded}

    return rollout
