"""Batched GNN rollout for MPPI (reference `dynamics`, `src/real_world/plan.py:25-154`).

Evaluates n_sample push candidates in one batch: each action decodes into a
pusher start plus up to MAX_REPEAT unit pushes; the graph (radius edges) is
rebuilt every unit push; each sample's prediction freezes at its own repeat
count. The reference's dynamic `action_repeat.max()` python loop becomes a
fixed-bound `lax.fori_loop` with per-sample masks — the whole evaluation is
one XLA program, and the batch axis is the natural multi-chip sharding axis
(SURVEY.md §2.8).

Repeat-sorted chunking (`sort_chunks`): the reference (and the naive batch
form) runs every sample to the BATCH max repeat, so a sample with
repeats=5 wastes 15 discarded GNN evaluations. Samples are instead sorted
by repeat count (descending — an exact permutation: every per-sample
computation in the batched matmuls is independent, and rewards/softmax/
argmax downstream are permutation-invariant) and processed in static-size
chunks whose fori trip count is the CHUNK max; outputs are scattered back
in original order. With uniform repeats in [5, 20] and 8 chunks this skips
~33% of all push-step work. The result is mathematically identical to the
unchunked form up to batched-gemm accumulation order (batch-shape-dependent
f32 summation plus adjacency top-k tie flips — NOT bitwise reproducible
across `sort_chunks` settings; see test_chunked_rollout_matches_plain).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.graph.edges import construct_edge_indices_batch, construct_edges_batch
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
    # process samples in this many repeat-sorted chunks (1 disables); each
    # chunk's push loop runs only to the chunk's own max repeat (an exact
    # sample permutation, modulo batched-gemm accumulation order).
    sort_chunks: int = 8
    # fused Pallas GNN forward (gsdx/kernels/gnn_forward.py): "auto" uses it
    # on TPU for the supported model family, "on"/"off" force, "interpret"
    # runs the kernel in interpreter mode (CPU testing), "twin" runs the
    # kernel's plain-XLA twin (identical math/graph — isolates kernel-vs-XLA
    # execution in parity checks). The fused path's matmul numerics are the
    # XLA-default class (bf16 one-pass, f32 accumulation); the restructured
    # grouping rounds at different points than model.apply, so chained-push
    # trajectories deviate at the bf16 class level; see the kernel docstring.
    fused: str = "auto"


def _fused_supported(cfg) -> bool:
    # rope (state 0/motion 0) and cloth/dog/sloth (z-state 1/motion 3 —
    # folded into the kernel's node-state matmul, see gnn_forward docstring)
    return ((cfg.state_dim, cfg.motion_dim) in ((0, 0), (1, 3))
            and cfg.attr_dim == 2
            and cfg.rel_group_dim == 1 and cfg.rel_attr_dim == 2
            and cfg.rel_distance_dim == 3 and cfg.action_dim == 3
            and cfg.nf_particle == cfg.nf_relation == cfg.nf_effect == 512)


def make_batched_rollout(model: DynamicsPredictor, spec: RolloutSpec):
    """Returns rollout(params, state (n_obj, 3), act_seqs (B, L, 4), *,
    needs_grad=False) -> {"state_seqs": (B, L, n_obj, 3), "action_seqs":
    decoded}. Pass ``needs_grad=True`` when the caller will differentiate
    through the rollout (the GD planner does): `pl.pallas_call` has no VJP,
    so the fused Pallas forward must be disabled on the reverse-mode path
    regardless of `spec.fused` (matches reference GD planning through the
    torch graph, `src/real_world/utils/planner.py:278-310`)."""
    def use_fused(needs_grad: bool = False) -> bool:
        if needs_grad or spec.fused == "off":
            return False
        if not (_fused_supported(model.cfg) and spec.max_nobj + 1 <= 256):
            return False
        return (spec.fused in ("on", "interpret", "twin")
                or jax.default_backend() == "tpu")

    def roll_block(params, state, decoded, repeats, needs_grad=False):
        """Per-sample-independent rollout of one (Bc, L, 4) action block."""
        Bc, L = decoded.shape[0], decoded.shape[1]
        n_obj = state.shape[0]
        N = n_obj + 1  # single tool particle
        state_mask = jnp.ones((Bc, N), bool)
        tool_mask = jnp.zeros((Bc, N), bool).at[:, n_obj:].set(True)
        attrs = jnp.zeros((Bc, N, 2))
        attrs = attrs.at[:, :n_obj, 0].set(1.0).at[:, n_obj:, 1].set(1.0)
        p_instance = jnp.ones((Bc, n_obj, 1))

        fused = use_fused(needs_grad)
        if fused:
            from gsdx.kernels.gnn_forward import (fused_gnn_forward,
                                                  gnn_forward_xla_twin,
                                                  pack_gnn_params)

            packed = pack_gnn_params(params, n_his=spec.n_his)
            e_pad = -(-spec.max_nR // 8) * 8
            n_pad = 128 if N <= 128 else 256
            attrs_pad = jnp.zeros((Bc, n_pad, 2))
            attrs_pad = (attrs_pad.at[:, :n_obj, 0].set(1.0)
                         .at[:, n_obj:N, 1].set(1.0))
            g_pad = jnp.zeros((Bc, n_pad, 1)).at[:, :n_obj, 0].set(1.0)

        obj_kp = jnp.tile(state[None, None], (Bc, spec.n_his, 1, 1))
        pred_seq = jnp.zeros((Bc, L, n_obj, 3))

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
            )[:, None]  # (Bc, 1, 3)
            delta = jnp.stack(
                [
                    decoded[:, li, 2] - decoded[:, li, 0],
                    decoded[:, li, 3] - decoded[:, li, 1],
                    jnp.zeros((Bc,)),
                ],
                axis=-1,
            )[:, None]  # (Bc, 1, 3)

            states = jnp.concatenate(
                [obj_kp, jnp.tile(eef[:, None], (1, spec.n_his, 1, 1))], axis=2
            )  # (Bc, n_his, N, 3)
            action = jnp.concatenate([jnp.zeros((Bc, n_obj, 3)), delta], axis=1)

            if fused:
                action_pad = jnp.zeros((Bc, n_pad, 3))
                action_pad = action_pad.at[:, n_obj:N].set(delta)

            def gnn_fused(states):
                recv, send = construct_edge_indices_batch(
                    states[:, -1], spec.adj_thresh, state_mask, tool_mask,
                    n_obj=n_obj, topk=spec.topk, max_nR=spec.max_nR,
                    connect_all=spec.connect_all,
                )
                if e_pad > spec.max_nR:
                    fill = jnp.full((Bc, e_pad - spec.max_nR), -1, jnp.int32)
                    recv = jnp.concatenate([recv, fill], axis=1)
                    send = jnp.concatenate([send, fill], axis=1)
                st_t = jnp.swapaxes(states, 1, 2).reshape(
                    Bc, N, spec.n_his * 3)
                st_pad = jnp.zeros((Bc, n_pad, spec.n_his * 3))
                st_pad = st_pad.at[:, :N].set(st_t)
                if spec.fused == "twin":
                    motion = gnn_forward_xla_twin(
                        packed, attrs_pad, action_pad, st_pad, g_pad, recv,
                        send, pstep=model.cfg.pstep)[:, :n_obj, :3]
                else:
                    motion = fused_gnn_forward(
                        packed, attrs_pad, action_pad, st_pad, g_pad, recv,
                        send, pstep=model.cfg.pstep,
                        interpret=spec.fused == "interpret",
                    )[:, :n_obj, :3]
                return states[:, -1, :n_obj] + jnp.clip(
                    motion, -model.cfg.motion_clamp, model.cfg.motion_clamp)

            def push_step(ai, carry):
                states, pred_li = carry
                if fused:
                    pred = gnn_fused(states)
                else:
                    Rr, Rs = construct_edges_batch(
                        states[:, -1], spec.adj_thresh, state_mask, tool_mask,
                        n_obj=n_obj, topk=spec.topk, max_nR=spec.max_nR,
                        connect_all=spec.connect_all,
                    )
                    pred, _ = model.apply(
                        params, states, attrs, Rr, Rs, p_instance, action
                    )  # (Bc, n_obj, 3)
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

            if needs_grad:
                # reverse-mode needs a static trip count (dynamic-stop
                # fori_loop has no transpose): run to the spec bound —
                # iterations past a sample's own repeat never match its
                # freeze mask, so the result is identical, just un-skipped.
                upper = spec.max_repeat + 1
            else:
                max_rep = jnp.max(repeats[:, li])
                upper = jnp.minimum(max_rep, spec.max_repeat) + 1
            _, pred_li = jax.lax.fori_loop(
                1, upper, push_step, (states, pred_seq[:, li]),
            )
            pred_seq = pred_seq.at[:, li].set(pred_li)

        return pred_seq

    def rollout(params, state, act_seqs, *, needs_grad: bool = False):
        B = act_seqs.shape[0]
        decoded, repeats = decode_action(act_seqs, spec.push_length)
        nc = spec.sort_chunks
        if nc > 1 and B % nc == 0 and B >= 2 * nc:
            # total repeats across the look-ahead decide a sample's cost
            order = jnp.argsort(-jnp.sum(repeats, axis=1))
            inv = jnp.argsort(order)
            dec_s, rep_s = decoded[order], repeats[order]
            chunk = B // nc
            preds = [
                roll_block(params, state,
                           jax.lax.dynamic_slice_in_dim(dec_s, c * chunk, chunk),
                           jax.lax.dynamic_slice_in_dim(rep_s, c * chunk, chunk),
                           needs_grad=needs_grad)
                for c in range(nc)
            ]
            pred_seq = jnp.concatenate(preds, axis=0)[inv]
        else:
            pred_seq = roll_block(params, state, decoded, repeats,
                                  needs_grad=needs_grad)
        return {"state_seqs": pred_seq, "action_seqs": decoded}

    return rollout
