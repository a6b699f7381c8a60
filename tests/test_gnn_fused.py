"""Fused Pallas GNN forward: parity vs the flax model and edge-index form.

The fused kernel (gsdx/kernels/gnn_forward.py) runs the full
DynamicsPredictor forward per sample in VMEM with in-kernel one-hot
reconstruction from edge indices. On CPU the kernel runs in interpreter
mode (true f32 dots), so it must match `model.apply` (also true f32 on CPU)
to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.graph.edges import (construct_edge_indices_batch,
                              construct_edges_batch)
from gsdx.kernels.gnn_forward import (N_PAD, fused_gnn_forward,
                                      gnn_forward_xla_twin, pack_gnn_params)

N_OBJ, N, E = 30, 31, 160  # rope-family layout at reduced node count
CFG = ModelConfig(n_his=3)  # nf 512, state_dim 0, motion_dim 0


@pytest.fixture(scope="module")
def setup():
    model = DynamicsPredictor(CFG)
    rng = np.random.default_rng(0)
    B = 3
    states = jnp.asarray(
        rng.normal(0, 0.05, (B, CFG.n_his, N, 3)).astype(np.float32))
    attrs = jnp.zeros((B, N, 2)).at[:, :N_OBJ, 0].set(1.0).at[:, N_OBJ:, 1].set(1.0)
    action = jnp.asarray(
        rng.normal(0, 0.01, (B, N, 3)).astype(np.float32))
    p_instance = jnp.ones((B, N_OBJ, 1))
    mask = jnp.ones((B, N), bool)
    tool_mask = jnp.zeros((B, N), bool).at[:, N_OBJ:].set(True)
    Rr, Rs = construct_edges_batch(states[:, -1], 0.1, mask, tool_mask,
                                   n_obj=N_OBJ, topk=4, max_nR=E)
    params = model.init(jax.random.PRNGKey(0), states, attrs, Rr, Rs,
                        p_instance, action)
    return model, params, states, attrs, action, p_instance, mask, tool_mask, Rr, Rs


def _padded_inputs(states, attrs, action, Rr, Rs, mask, tool_mask):
    B = states.shape[0]
    recv, send = construct_edge_indices_batch(
        states[:, -1], 0.1, mask, tool_mask, n_obj=N_OBJ, topk=4, max_nR=E)
    # index form reproduces the one-hots exactly
    oh_r = jax.nn.one_hot(recv, N, dtype=jnp.float32) * (recv >= 0)[..., None]
    np.testing.assert_array_equal(np.asarray(oh_r), np.asarray(Rr))
    st_t = jnp.swapaxes(states, 1, 2).reshape(B, N, -1)
    pad_n = lambda x: jnp.zeros((B, N_PAD) + x.shape[2:]).at[:, :N].set(x)  # noqa: E731
    g = jnp.zeros((B, N, 1)).at[:, :N_OBJ].set(1.0)
    return (pad_n(attrs), pad_n(action), pad_n(st_t), pad_n(g), recv, send)


def test_twin_matches_model(setup):
    model, params, states, attrs, action, p_instance, mask, tool_mask, Rr, Rs = setup
    pred, motion = model.apply(params, states, attrs, Rr, Rs, p_instance,
                               action)
    ins = _padded_inputs(states, attrs, action, Rr, Rs, mask, tool_mask)
    # f32 pack: exact math parity (the restructured forward is the same
    # function as model.apply)
    packed32 = pack_gnn_params(params, n_his=CFG.n_his, dtype=jnp.float32)
    raw = gnn_forward_xla_twin(packed32, *ins, pstep=CFG.pstep)
    np.testing.assert_allclose(np.asarray(raw[:, :N_OBJ, :3]),
                               np.asarray(motion), atol=1e-5, rtol=0)
    # bf16 pack (production): deviation bounded by bf16 weight rounding.
    # On CPU model.apply is true f32; on TPU XLA's DEFAULT matmul applies
    # the same bf16 truncation per-op, so this bound is CPU-only slack.
    packed = pack_gnn_params(params, n_his=CFG.n_his)
    raw16 = gnn_forward_xla_twin(packed, *ins, pstep=CFG.pstep)
    np.testing.assert_allclose(np.asarray(raw16[:, :N_OBJ, :3]),
                               np.asarray(motion), atol=5e-2, rtol=0)


def test_fused_kernel_matches_twin(setup):
    model, params, states, attrs, action, p_instance, mask, tool_mask, Rr, Rs = setup
    packed = pack_gnn_params(params, n_his=CFG.n_his)
    ins = _padded_inputs(states, attrs, action, Rr, Rs, mask, tool_mask)
    twin = gnn_forward_xla_twin(packed, *ins, pstep=CFG.pstep)
    fused = fused_gnn_forward(packed, *ins, pstep=CFG.pstep, interpret=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(twin),
                               atol=1e-4, rtol=0)


def test_fused_rollout_matches_plain_cloth_family(rng):
    """Cloth/dog/sloth layout (state_dim=1 z-history + motion_dim=3 history
    differences, connect_all): the folded node-state matmul must reproduce
    the flax forward. Also exercises the 256-node pad (n_obj > 127)."""
    from gsdx.dynamics.train import TrainConfig, init_params
    from gsdx.graph.dataset import GraphDatasetConfig
    from gsdx.plan.dynamics_rollout import RolloutSpec, make_batched_rollout

    n_obj, max_nR = 130, 1040  # n_obj + 1 = 131 -> n_pad 256
    cfg = ModelConfig(n_his=3, state_dim=1, motion_dim=3)
    model = DynamicsPredictor(cfg)
    data_cfg = GraphDatasetConfig(n_his=3, max_nobj=n_obj, max_nR=max_nR,
                                  topk=4)
    params = init_params(model, TrainConfig(n_his=3), data_cfg,
                         jax.random.PRNGKey(0))
    # single push: an UNTRAINED 512-wide net amplifies the one extra bf16
    # re-round of the folded w1p_st by ~100x per chained push (measured
    # 1.6e-3 -> 0.17 at 2 pushes), so multi-push parity is only meaningful
    # statistically; chained-push parity is pinned by the rope variant below
    base = dict(n_his=3, max_nobj=n_obj, max_nR=max_nR, topk=4,
                adj_thresh=0.1, max_repeat=1, sort_chunks=1, connect_all=True)
    roll_plain = jax.jit(make_batched_rollout(
        model, RolloutSpec(**base, fused="off")))
    roll_fused = jax.jit(make_batched_rollout(
        model, RolloutSpec(**base, fused="interpret")))
    state = jnp.asarray(
        rng.normal(scale=0.05, size=(n_obj, 3)).astype(np.float32))
    acts = jnp.asarray(np.concatenate([
        rng.uniform(-0.2, 0.2, size=(2, 1, 2)),
        rng.uniform(-np.pi, np.pi, size=(2, 1, 1)),
        np.full((2, 1, 1), 1.2),
    ], axis=-1).astype(np.float32))
    params_bf = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16).astype(jnp.float32), params)
    a = roll_plain(params_bf, state, acts)["state_seqs"]
    b = roll_fused(params, state, acts)["state_seqs"]
    # w1p_st folds bf16-rounded W_z/W_motion rows into one matrix; the
    # difference rows re-round once more vs the two-matmul flax form
    # (untrained-net outputs are O(10), hence the rtol term)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                               rtol=2e-3)


def test_fused_rollout_matches_plain(setup, rng):
    """End-to-end: make_batched_rollout fused="interpret" vs fused="off"."""
    from gsdx.dynamics.train import TrainConfig, init_params
    from gsdx.graph.dataset import GraphDatasetConfig
    from gsdx.plan.dynamics_rollout import RolloutSpec, make_batched_rollout

    model = DynamicsPredictor(CFG)
    data_cfg = GraphDatasetConfig(n_his=3, max_nobj=N_OBJ, max_nR=E, topk=4)
    params = init_params(model, TrainConfig(n_his=3), data_cfg,
                         jax.random.PRNGKey(0))
    base = dict(n_his=3, max_nobj=N_OBJ, max_nR=E, topk=4, adj_thresh=0.1,
                max_repeat=4, sort_chunks=1)
    roll_plain = jax.jit(make_batched_rollout(
        model, RolloutSpec(**base, fused="off")))
    roll_fused = jax.jit(make_batched_rollout(
        model, RolloutSpec(**base, fused="interpret")))
    state = jnp.asarray(
        rng.normal(scale=0.05, size=(N_OBJ, 3)).astype(np.float32))
    acts = jnp.asarray(np.concatenate([
        rng.uniform(-0.2, 0.2, size=(4, 1, 2)),
        rng.uniform(-np.pi, np.pi, size=(4, 1, 1)),
        rng.uniform(2, 4, size=(4, 1, 1)),
    ], axis=-1).astype(np.float32))
    # pre-round the plain path's weights to bf16-and-back so both paths see
    # identical weight values (the fused path stores weights bf16; on CPU
    # the plain path would otherwise run true-f32 weights)
    params_bf = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16).astype(jnp.float32), params)
    a = roll_plain(params_bf, state, acts)["state_seqs"]
    b = roll_fused(params, state, acts)["state_seqs"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3,
                               rtol=0)
