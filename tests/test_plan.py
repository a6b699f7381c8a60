"""MPPI planner: mechanics + convergence on an analytic toy pushing problem."""

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.dynamics.train import TrainConfig, init_params
from gsdx.graph.dataset import GraphDatasetConfig
from gsdx.plan.actions import angle_normalize, clip_actions, decode_action
from gsdx.plan.cost import running_cost
from gsdx.plan.dynamics_rollout import RolloutSpec, make_batched_rollout
from gsdx.plan.planner import MPPIConfig, Planner


def test_decode_action():
    act = jnp.array([[[0.1, 0.2, 0.0, 7.6]]])
    decoded, repeats = decode_action(act, push_length=0.01)
    np.testing.assert_allclose(
        np.asarray(decoded)[0, 0], [0.1, 0.2, 0.09, 0.2], atol=1e-6)
    assert int(repeats[0, 0]) == 7


def test_angle_normalize():
    x = jnp.array([0.0, np.pi + 0.1, -np.pi - 0.1, 4 * np.pi])
    out = np.asarray(angle_normalize(x))
    assert (np.abs(out) <= np.pi + 1e-6).all()
    np.testing.assert_allclose(out[1], -np.pi + 0.1, atol=1e-5)


def test_mppi_on_toy_pushing(rng):
    """Toy dynamics: the object (point cluster) translates by the full push
    vector iff the pusher starts within 0.15 of the cluster. MPPI must find
    an action pushing the cluster toward the target."""
    cluster = jnp.asarray(
        rng.normal(scale=0.03, size=(20, 3)).astype(np.float32))
    target = cluster + jnp.array([0.12, -0.06, 0.0])

    push_length = 0.01

    def toy_rollout(state_cur, act_seqs):
        decoded, repeats = decode_action(act_seqs, push_length)
        start = decoded[:, :, :2]  # (B, L, 2)
        d = jnp.linalg.norm(
            start[:, :, None] - state_cur[None, None, :, :2], axis=-1
        ).min(-1)  # (B, L)
        near = (d < 0.15).astype(jnp.float32)[..., None]
        unit = jnp.stack(
            [decoded[:, :, 2] - decoded[:, :, 0],
             decoded[:, :, 3] - decoded[:, :, 1],
             jnp.zeros_like(decoded[:, :, 0])], axis=-1)
        move = unit * repeats[..., None].astype(jnp.float32) * near
        state_seqs = state_cur[None, None] + move[:, :, None, :]
        return {"state_seqs": state_seqs, "action_seqs": decoded}

    bbox = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])

    def evaluate(state_seqs, action_seqs, state_cur):
        return running_cost(state_seqs, action_seqs, state_cur, target, bbox)

    cfg = MPPIConfig(n_sample=200, n_update_iter=5, noise_level=0.3,
                     action_lower_lim=(-0.4, -0.4, -np.pi, 5.0),
                     action_upper_lim=(0.4, 0.4, np.pi, 20.0))
    planner = Planner(cfg, toy_rollout, evaluate)
    init = jnp.zeros((1, 4)).at[0, 3].set(10.0)
    res = planner.trajectory_optimization(
        jax.random.PRNGKey(0), cluster, init)

    # chamfer before any action:
    pre_reward = float(evaluate(
        cluster[None, None], jnp.zeros((1, 1, 4)), cluster)["reward_seqs"][0])
    assert float(res["best_reward"]) > pre_reward + 0.03, (
        f"planner did not improve: {pre_reward} -> {float(res['best_reward'])}")

    # executing the planned action should reduce chamfer distance
    out = toy_rollout(cluster, res["act_seq"][None])
    final = out["state_seqs"][0, -1]
    d_before = np.linalg.norm(np.asarray(cluster - target), axis=-1).mean()
    d_after = np.linalg.norm(np.asarray(final - target), axis=-1).mean()
    assert d_after < 0.5 * d_before


def test_batched_gnn_rollout_shapes(rng):
    model_cfg = ModelConfig(nf_particle=32, nf_relation=32, nf_effect=32, n_his=2)
    data_cfg = GraphDatasetConfig(n_his=2, max_nobj=12, max_nR=64, topk=3)
    model = DynamicsPredictor(model_cfg)
    params = init_params(model, TrainConfig(n_his=2), data_cfg,
                         jax.random.PRNGKey(0))
    spec = RolloutSpec(n_his=2, max_nobj=12, max_nR=64, topk=3,
                       adj_thresh=0.3, max_repeat=6)
    rollout = jax.jit(make_batched_rollout(model, spec))
    state = jnp.asarray(rng.normal(scale=0.05, size=(12, 3)).astype(np.float32))
    acts = jnp.asarray(
        np.concatenate([
            rng.uniform(-0.2, 0.2, size=(4, 1, 2)),
            rng.uniform(-np.pi, np.pi, size=(4, 1, 1)),
            rng.uniform(5, 6, size=(4, 1, 1)),
        ], axis=-1).astype(np.float32))
    out = rollout(params, state, acts)
    assert out["state_seqs"].shape == (4, 1, 12, 3)
    assert np.isfinite(np.asarray(out["state_seqs"])).all()


def test_gd_planner_on_toy(rng):
    cluster = jnp.asarray(rng.normal(scale=0.03, size=(16, 3)).astype(np.float32))
    target = cluster + jnp.array([0.1, 0.0, 0.0])
    push_length = 0.01

    def toy_rollout(state_cur, act_seqs):
        decoded, repeats = decode_action(act_seqs, push_length)
        start = decoded[:, :, :2]
        d = jnp.linalg.norm(
            start[:, :, None] - state_cur[None, None, :, :2], axis=-1).min(-1)
        near = jax.nn.sigmoid((0.15 - d) * 50.0)[..., None]  # smooth for GD
        unit = jnp.stack(
            [decoded[:, :, 2] - decoded[:, :, 0],
             decoded[:, :, 3] - decoded[:, :, 1],
             jnp.zeros_like(decoded[:, :, 0])], axis=-1)
        move = unit * act_seqs[..., 3:4] * near
        state_seqs = state_cur[None, None] + move[:, :, None, :]
        return {"state_seqs": state_seqs, "action_seqs": decoded}

    bbox = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])

    def evaluate(state_seqs, action_seqs, state_cur):
        return running_cost(state_seqs, action_seqs, state_cur, target, bbox)

    from gsdx.plan.planner import MPPIConfig, Planner
    cfg = MPPIConfig(n_sample=64, n_update_iter=8, planner_type="GD", lr=0.02,
                     action_lower_lim=(-0.4, -0.4, -np.pi, 5.0),
                     action_upper_lim=(0.4, 0.4, np.pi, 20.0))
    planner = Planner(cfg, toy_rollout, evaluate)
    init = jnp.zeros((1, 4)).at[0, 3].set(10.0)
    res = planner.trajectory_optimization(jax.random.PRNGKey(3), cluster, init)
    pre = float(evaluate(cluster[None, None], jnp.zeros((1, 1, 4)),
                         cluster)["reward_seqs"][0])
    assert float(res["best_reward"]) > pre


def test_gd_planner_sample_chunking(rng):
    """gd_sample_chunk splits the GD batch for memory (1000x19-push BPTT is
    ~40 GB at rope scale); samples decouple in the mean-reward objective and
    Adam is elementwise + scale-normalized, so chunked optimization lands at
    the same optimum (the only difference is the 1/B vs 1/chunk grad scale,
    which Adam's m/sqrt(v) normalization absorbs)."""
    cluster = jnp.asarray(rng.normal(scale=0.03, size=(16, 3)).astype(np.float32))
    target = cluster + jnp.array([0.1, 0.0, 0.0])

    def toy_rollout(state_cur, act_seqs):
        decoded, repeats = decode_action(act_seqs, 0.01)
        start = decoded[:, :, :2]
        d = jnp.linalg.norm(
            start[:, :, None] - state_cur[None, None, :, :2], axis=-1).min(-1)
        near = jax.nn.sigmoid((0.15 - d) * 50.0)[..., None]
        unit = jnp.stack(
            [decoded[:, :, 2] - decoded[:, :, 0],
             decoded[:, :, 3] - decoded[:, :, 1],
             jnp.zeros_like(decoded[:, :, 0])], axis=-1)
        move = unit * act_seqs[..., 3:4] * near
        state_seqs = state_cur[None, None] + move[:, :, None, :]
        return {"state_seqs": state_seqs, "action_seqs": decoded}

    bbox = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])

    def evaluate(state_seqs, action_seqs, state_cur):
        return running_cost(state_seqs, action_seqs, state_cur, target, bbox)

    from gsdx.plan.planner import MPPIConfig, Planner
    base = dict(n_sample=32, n_update_iter=6, planner_type="GD", lr=0.02,
                action_lower_lim=(-0.4, -0.4, -np.pi, 5.0),
                action_upper_lim=(0.4, 0.4, np.pi, 20.0))
    init = jnp.zeros((1, 4)).at[0, 3].set(10.0)
    res_full = Planner(MPPIConfig(**base), toy_rollout, evaluate
                       ).trajectory_optimization(
        jax.random.PRNGKey(3), cluster, init)
    res_chunk = Planner(MPPIConfig(**base, gd_sample_chunk=8), toy_rollout,
                        evaluate).trajectory_optimization(
        jax.random.PRNGKey(3), cluster, init)
    np.testing.assert_allclose(float(res_chunk["best_reward"]),
                               float(res_full["best_reward"]), rtol=0.05)


def test_gd_planner_through_gnn_fused_rollout(rng):
    """GD planning differentiates through the batched GNN rollout; the fused
    Pallas forward has no VJP (`pl.pallas_call` cannot be linearized), so the
    planner must request the grad-safe path (`needs_grad=True`), which forces
    the plain XLA forward regardless of `spec.fused`. Pre-fix this crashed
    with "Linearization failed" whenever fused was active (TPU auto, or
    "interpret" as here)."""
    model = DynamicsPredictor(ModelConfig(n_his=2))  # nf 512: fused-supported
    n_obj, max_nR = 12, 64
    data_cfg = GraphDatasetConfig(n_his=2, max_nobj=n_obj, max_nR=max_nR,
                                  topk=3)
    params = init_params(model, TrainConfig(n_his=2), data_cfg,
                         jax.random.PRNGKey(0))
    spec = RolloutSpec(n_his=2, max_nobj=n_obj, max_nR=max_nR, topk=3,
                       adj_thresh=0.3, max_repeat=2, sort_chunks=1,
                       fused="interpret")
    rollout = make_batched_rollout(model, spec)
    state = jnp.asarray(rng.normal(scale=0.05, size=(n_obj, 3)).astype(np.float32))

    # end-to-end: the GD planner threads needs_grad through the closure and
    # reverse-mode through the grad-safe rollout works (a separate direct
    # jax.grad preamble was dropped — it compiled a second full interpret-
    # mode graph for coverage the planner path already provides)
    target = state + jnp.array([0.1, 0.0, 0.0])
    bbox = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])

    def model_rollout(state_cur, act_seqs, needs_grad=False):
        return rollout(params, state_cur, act_seqs, needs_grad=needs_grad)

    def evaluate(state_seqs, action_seqs, state_cur):
        return running_cost(state_seqs, action_seqs, state_cur, target, bbox)

    cfg = MPPIConfig(n_sample=4, n_update_iter=1, planner_type="GD", lr=0.02,
                     action_lower_lim=(-0.4, -0.4, -np.pi, 2.0),
                     action_upper_lim=(0.4, 0.4, np.pi, 3.0))
    planner = Planner(cfg, model_rollout, evaluate)
    res = planner.trajectory_optimization(
        jax.random.PRNGKey(1), state,
        jnp.zeros((1, 4)).at[0, 3].set(2.0))
    assert np.isfinite(float(res["best_reward"]))


def test_fps_action_sampling():
    from gsdx.plan.actions import sample_action_seq_fps
    lower = (-0.2, -0.2, -np.pi, 5.0)
    upper = (0.2, 0.2, np.pi, 20.0)
    acts = sample_action_seq_fps(lower, upper, n_sample=32, grid_size=0.2)
    acts = np.asarray(acts)
    assert acts.shape == (32, 1, 4)
    assert (acts[..., 0] >= -0.2).all() and (acts[..., 0] <= 0.2).all()
    # FPS spread: samples are not duplicated (xy grid only has 2x2 cells at
    # this grid_size, so uniqueness is over the full 4D action)
    assert len(np.unique(acts[:, 0], axis=0)) > 16


def test_chunked_rollout_matches_plain(rng):
    """Repeat-sorted chunking is a pure sample permutation: identical math,
    but XLA picks shape-dependent gemm accumulation (B=1 vs B=16 already
    differs ~3e-6 on CPU), and an adjacency top-k flip can amplify one
    sample to ~1e-3 through the rollout. Assert tight closeness + that the
    chunked path itself is deterministic."""
    model_cfg = ModelConfig(nf_particle=32, nf_relation=32, nf_effect=32,
                            n_his=2)
    data_cfg = GraphDatasetConfig(n_his=2, max_nobj=12, max_nR=64, topk=3)
    model = DynamicsPredictor(model_cfg)
    params = init_params(model, TrainConfig(n_his=2), data_cfg,
                         jax.random.PRNGKey(0))
    base = dict(n_his=2, max_nobj=12, max_nR=64, topk=3, adj_thresh=0.3,
                max_repeat=8)
    roll_plain = jax.jit(make_batched_rollout(
        model, RolloutSpec(**base, sort_chunks=1)))
    roll_chunk = jax.jit(make_batched_rollout(
        model, RolloutSpec(**base, sort_chunks=4)))
    state = jnp.asarray(rng.normal(scale=0.05, size=(12, 3)).astype(np.float32))
    acts = jnp.asarray(
        np.concatenate([
            rng.uniform(-0.2, 0.2, size=(16, 1, 2)),
            rng.uniform(-np.pi, np.pi, size=(16, 1, 1)),
            rng.uniform(3, 8, size=(16, 1, 1)),  # varied repeat counts
        ], axis=-1).astype(np.float32))
    a = roll_plain(params, state, acts)
    b = roll_chunk(params, state, acts)
    np.testing.assert_allclose(np.asarray(a["state_seqs"]),
                               np.asarray(b["state_seqs"]), atol=5e-3, rtol=0)
    np.testing.assert_array_equal(np.asarray(a["action_seqs"]),
                                  np.asarray(b["action_seqs"]))
    b2 = roll_chunk(params, state, acts)
    np.testing.assert_array_equal(np.asarray(b["state_seqs"]),
                                  np.asarray(b2["state_seqs"]))
