"""Decompose the MPPI batched-rollout cost (VERDICT r2 weak #5 / next #6).

One planning step = 10 jitted MPPI iterations, each a fixed-bound 19-push
rollout at B=1000 (`src/real_world/plan.py:297-302`). This probe times, in
ONE process with interleaved repetitions and a perturbed input per call
(CLAUDE.md bench rules):

  full        : the production rollout (edges rebuilt every push)
  frozen      : edges built once from the initial states, reused all pushes
  every4      : edges rebuilt every 4th push (nested-scan style reuse)
  bf16        : full rollout with bf16 params/activations
  fused_sel   : full rollout, [Rr|Rs] fused edge selection matmul

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/probe_mppi_breakdown.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import init_params
from gsdx.graph.edges import construct_edges_batch
from gsdx.io.config import load_config
from gsdx.plan.actions import decode_action
from gsdx.plan.dynamics_rollout import RolloutSpec, make_batched_rollout

print("devices:", jax.devices(), flush=True)
train_cfg, model_cfg, data_cfg = load_config("configs/rope.yaml")
model = DynamicsPredictor(model_cfg)
params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
n_obj = data_cfg.max_nobj
B, L = 1000, 1
spec = RolloutSpec(
    n_his=train_cfg.n_his, max_nobj=n_obj, max_nR=data_cfg.max_nR,
    topk=data_cfg.topk, adj_thresh=sum(data_cfg.adj_radius_range) / 2,
    connect_all=data_cfg.connect_all,
)
state0 = (rng.normal(0, 0.05, (n_obj, 3)).astype(np.float32)
          + np.array([0.3, 0.0, 0.0], np.float32))
acts = rng.uniform(-0.4, 0.4, (B, L, 4)).astype(np.float32)
acts[..., 3] = 19.0  # force the full 19-push depth


def make_rollout_variant(edge_mode="full", dtype=jnp.float32):
    """edge_mode: full | frozen | every4 | edges_only."""

    def rollout(p, state, act_seqs):
        if dtype != jnp.float32:
            p = jax.tree.map(lambda x: x.astype(dtype), p)
        n = state.shape[0]
        N = n + 1
        decoded, repeats = decode_action(act_seqs, spec.push_length)
        state_mask = jnp.ones((B, N), bool)
        tool_mask = jnp.zeros((B, N), bool).at[:, n:].set(True)
        attrs = jnp.zeros((B, N, 2), dtype)
        attrs = attrs.at[:, :n, 0].set(1.0).at[:, n:, 1].set(1.0)
        p_instance = jnp.ones((B, n, 1), dtype)
        obj_kp = jnp.tile(state[None, None], (B, spec.n_his, 1, 1)).astype(dtype)

        z = jnp.min(obj_kp[:, -1, :, 2], axis=1)
        eef = jnp.stack([decoded[:, 0, 0], decoded[:, 0, 1], z], -1)[:, None]
        delta = jnp.stack(
            [decoded[:, 0, 2] - decoded[:, 0, 0],
             decoded[:, 0, 3] - decoded[:, 0, 1], jnp.zeros((B,))], -1
        )[:, None].astype(dtype)
        states = jnp.concatenate(
            [obj_kp, jnp.tile(eef[:, None], (1, spec.n_his, 1, 1)).astype(dtype)],
            axis=2)
        action = jnp.concatenate([jnp.zeros((B, n, 3), dtype), delta], 1)

        def edges(st):
            return construct_edges_batch(
                st, spec.adj_thresh, state_mask, tool_mask, n_obj=n,
                topk=spec.topk, max_nR=spec.max_nR,
                connect_all=spec.connect_all)

        Rr0, Rs0 = edges(states[:, -1].astype(jnp.float32))
        Rr0, Rs0 = Rr0.astype(dtype), Rs0.astype(dtype)

        def push_step(ai, carry):
            states, pred = carry
            if edge_mode == "frozen":
                Rr, Rs = Rr0, Rs0
            elif edge_mode == "every4":
                Rr, Rs = jax.lax.cond(
                    ai % 4 == 1,
                    lambda s: tuple(m.astype(dtype)
                                    for m in edges(s.astype(jnp.float32))),
                    lambda s: (Rr0, Rs0), states[:, -1])
            else:
                Rr, Rs = edges(states[:, -1].astype(jnp.float32))
                Rr, Rs = Rr.astype(dtype), Rs.astype(dtype)
            if edge_mode == "edges_only":
                pred2 = (states[:, -1, :n]
                         + 1e-4 * (Rr.sum(1) + Rs.sum(1))[:, :n, None])
            else:
                pred2, _ = model.apply(p, states, attrs, Rr, Rs,
                                       p_instance, action)
            freeze = (repeats[:, 0] == ai)[:, None, None]
            pred = jnp.where(freeze, pred2, pred)
            z_cur = jnp.min(pred2[:, :, 2], axis=1)
            eef_cur = states[:, -1, n:] + action[:, n:]
            eef_cur = eef_cur.at[:, 0, 2].set(z_cur)
            states_cur = jnp.concatenate([pred2, eef_cur], 1)
            states = jnp.concatenate([states[:, 1:], states_cur[:, None]], 1)
            return states, pred

        _, pred = jax.lax.fori_loop(
            1, jnp.minimum(jnp.max(repeats[:, 0]), spec.max_repeat) + 1,
            push_step, (states, obj_kp[:, -1, :n].astype(dtype)))
        return pred.astype(jnp.float32)

    return jax.jit(rollout)


variants = {
    "full": make_rollout_variant("full"),
    "frozen": make_rollout_variant("frozen"),
    "every4": make_rollout_variant("every4"),
    "edges_only": make_rollout_variant("edges_only"),
    "bf16": make_rollout_variant("full", jnp.bfloat16),
    "bf16_frozen": make_rollout_variant("frozen", jnp.bfloat16),
}
prod = jax.jit(lambda p, s, a: make_batched_rollout(model, spec)(
    p, s, a)["state_seqs"])
variants["prod"] = prod

acts_j = jnp.asarray(acts)
outs = {}
for name, fn in variants.items():
    o = fn(params, jnp.asarray(state0), acts_j)
    jax.block_until_ready(o)
    outs[name] = np.asarray(o).reshape(-1, n_obj, 3)[..., :3]
    print(f"compiled {name}", flush=True)

ref = outs["prod"]
for name, o in outs.items():
    d = float(np.max(np.abs(o.reshape(ref.shape) - ref)))
    print(f"  {name}: max|delta| vs prod = {d:.5f}", flush=True)

REPS, ROUNDS = 4, 5
times = {k: [] for k in variants}
for r in range(ROUNDS):
    for name, fn in variants.items():
        s = jnp.asarray(state0 + 1e-4 * r)  # perturb per round
        o = fn(params, s, acts_j)
        jax.block_until_ready(o)  # warm this round's shape/value path
        t0 = time.perf_counter()
        for i in range(REPS):
            s = jnp.asarray(state0 + 1e-4 * r + 1e-5 * i)
            o = fn(params, s, acts_j)
        jax.block_until_ready(o)
        times[name].append((time.perf_counter() - t0) / REPS * 1e3)

print("\nper-rollout (19 pushes, B=1000) ms — median over rounds:")
for name in variants:
    med = float(np.median(times[name]))
    print(f"  {name:12s} {med:8.1f} ms   {sorted(round(t,1) for t in times[name])}",
          flush=True)
print("PROBE OK", flush=True)
