"""MPPI planning throughput on TPU at the reference load.

The reference evaluates 10,000 samples per planning step as 10 chunks x
1,000 (`src/real_world/plan.py:297-302,367-373`) through the GNN rollout;
here one jitted MPPI iteration carries 1,000 samples and `plan()` runs
n_update_iter=10 of them — one full planning step == the reference's
10k-sample budget.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/bench_mppi_step.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import init_params
from gsdx.io.config import load_config
from gsdx.plan.cost import running_cost
from gsdx.plan.dynamics_rollout import RolloutSpec, make_batched_rollout
from gsdx.plan.planner import MPPIConfig, Planner
from gsdx.realworld.env import WORKSPACE_BBOX

print("devices:", jax.devices(), flush=True)
train_cfg, model_cfg, data_cfg = load_config("configs/rope.yaml")
model = DynamicsPredictor(model_cfg)
gnn_params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
n_obj = data_cfg.max_nobj
state_cur = jnp.asarray(
    rng.normal(0, 0.05, (n_obj, 3)).astype(np.float32)
    + np.array([0.3, 0.0, 0.0], np.float32))
target = np.asarray(state_cur) + np.array([0.08, -0.05, 0.0], np.float32)

spec = RolloutSpec(
    n_his=train_cfg.n_his, max_nobj=n_obj, max_nR=data_cfg.max_nR,
    topk=data_cfg.topk, adj_thresh=sum(data_cfg.adj_radius_range) / 2,
    connect_all=data_cfg.connect_all,
)
rollout_raw = make_batched_rollout(model, spec)
bbox = jnp.asarray(WORKSPACE_BBOX)
tgt = jnp.asarray(target)


def model_rollout(state, acts, needs_grad=False):
    return rollout_raw(gnn_params, state, acts, needs_grad=needs_grad)


def evaluate(state_seqs, act_seqs, state_cur):
    return running_cost(state_seqs, act_seqs, state_cur, tgt, bbox)


planner = Planner(MPPIConfig(n_sample=1000), model_rollout, evaluate)
init = jnp.zeros((1, 4)).at[0, 3].set(10.0)

# ---- fused-vs-off parity on a fixed seed (VERDICT r3 #2) ----
# The kernel is bit-exact vs its XLA twin on chip (probe_fused_tpu.py); the
# remaining fused-vs-off deviation is bf16 regrouping (packed split-block
# weights vs the flax concat layout) amplified through up-to-19 chained
# pushes of an untrained 512-wide net — compare the full reward vector, not
# just the argmax.
from gsdx.plan.actions import sample_action_seq

roll_off = make_batched_rollout(model, spec._replace(fused="off"))
acts_fix = sample_action_seq(
    jax.random.PRNGKey(42), init,
    jnp.asarray(MPPIConfig().action_lower_lim),
    jnp.asarray(MPPIConfig().action_upper_lim), 1000, iter_index=0,
    noise_level=0.3, push_length=0.01)


def rewards_of(rollout_fn):
    out = rollout_fn(gnn_params, state_cur, acts_fix)
    return evaluate(out["state_seqs"], out["action_seqs"],
                    state_cur)["reward_seqs"]


roll_twin = make_batched_rollout(model, spec._replace(fused="twin"))
r_on = np.asarray(jax.jit(lambda: rewards_of(rollout_raw))())
r_off = np.asarray(jax.jit(lambda: rewards_of(roll_off))())
# kernel correctness at rollout scale: the twin runs the IDENTICAL math as
# the Pallas kernel through plain XLA — fused-vs-twin isolates kernel
# execution (expected ~bit-exact; verified exactly so at single-forward
# scale by probe_fused_tpu.py)
r_tw = np.asarray(jax.jit(lambda: rewards_of(roll_twin))())
dvec = np.abs(r_on - r_off)
dtw = np.abs(r_on - r_tw)
d_best = abs(r_on.max() - r_off.max())
print(f"parity (fixed 1000-sample batch): best {r_on.max():.4f} vs "
      f"{r_off.max():.4f} (|d| {d_best:.2e}); fused-vs-off |delta| "
      f"median {np.median(dvec):.2e} p95 {np.quantile(dvec, 0.95):.2e} "
      f"max {dvec.max():.2e} [bf16-class regroup x chained-push "
      f"amplification]; fused-vs-TWIN median {np.median(dtw):.2e} max "
      f"{dtw.max():.2e}; argmax same: {r_on.argmax() == r_off.argmax()}",
      flush=True)
assert d_best < 0.1, d_best
# kernel == its XLA twin through 19 chained pushes for the typical sample
# (median measured EXACTLY 0.0 on chip); the tail is adjacency-threshold /
# top-k tie flips — the edge-distance graph fuses differently in the two
# programs, and a 1-ulp difference at a tie rebuilds a different edge set.
assert np.median(dtw) < 1e-6, np.median(dtw)
assert (dtw > 1e-3).mean() < 0.05, (dtw > 1e-3).mean()

out = planner.trajectory_optimization(jax.random.PRNGKey(0), state_cur, init)
jax.block_until_ready(out["act_seq"])
iters = 10
t0 = time.perf_counter()
for i in range(iters):
    out = planner.trajectory_optimization(jax.random.PRNGKey(1 + i),
                                          state_cur, init)
jax.block_until_ready(out["act_seq"])
dt = (time.perf_counter() - t0) / iters
print(f"full planning step (10 iters x 1000 samples): {dt*1e3:.1f} ms "
      f"({10000/dt:.0f} sample-rollouts/s), best reward "
      f"{float(out['best_reward']):.4f}", flush=True)
print("MPPI STEP OK", flush=True)
