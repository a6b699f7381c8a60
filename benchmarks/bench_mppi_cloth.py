"""Cloth-family MPPI planning step, end-to-end on TPU (VERDICT r4 #4).

The reference runs EVERY object family through the same 10 x 1000-sample
planning budget (`src/real_world/plan.py:297-302`); cloth differs in the
graph (connect_all, max_nobj 150, max_nR 1200, topk 6 —
`src/config/cloth.yaml:47-52`) and the model family (state_dim 1,
motion_dim 3). r4 measured the cloth fused *forward* only (43.8 vs 88.7 ms
XLA at B=1000); this benchmark measures the full planning step plus
fused-vs-off argmax parity at the cloth config.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u \
       benchmarks/bench_mppi_cloth.py
"""
import json
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import init_params
from gsdx.io.config import load_config
from gsdx.plan.actions import sample_action_seq
from gsdx.plan.cost import running_cost
from gsdx.plan.dynamics_rollout import RolloutSpec, make_batched_rollout
from gsdx.plan.planner import MPPIConfig, Planner
from gsdx.realworld.env import WORKSPACE_BBOX

print("devices:", jax.devices(), flush=True)
train_cfg, model_cfg, data_cfg = load_config("configs/cloth.yaml")
assert model_cfg.state_dim == 1 and model_cfg.motion_dim == 3
assert data_cfg.connect_all and data_cfg.max_nR == 1200
model = DynamicsPredictor(model_cfg)
gnn_params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))

rng = np.random.default_rng(0)
n_obj = data_cfg.max_nobj  # 150
# cloth-like patch: a square sheet of points on the table
side = int(np.ceil(np.sqrt(n_obj)))
gx, gy = np.meshgrid(np.linspace(-0.12, 0.12, side),
                     np.linspace(-0.12, 0.12, side))
sheet = np.stack([gx.ravel(), gy.ravel(), np.zeros(side * side)], 1)[:n_obj]
state_cur = jnp.asarray(
    (sheet + np.array([0.3, 0.0, 0.01])).astype(np.float32)
    + rng.normal(0, 0.003, (n_obj, 3)).astype(np.float32))
target = np.asarray(state_cur) + np.array([0.06, -0.04, 0.0], np.float32)

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

# ---- fused-vs-off parity on a fixed 1000-sample batch ----------------------
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
# fused-vs-TWIN isolates kernel execution: the twin runs IDENTICAL math as
# the Pallas kernel through plain XLA (bit-exact at forward scale per
# probe_fused_cloth_tpu.py); fused-vs-off additionally sees bf16 weight
# regrouping amplified through ~19 chained pushes of the untrained net.
r_tw = np.asarray(jax.jit(lambda: rewards_of(roll_twin))())
scale = max(1.0, float(np.abs(r_on).max()))  # cloth rewards are O(1e3)
dvec = np.abs(r_on - r_off)
dtw = np.abs(r_on - r_tw)
d_best = abs(r_on.max() - r_off.max())
argmax_same = bool(r_on.argmax() == r_off.argmax())
print(f"parity (fixed 1000-sample batch, reward scale {scale:.0f}): best "
      f"{r_on.max():.4f} vs {r_off.max():.4f} (|d| {d_best:.2e} = "
      f"{d_best/scale:.2e} rel); fused-vs-off |delta| median "
      f"{np.median(dvec):.2e} p95 {np.quantile(dvec, 0.95):.2e} max "
      f"{dvec.max():.2e}; fused-vs-TWIN median {np.median(dtw):.2e} max "
      f"{dtw.max():.2e}; argmax same: {argmax_same}", flush=True)
assert d_best / scale < 0.01, (d_best, scale)
assert argmax_same
# Unlike the rope scene (random cloud; fused-vs-twin median EXACTLY 0 on
# chip), the cloth sheet is a near-regular lattice: adjacency distances are
# densely near-tied, so 1-ulp fusion differences in the per-push edge
# rebuild (outside the kernel — the kernel is bit-exact vs the twin at
# forward scale, probe_fused_cloth_tpu.py) flip top-k edges for most
# samples somewhere in the ~19-push chain. Measured median 4.2e-1 of a
# 6.3e3 reward scale = 6.7e-5 relative.
assert np.median(dtw) / scale < 1e-3, (np.median(dtw), scale)

# ---- full planning step (10 iters x 1000 samples), fused vs off ------------
results = {}
for name, rollout_fn in (("fused_auto", rollout_raw), ("fused_off", roll_off)):
    p = Planner(
        MPPIConfig(n_sample=1000),
        lambda s, a, needs_grad=False, f=rollout_fn: f(
            gnn_params, s, a, needs_grad=needs_grad),
        evaluate,
    )
    out = p.trajectory_optimization(jax.random.PRNGKey(0), state_cur, init)
    jax.block_until_ready(out["act_seq"])
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = p.trajectory_optimization(jax.random.PRNGKey(1 + i),
                                        state_cur, init)
    jax.block_until_ready(out["act_seq"])
    dt = (time.perf_counter() - t0) / iters
    results[name] = {"step_s": round(dt, 3),
                     "sample_rollouts_per_s": round(10000 / dt, 1),
                     "best_reward": round(float(out["best_reward"]), 4)}
    print(f"{name}: full planning step (10 x 1000 samples) {dt:.2f} s "
          f"({10000/dt:.0f} sample-rollouts/s), best reward "
          f"{float(out['best_reward']):.4f}", flush=True)

report = {
    "config": "cloth (connect_all, max_nobj 150, max_nR 1200, topk 6, "
              "state_dim 1, motion_dim 3)",
    "parity": {"reward_scale": round(scale, 2),
               "best_abs_delta": round(float(d_best), 6),
               "best_rel_delta": round(float(d_best / scale), 8),
               "median_abs_delta": round(float(np.median(dvec)), 6),
               "p95_abs_delta": round(float(np.quantile(dvec, 0.95)), 6),
               "max_abs_delta": round(float(dvec.max()), 6),
               "fused_vs_twin_median": round(float(np.median(dtw)), 8),
               "fused_vs_twin_max": round(float(dtw.max()), 6),
               "argmax_same": argmax_same},
    "planning_step": results,
}
os.makedirs("benchmarks/out", exist_ok=True)
with open("benchmarks/out/mppi_cloth_report.json", "w") as f:
    json.dump(report, f, indent=1)
print("MPPI CLOTH OK -> benchmarks/out/mppi_cloth_report.json", flush=True)
