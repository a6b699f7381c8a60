"""GD planner on chip at production scale + GD-vs-MPPI comparison
(VERDICT r4 #8 stretch; reference `src/real_world/utils/planner.py:278-310`).

The GD variant runs Adam on the sampled action batch with gradients THROUGH
the differentiable GNN rollout (fused Pallas fast path disabled via
needs_grad — `gsdx/plan/planner.py:57-67`). Same rope scene, same
10 x 1000-sample budget as the MPPI benchmark; reports wall-clock and the
achieved best reward for both planner types.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u \
       benchmarks/bench_gd_planner.py
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
from gsdx.plan.cost import running_cost
from gsdx.plan.dynamics_rollout import RolloutSpec, make_batched_rollout
from gsdx.plan.planner import MPPIConfig, Planner
from gsdx.realworld.env import WORKSPACE_BBOX

print("devices:", jax.devices(), flush=True)
train_cfg, model_cfg, data_cfg = load_config("configs/rope.yaml")
model = DynamicsPredictor(model_cfg)
gnn_params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))

# Use the GNN trained by drive_generalization.py when its checkpoint exists
# (multi-episode rope pushes on the real demo cloud) — the planner then
# optimizes against real learned dynamics, not a random-init net.
GEN_CKPT = "benchmarks/out/generalization/checkpoints/latest.ckpt"
trained = os.path.exists(GEN_CKPT)
if trained:
    from gsdx.io.checkpoint import load_checkpoint

    gnn_params = load_checkpoint(GEN_CKPT, gnn_params)
    print(f"loaded trained params from {GEN_CKPT}", flush=True)

rng = np.random.default_rng(0)
n_obj = data_cfg.max_nobj
if trained:
    # the scene family the checkpoint was trained on: the demo rope cloud
    from gsdx.io.ply import load_ply
    from gsdx.kernels.fps import farthest_point_sampling

    pts, _ = load_ply("/root/reference/assets/demo/pcd.ply")
    pts = np.asarray(pts, np.float32)
    idx = np.asarray(farthest_point_sampling(jnp.asarray(pts), n_obj,
                                             start_idx=0))
    state_cur = jnp.asarray(pts[idx])
else:
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


init = jnp.zeros((1, 4)).at[0, 3].set(10.0)
results = {}
for ptype, time_iters in (("MPPI", 3), ("GD", 2)):
    # GD differentiates through the full rollout: 1000 x ~19-push BPTT
    # activations are ~40 GB, so GD runs in 125-sample chunks (exact up to
    # gemm accumulation order; MPPIConfig.gd_sample_chunk).
    planner = Planner(
        MPPIConfig(n_sample=1000, planner_type=ptype, lr=1e-2,
                   gd_sample_chunk=125),
        model_rollout, evaluate)
    out = planner.trajectory_optimization(jax.random.PRNGKey(0), state_cur,
                                          init)
    jax.block_until_ready(out["act_seq"])  # compile
    t0 = time.perf_counter()
    for i in range(time_iters):
        out = planner.trajectory_optimization(jax.random.PRNGKey(1 + i),
                                              state_cur, init)
    jax.block_until_ready(out["act_seq"])
    dt = (time.perf_counter() - t0) / time_iters
    results[ptype] = {
        "step_s": round(dt, 3),
        "sample_rollouts_per_s": round(10000 / dt, 1),
        "best_reward": round(float(out["best_reward"]), 4),
        "act_seq": np.asarray(out["act_seq"]).round(4).tolist(),
    }
    print(f"{ptype}: planning step (10 iters x 1000 samples) {dt:.2f} s, "
          f"best reward {float(out['best_reward']):.4f}", flush=True)

report = {"scene": ("rope config, trained generalization checkpoint, "
                    "demo rope cloud" if trained else
                    "rope config, untrained-init GNN, synthetic scene"),
          "budget": "10 update iters x 1000 samples", "planners": results}
os.makedirs("benchmarks/out", exist_ok=True)
with open("benchmarks/out/gd_planner_report.json", "w") as f:
    json.dump(report, f, indent=1)
print("GD PLANNER OK -> benchmarks/out/gd_planner_report.json", flush=True)
