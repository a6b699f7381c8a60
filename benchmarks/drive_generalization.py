"""Multi-episode GNN generalization artifact (VERDICT r4 #2).

The reference's actual training regime is hundreds of epochs over an episode
CORPUS with an 80/20 episode split and per-epoch valid MSE
(`/root/reference/src/train.py:156,232-238`,
`src/data/dataset.py:275-281`). Every previous gsdx dynamics-quality number
was single-episode overfit; this drive produces the held-out evidence:

  1. Synthesize 15 varied push episodes on the REAL demo rope cloud
     (`/root/reference/assets/demo/pcd.ply`, FPS to 1000 particles): each
     episode pushes from a random contact point in a random planar direction
     with a random contact-falloff radius and step length — the same motion
     family the full-pipeline drive uses, now sampled per episode.
  2. 80/20 EPISODE split (12 train / 3 valid — split by episode, not pair,
     exactly like the reference's `get_valid_paths`).
  3. Train the rope config (nf 512, batch 16, 5-step BPTT) for 200 epochs x
     100 iters = 20k steps with per-epoch valid MSE (`train_dynamics`).
  4. Roll the trained GNN autoregressively (DynamicsModule, production
     rollout path) over each HELD-OUT episode and one train episode;
     chamfer vs ground truth per frame.

Generalization criteria (VERDICT): the valid-loss curve flattens above
zero (not memorization), and held-out rollout chamfer is comparable to the
train-episode figure.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" timeout 3600 python -u \
       benchmarks/drive_generalization.py
Fast CPU smoke: GSDX_GEN_FAST=1 (tiny model/schedule, flow validation only).
"""
import json
import os
import time

import numpy as np
import jax

FAST = bool(int(os.environ.get("GSDX_GEN_FAST", "0")))
if FAST:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.dynamics.losses import chamfer_distance
from gsdx.dynamics.model import ModelConfig
from gsdx.dynamics.train import TrainConfig, train_dynamics
from gsdx.graph.dataset import EpisodeStore, GraphDatasetConfig, GraphSampler
from gsdx.kernels.fps import farthest_point_sampling
from gsdx.rollout.dynamics_module import DynamicsModule, RolloutConfig

ASSETS = "/root/reference/assets/demo"
OUT = "benchmarks/out"
os.makedirs(OUT, exist_ok=True)

N_EPISODES = 4 if FAST else 15
N_VALID = 1 if FAST else 3
T_STEPS = 12 if FAST else 16
N_PARTICLES = 120 if FAST else 1000
N_EPOCHS = 2 if FAST else 200
ITERS_PER_EPOCH = 3 if FAST else 100

t_wall = time.time()
report = {"config": {
    "n_episodes": N_EPISODES, "n_valid": N_VALID, "t_steps": T_STEPS,
    "n_particles": N_PARTICLES, "n_epochs": N_EPOCHS,
    "iters_per_epoch": ITERS_PER_EPOCH,
}}

# ---- 1. base cloud: the real demo rope, FPS-downsampled --------------------
from gsdx.io.ply import load_ply

pts, _ = load_ply(os.path.join(ASSETS, "pcd.ply"))
pts = np.asarray(pts, np.float32)
fps_idx = np.asarray(farthest_point_sampling(
    jnp.asarray(pts), min(N_PARTICLES, len(pts)), start_idx=0))
base = pts[fps_idx]  # (P, 3)
print(f"[gen] base cloud {base.shape} from demo pcd.ply", flush=True)

# ---- synthesize varied push episodes ---------------------------------------
rng = np.random.default_rng(0)
episodes, eefs, pair_lists = [], [], []
ep_meta = []
N_HIST = 3 + 5  # n_his + n_future frames per pair row
for e in range(N_EPISODES):
    theta = rng.uniform(0, 2 * np.pi)
    push_dir = np.array([np.cos(theta), np.sin(theta), 0], np.float32)
    contact = base[rng.integers(len(base))].copy()
    step = float(rng.uniform(0.010, 0.014))  # >= dist_thresh 0.01 per frame
    radius = float(rng.uniform(0.05, 0.09))

    eef = np.zeros((T_STEPS, 1, 3), np.float32)
    # start just outside the object on the push line, at object height
    eef[0, 0] = contact - push_dir * 0.02
    eef[0, 0, 2] = base[:, 2].min()

    xyz = np.zeros((T_STEPS, len(base), 3), np.float32)
    xyz[0] = base
    for t in range(1, T_STEPS):
        eef[t, 0] = eef[t - 1, 0] + step * push_dir
        d2 = np.sum((xyz[t - 1] - eef[t, 0]) ** 2, axis=1)
        w = np.exp(-d2 / radius**2)
        xyz[t] = xyz[t - 1] + step * w[:, None] * push_dir

    pairs = np.array([[e] + list(range(t, t + N_HIST))
                      for t in range(T_STEPS - N_HIST)], np.int64)
    episodes.append(xyz)
    eefs.append(eef)
    pair_lists.append(pairs)
    moved = float(np.linalg.norm(xyz[-1] - xyz[0], axis=1).mean())
    ep_meta.append({"theta": round(theta, 3), "step_m": round(step, 4),
                    "radius_m": round(radius, 3),
                    "mean_particle_motion_m": round(moved, 4)})
report["episodes"] = ep_meta
print(f"[gen] {N_EPISODES} episodes synthesized "
      f"(mean motion {np.mean([m['mean_particle_motion_m'] for m in ep_meta]):.4f} m)",
      flush=True)

# ---- 2. 80/20 episode split ------------------------------------------------
valid_eps = list(range(N_EPISODES - N_VALID, N_EPISODES))
train_eps = list(range(N_EPISODES - N_VALID))

def make_store(ep_ids):
    # pair rows carry global episode indices; re-base them into the store
    local = {g: i for i, g in enumerate(ep_ids)}
    plists = []
    for g in ep_ids:
        p = pair_lists[g].copy()
        p[:, 0] = local[g]
        plists.append(p)
    return EpisodeStore.from_numpy(
        [episodes[g] for g in ep_ids], [eefs[g] for g in ep_ids], plists)

if FAST:
    model_cfg = ModelConfig(nf_particle=32, nf_relation=32, nf_effect=32)
    data_cfg = GraphDatasetConfig(max_nobj=32, max_nR=160)
    train_cfg = TrainConfig(batch_size=4, n_epochs=N_EPOCHS,
                            n_iters_per_epoch_train=ITERS_PER_EPOCH,
                            n_iters_per_epoch_valid=2,
                            out_dir=os.path.join(OUT, "generalization"))
else:
    model_cfg = ModelConfig()  # rope config: nf 512, pstep 3
    data_cfg = GraphDatasetConfig()  # max_nobj 100, max_nR 500, topk 5
    train_cfg = TrainConfig(batch_size=16, n_epochs=N_EPOCHS,
                            n_iters_per_epoch_train=ITERS_PER_EPOCH,
                            n_iters_per_epoch_valid=10,
                            out_dir=os.path.join(OUT, "generalization"))

train_store = make_store(train_eps)
valid_store = make_store(valid_eps)
train_sampler = GraphSampler(train_store, data_cfg, phase="train")
valid_sampler = GraphSampler(valid_store, data_cfg, phase="valid")
report["split"] = {"train_episodes": train_eps, "valid_episodes": valid_eps,
                   "train_pairs": train_sampler.num_pairs,
                   "valid_pairs": valid_sampler.num_pairs}

# ---- 3. train with per-epoch valid MSE -------------------------------------
t0 = time.time()
params, _, history = train_dynamics(
    train_sampler, valid_sampler, model_cfg, train_cfg, progress=True)
train_wall = time.time() - t0
report["train"] = {
    "wall_s": round(train_wall, 1),
    "steps": N_EPOCHS * ITERS_PER_EPOCH,
    "steps_per_s": round(N_EPOCHS * ITERS_PER_EPOCH / train_wall, 1),
    "train_loss_per_epoch": [round(x, 6) for x in history["train"]],
    "valid_loss_per_epoch": [round(x, 6) for x in history["valid"]],
    "final_train_loss": round(history["train"][-1], 6),
    "final_valid_loss": round(history["valid"][-1], 6),
    "min_valid_loss": round(min(history["valid"]), 6),
}
print(f"[gen] trained {N_EPOCHS * ITERS_PER_EPOCH} steps in {train_wall:.0f}s: "
      f"final train {history['train'][-1]:.6f} valid {history['valid'][-1]:.6f}",
      flush=True)

# ---- 4. held-out rollout chamfer (production rollout path) -----------------
roll_cfg = (RolloutConfig(max_nobj=data_cfg.max_nobj, max_nR=data_cfg.max_nR,
                          n_fps_proxy=N_PARTICLES)
            if not FAST else
            RolloutConfig(max_nobj=32, max_nR=160, n_fps_proxy=N_PARTICLES))
dm = DynamicsModule(model_cfg, params, roll_cfg)

def rollout_chamfer(ep_id):
    xyz_gt = episodes[ep_id]
    quat0 = np.tile(np.array([1, 0, 0, 0], np.float32), (len(base), 1))
    traj = dm.rollout(jnp.asarray(xyz_gt[0]), jnp.asarray(quat0),
                      eefs[ep_id], n_steps=T_STEPS)
    cs = []
    for t in range(T_STEPS):
        c = float(chamfer_distance(jnp.asarray(traj["xyz"][t])[None],
                                   jnp.asarray(xyz_gt[t])[None]))
        cs.append(round(c, 6))
    return cs

t0 = time.time()
rollouts = {}
for ep_id in valid_eps:
    cs = rollout_chamfer(ep_id)
    rollouts[f"valid_ep{ep_id}"] = cs
    print(f"[gen] held-out ep{ep_id} rollout chamfer last {cs[-1]:.5f} "
          f"mean {np.mean(cs):.5f}", flush=True)
train_probe = train_eps[0]
cs = rollout_chamfer(train_probe)
rollouts[f"train_ep{train_probe}"] = cs
print(f"[gen] train ep{train_probe} rollout chamfer last {cs[-1]:.5f} "
      f"mean {np.mean(cs):.5f}", flush=True)

valid_means = [float(np.mean(v)) for k, v in rollouts.items()
               if k.startswith("valid")]
report["rollout"] = {
    "wall_s": round(time.time() - t0, 1),
    "chamfer_per_t": rollouts,
    "valid_chamfer_mean": round(float(np.mean(valid_means)), 6),
    "train_chamfer_mean": round(float(np.mean(cs)), 6),
}

report["total_wall_s"] = round(time.time() - t_wall, 1)
with open(os.path.join(OUT, "generalization_report.json"), "w") as f:
    json.dump(report, f, indent=1)
print(f"[gen] total {report['total_wall_s']}s -> "
      "benchmarks/out/generalization_report.json", flush=True)
print("DRIVE_GENERALIZATION OK", flush=True)
