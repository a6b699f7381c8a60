"""GraphSampler batch-assembly throughput on TPU at rope-config scale.

The reference feeds training from 8 CPU DataLoader workers; gsdx assembles
batches on-device (jit+vmap). If assembly is slower than the 14.9 ms train
step it becomes the bottleneck; measure both and the combined loop.

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python -u benchmarks/bench_sampler.py
"""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import init_params, make_train_step
from gsdx.graph.dataset import EpisodeStore, GraphSampler
from gsdx.io.config import load_config

print("devices:", jax.devices(), flush=True)
train_cfg, model_cfg, data_cfg = load_config("configs/rope.yaml")

# synthetic episode store at rope scale: 20 episodes x 60 frames x 1000 pts
rng = np.random.default_rng(0)
eps_xyz, eps_eef, eps_pairs = [], [], []
for e in range(20):
    T = 60
    base = rng.normal(0, 0.05, (1, 1000, 3)).astype(np.float32)
    drift = rng.normal(0, 0.002, (T, 1, 3)).astype(np.float32).cumsum(0)
    eps_xyz.append(base + drift)
    eef = rng.normal(0, 0.1, (T, 1, 3)).astype(np.float32)
    eps_eef.append(eef)
    span = train_cfg.n_his + train_cfg.n_future
    starts = rng.integers(0, T - span, 40)
    # pair row: [episode, frame_0 .. frame_{span-1}]
    frames = starts[:, None] + np.arange(span)[None, :]
    pairs = np.concatenate([np.full((40, 1), e), frames], axis=1)
    eps_pairs.append(pairs.astype(np.int64))
store = EpisodeStore.from_numpy(eps_xyz, eps_eef, eps_pairs)
sampler = GraphSampler(store, data_cfg, "train")

model = DynamicsPredictor(model_cfg)
params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))
train_step, _, tx = make_train_step(model, train_cfg)
opt_state = tx.init(params)

B = train_cfg.batch_size
key = jax.random.PRNGKey(0)
batch = sampler.sample(key, B)
jax.block_until_ready(batch.state)
iters = 30
t0 = time.perf_counter()
for i in range(iters):
    batch = sampler.sample(jax.random.fold_in(key, i), B)
jax.block_until_ready(batch.state)
dt_s = (time.perf_counter() - t0) / iters
print(f"sample assembly: {dt_s*1e3:.2f} ms/batch", flush=True)

params, opt_state, loss, _ = train_step(params, opt_state, batch)
jax.block_until_ready(loss)
t0 = time.perf_counter()
for i in range(iters):
    batch = sampler.sample(jax.random.fold_in(key, 100 + i), B)
    params, opt_state, loss, _ = train_step(params, opt_state, batch)
jax.block_until_ready(loss)
dt = (time.perf_counter() - t0) / iters
print(f"sample+train loop: {dt*1e3:.2f} ms/iter ({1/dt:.1f} iters/s, "
      f"{B/dt:.0f} samples/s)", flush=True)
print("SAMPLER OK", flush=True)
