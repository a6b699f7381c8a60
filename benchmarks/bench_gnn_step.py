"""GNN training-step throughput on TPU at rope-config scale."""
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import jax.numpy as jnp

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import TrainConfig, init_params, make_train_step
from gsdx.graph.dataset import GraphBatch
from gsdx.io.config import load_config

print("devices:", jax.devices(), flush=True)
train_cfg, model_cfg, data_cfg = load_config("configs/rope.yaml")
model = DynamicsPredictor(model_cfg)
params = init_params(model, train_cfg, data_cfg, jax.random.PRNGKey(0))
train_step, eval_step, tx = make_train_step(model, train_cfg)
opt_state = tx.init(params)

B = train_cfg.batch_size
N = data_cfg.max_nobj + data_cfg.max_tool
nR = data_cfg.max_nR
rng = np.random.default_rng(0)


def make_batch(seed):
    r = np.random.default_rng(seed)
    Rr = np.zeros((B, nR, N), np.float32)
    Rs = np.zeros((B, nR, N), np.float32)
    for b in range(B):
        src = r.integers(0, N, nR)
        dst = r.integers(0, N, nR)
        Rr[b, np.arange(nR), dst] = 1
        Rs[b, np.arange(nR), src] = 1
    return GraphBatch(
        state=jnp.asarray(r.normal(0, 0.1, (B, train_cfg.n_his, N, 3)).astype(np.float32)),
        attrs=jnp.asarray(r.uniform(0, 1, (B, N, 2)).astype(np.float32)),
        Rr=jnp.asarray(Rr), Rs=jnp.asarray(Rs),
        p_instance=jnp.asarray(np.ones((B, data_cfg.max_nobj, 1), np.float32)),
        action=jnp.asarray(r.normal(0, 0.01, (B, N, 3)).astype(np.float32)),
        state_future=jnp.asarray(r.normal(0, 0.1, (B, train_cfg.n_future, data_cfg.max_nobj, 3)).astype(np.float32)),
        action_future=jnp.asarray(r.normal(0, 0.01, (B, train_cfg.n_future - 1, N, 3)).astype(np.float32)),
        tool_future=jnp.asarray(r.normal(0, 0.1, (B, train_cfg.n_future - 1, N, 3)).astype(np.float32)),
        obj_mask=jnp.asarray(np.ones((B, data_cfg.max_nobj), bool)),
        state_mask=jnp.asarray(np.ones((B, N), bool)),
        tool_mask=jnp.asarray(
            np.arange(N)[None, :].repeat(B, 0) >= data_cfg.max_nobj),
    )


batch = make_batch(1)
params, opt_state, loss, parts = train_step(params, opt_state, batch)
jax.block_until_ready(loss)
print("loss:", float(loss), flush=True)
iters = 30
batches = [make_batch(2 + i % 3) for i in range(3)]
t0 = time.perf_counter()
for i in range(iters):
    params, opt_state, loss, parts = train_step(params, opt_state, batches[i % 3])
jax.block_until_ready(loss)
dt = (time.perf_counter() - t0) / iters
print(f"train step: {dt*1e3:.2f} ms ({1/dt:.1f} steps/s, "
      f"{B/dt:.0f} samples/s)", flush=True)
print("GNN STEP OK", flush=True)
