"""Data-parallel GNN training over a device mesh.

Parameters are replicated; graph batches shard over the 'data' axis. The
mean loss makes XLA emit one gradient all-reduce (psum) overlapped with the
backward pass — the standard pjit DP recipe, replacing the reference's
single-GPU loop (`src/train.py:159-219`) with no change to the math.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsdx.dynamics.model import DynamicsPredictor
from gsdx.dynamics.train import TrainConfig, unrolled_loss
from gsdx.graph.dataset import GraphBatch


def shard_batch(batch: GraphBatch, mesh: Mesh, axis: str = "data") -> GraphBatch:
    """Place a host batch with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def make_dp_train_step(model: DynamicsPredictor, cfg: TrainConfig, mesh: Mesh,
                       tx=None, axis: str = "data"):
    """Returns (train_step, tx): jitted step with explicit shardings."""
    if tx is None:
        tx = optax.adam(cfg.lr)

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(axis))

    def loss_fn(params, batch):
        loss, parts = unrolled_loss(model, params, batch, cfg)
        return loss, parts

    @jax.jit
    def train_step(params, opt_state, batch):
        batch = jax.lax.with_sharding_constraint(
            batch, jax.tree.map(lambda _: bsh, batch)
        )
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.lax.with_sharding_constraint(
            params, jax.tree.map(lambda _: repl, params)
        )
        return params, opt_state, loss, parts

    return train_step, tx
