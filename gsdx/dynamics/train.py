"""GNN dynamics training (reference `src/train.py:105-261`).

The reference's per-iteration python loop with torch DataLoader workers
becomes: on-device batch sampling (`gsdx/graph/dataset.py`) + one jitted
train step containing the full n_future-step autoregressive BPTT unroll
(`src/train.py:186-212`). The unroll is a static python loop inside jit —
XLA sees one graph with n_future model applications and differentiates
through the fed-back predictions exactly like torch BPTT.
"""

from __future__ import annotations

import os
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.dynamics.utils import length_loss, mse_loss, rigid_loss
from gsdx.graph.dataset import GraphBatch, GraphSampler
from gsdx.io.checkpoint import save_checkpoint


class TrainConfig(NamedTuple):
    """Mirrors the train_config yaml block (`src/config/rope.yaml:1-15`)."""

    batch_size: int = 16
    n_epochs: int = 1000
    n_iters_per_epoch_train: int = 100
    n_iters_per_epoch_valid: int = 10
    lr: float = 1e-3
    n_his: int = 3
    n_future: int = 5
    mse_weight: float = 1.0
    length_weight: float = 0.01
    rigid_weight: float = 0.0  # 0.05 when train_config['rigid_loss'] is set
    random_seed: int = 42
    log_interval: int = 10
    out_dir: str = "log/run"
    dist_thresh: float = 0.01


def unrolled_loss(model: DynamicsPredictor, params, batch: GraphBatch,
                  cfg: TrainConfig):
    """n_future-step BPTT loss (`src/train.py:186-212`)."""
    state, action = batch.state, batch.action
    n_p = batch.state_future.shape[2]
    total = 0.0
    parts = {"mse": 0.0, "length": 0.0, "rigid": 0.0}
    for fi in range(cfg.n_future):
        pred, _ = model.apply(
            params, state, batch.attrs, batch.Rr, batch.Rs,
            batch.p_instance, batch.action if fi == 0 else action,
        )
        gt = batch.state_future[:, fi]
        l_mse = mse_loss(pred, gt)
        l_len = length_loss(pred, state, batch.Rr, batch.Rs)
        step_loss = cfg.mse_weight * l_mse + cfg.length_weight * l_len
        parts["mse"] += l_mse
        parts["length"] += l_len
        if cfg.rigid_weight > 0:
            l_rig = rigid_loss(pred, state, batch.obj_mask)
            step_loss = step_loss + cfg.rigid_weight * l_rig
            parts["rigid"] += l_rig
        total = total + step_loss

        if fi < cfg.n_future - 1:
            nxt = batch.tool_future[:, fi]  # (B, N, 3) tool pose, zeros else
            nxt = nxt.at[:, :n_p].set(pred)
            state = jnp.concatenate([state[:, 1:], nxt[:, None]], axis=1)
            action = batch.action_future[:, fi]
    return total, parts


def make_train_step(model: DynamicsPredictor, cfg: TrainConfig, tx=None):
    """Returns (train_step, eval_step, tx). Both jitted, donating state."""
    if tx is None:
        tx = optax.adam(cfg.lr)

    def loss_fn(params, batch):
        return unrolled_loss(model, params, batch, cfg)

    @jax.jit
    def train_step(params, opt_state, batch):
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, parts

    @jax.jit
    def eval_step(params, batch):
        return loss_fn(params, batch)

    return train_step, eval_step, tx


def init_params(model: DynamicsPredictor, cfg: TrainConfig,
                dcfg, key) -> dict:
    N = dcfg.max_nobj + dcfg.max_tool
    dummy = dict(
        state=jnp.zeros((1, cfg.n_his, N, 3)),
        attrs=jnp.zeros((1, N, 2)),
        Rr=jnp.zeros((1, dcfg.max_nR, N)),
        Rs=jnp.zeros((1, dcfg.max_nR, N)),
        p_instance=jnp.zeros((1, dcfg.max_nobj, 1)),
        action=jnp.zeros((1, N, 3)),
    )
    return model.init(key, **dummy)


def train_dynamics(
    train_sampler: GraphSampler,
    valid_sampler: Optional[GraphSampler],
    model_cfg: ModelConfig,
    cfg: TrainConfig,
    progress: bool = True,
    params=None,
):
    """Full training loop with checkpointing (`src/train.py:105-261`)."""
    model = DynamicsPredictor(model_cfg)
    key = jax.random.PRNGKey(cfg.random_seed)
    key, init_key = jax.random.split(key)
    if params is None:
        params = init_params(model, cfg, train_sampler.cfg, init_key)
    train_step, eval_step, tx = make_train_step(model, cfg)
    opt_state = tx.init(params)

    os.makedirs(os.path.join(cfg.out_dir, "checkpoints"), exist_ok=True)
    history = {"train": [], "valid": []}
    for epoch in range(cfg.n_epochs):
        t0 = time.time()
        losses = []
        for i in range(cfg.n_iters_per_epoch_train):
            key, sub = jax.random.split(key)
            batch = train_sampler.sample(sub, cfg.batch_size)
            params, opt_state, loss, parts = train_step(params, opt_state, batch)
            if progress and i % cfg.log_interval == 0:
                losses.append(float(loss))
        history["train"].append(float(np.mean(losses)) if losses else float(loss))

        if valid_sampler is not None:
            vlosses = []
            for i in range(cfg.n_iters_per_epoch_valid):
                key, sub = jax.random.split(key)
                batch = valid_sampler.sample(sub, cfg.batch_size)
                vloss, _ = eval_step(params, batch)
                vlosses.append(float(vloss))
            history["valid"].append(float(np.mean(vlosses)))
            if progress:
                print(
                    f"Epoch {epoch}, train {history['train'][-1]:.6f}, "
                    f"valid {history['valid'][-1]:.6f}, {time.time()-t0:.2f}s"
                )

        # checkpoint schedule (`src/train.py:240-243`)
        e = epoch + 1
        ckpt_dir = os.path.join(cfg.out_dir, "checkpoints")
        if e < 10 or (e < 100 and e % 10 == 0) or e % 100 == 0:
            save_checkpoint(os.path.join(ckpt_dir, f"model_{e}.ckpt"), params)
        save_checkpoint(os.path.join(ckpt_dir, "latest.ckpt"), params)
        save_checkpoint(os.path.join(ckpt_dir, "latest_optim.ckpt"), opt_state)
        _plot_losses(history, os.path.join(cfg.out_dir, "loss.png"))
    return params, opt_state, history


def _plot_losses(history: dict, path: str) -> None:
    """Per-epoch train/valid loss plot (`src/train.py:246-258`)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return
    plt.figure(figsize=(20, 5))
    plt.plot(history["train"], label="train")
    if history.get("valid"):
        plt.plot(history["valid"], label="valid")
    plt.legend()
    plt.savefig(path, dpi=150)
    plt.close()
