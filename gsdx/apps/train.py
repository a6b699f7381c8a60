"""GNN dynamics training CLI (reference `src/train.py:264-271`).

Usage: python -m gsdx.apps.train --config configs/rope.yaml [--dp]
  --dp shards graph batches over all local devices (data parallel).
"""

from __future__ import annotations

import argparse
import glob
import os
from pathlib import Path

import numpy as np


def load_episode_store(raw_cfg: dict, cfg, phase: str):
    """Build an EpisodeStore from preprocessed episodes
    (`DynDataset.__init__`, `src/data/dataset.py:240-330`): 80/20 episode
    split, out-of-range pair filtering."""
    import yaml

    from gsdx.graph.dataset import EpisodeStore
    from gsdx.io.episodes import eef_world_positions, load_metadata

    ds = raw_cfg["dataset_config"]["datasets"][0]
    base = Path(ds["base_dir"])
    name = ds["name"]
    data_root = base / "data" / name
    out_root = base / "ckpts" / f"exp_{name}"
    prep_root = base / "preprocessed" / f"exp_{name}"

    episodes = sorted(glob.glob(str(prep_root / "episode_*")))
    idxs = [int(e.split("_")[-1]) for e in episodes]
    ratio = 0.8
    cut = int(len(idxs) * ratio)
    idxs = idxs[:cut] if phase == "train" else idxs[cut:]

    particle_list, eef_list, pair_list = [], [], []
    for idx in idxs:
        out_dir = out_root / f"episode_{idx:02d}" / name / f"episode_{idx:02d}"
        xyz = np.load(out_dir / "param_downsampled.npy")
        meta = load_metadata(str(out_dir / "metadata.json"))
        eef = eef_world_positions(str(data_root / f"episode_{idx:02d}"), meta)
        pairs = np.loadtxt(
            prep_root / f"episode_{idx:02d}" / "frame_pairs" / f"{idx}.txt"
        ).astype(np.int64)
        pairs = pairs[pairs.max(1) < len(xyz)]
        ep_col = np.full((len(pairs), 1), len(particle_list), np.int64)
        pair_list.append(np.concatenate([ep_col, pairs], axis=1))
        particle_list.append(xyz)
        eef_list.append(eef)
    return EpisodeStore.from_numpy(particle_list, eef_list, pair_list)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--dp", action="store_true", help="data-parallel over mesh")
    args = p.parse_args(argv)

    import yaml

    from gsdx.dynamics.model import DynamicsPredictor
    from gsdx.dynamics.train import train_dynamics
    from gsdx.graph.dataset import GraphSampler
    from gsdx.io.config import load_config

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    train_cfg, model_cfg, data_cfg = load_config(args.config)

    train_store = load_episode_store(raw, data_cfg, "train")
    valid_store = load_episode_store(raw, data_cfg, "valid")
    train_sampler = GraphSampler(train_store, data_cfg, "train")
    valid_sampler = GraphSampler(valid_store, data_cfg, "valid")

    if args.dp:
        import jax

        from gsdx.dist.mesh import get_mesh
        from gsdx.dist.train_dp import make_dp_train_step, shard_batch
        from gsdx.dynamics.train import init_params
        from gsdx.io.checkpoint import save_checkpoint

        mesh = get_mesh()
        model = DynamicsPredictor(model_cfg)
        key = jax.random.PRNGKey(train_cfg.random_seed)
        params = init_params(model, train_cfg, data_cfg, key)
        step, tx = make_dp_train_step(model, train_cfg, mesh)
        opt_state = tx.init(params)
        os.makedirs(os.path.join(train_cfg.out_dir, "checkpoints"), exist_ok=True)
        for epoch in range(train_cfg.n_epochs):
            for i in range(train_cfg.n_iters_per_epoch_train):
                key, sub = jax.random.split(key)
                batch = shard_batch(
                    train_sampler.sample(sub, train_cfg.batch_size), mesh
                )
                params, opt_state, loss, _ = step(params, opt_state, batch)
            print(f"epoch {epoch} loss {float(loss):.6f}")
            save_checkpoint(
                os.path.join(train_cfg.out_dir, "checkpoints", "latest.ckpt"),
                params,
            )
    else:
        train_dynamics(train_sampler, valid_sampler, model_cfg, train_cfg)


if __name__ == "__main__":
    main()
