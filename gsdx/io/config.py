"""YAML config loading with dataclass validation.

The reference loads raw YAML into nested dicts (`src/train.py:264-271`,
`src/config/*.yaml`). Here the same three blocks (train_config /
model_config / dataset_config) are parsed into the typed configs used across
the framework, with unknown keys rejected loudly instead of silently ignored.
"""

from __future__ import annotations

from typing import Any, Dict

import yaml


def _pick(d: Dict[str, Any], mapping: Dict[str, str], cls, extra=None):
    kwargs = dict(extra or {})
    for yaml_key, field in mapping.items():
        if yaml_key in d:
            v = d[yaml_key]
            kwargs[field] = tuple(v) if isinstance(v, list) else v
    return cls(**kwargs)


def load_config(path: str):
    """Parse a reference-format YAML (e.g. `src/config/rope.yaml`) into
    (TrainConfig, ModelConfig, GraphDatasetConfig)."""
    # Imported here: io.checkpoint is a dependency of dynamics.train, so a
    # top-level import would be circular through gsdx.io.__init__.
    from gsdx.dynamics.model import ModelConfig
    from gsdx.dynamics.train import TrainConfig
    from gsdx.graph.dataset import GraphDatasetConfig

    with open(path) as f:
        raw = yaml.safe_load(f)

    tc = raw.get("train_config", {})
    mc = raw.get("model_config", {})
    dc_all = raw.get("dataset_config", {})
    dc = (dc_all.get("datasets") or [{}])[0]

    train_cfg = _pick(
        tc,
        {
            "batch_size": "batch_size",
            "n_epochs": "n_epochs",
            "log_interval": "log_interval",
            "random_seed": "random_seed",
            "n_his": "n_his",
            "n_future": "n_future",
            "mse_loss": "mse_weight",
            "length_loss": "length_weight",
            "out_dir": "out_dir",
            "dist_thresh": "dist_thresh",
        },
        TrainConfig,
        extra={
            "n_iters_per_epoch_train": tc.get("n_iters_per_epoch", {}).get(
                "train", 100
            ),
            "n_iters_per_epoch_valid": tc.get("n_iters_per_epoch", {}).get(
                "valid", 10
            ),
        },
    )

    model_cfg = _pick(
        mc,
        {
            "nf_particle": "nf_particle",
            "nf_relation": "nf_relation",
            "nf_effect": "nf_effect",
            "attr_dim": "attr_dim",
            "state_dim": "state_dim",
            "action_dim": "action_dim",
            "pstep": "pstep",
            "rel_attr_dim": "rel_attr_dim",
            "rel_group_dim": "rel_group_dim",
            "rel_distance_dim": "rel_distance_dim",
            "motion_dim": "motion_dim",
        },
        ModelConfig,
        extra={"n_his": tc.get("n_his", 3)},
    )

    noise = dc.get("state_noise", {})
    dataset_cfg = _pick(
        dc,
        {
            "max_nobj": "max_nobj",
            "max_tool": "max_tool",
            "max_nR": "max_nR",
            "fps_radius_range": "fps_radius_range",
            "adj_radius_range": "adj_radius_range",
            "topk": "topk",
            "connect_all": "connect_all",
        },
        GraphDatasetConfig,
        extra={
            "n_his": tc.get("n_his", 3),
            "n_future": tc.get("n_future", 5),
            "state_noise_train": noise.get("train", 0.003),
            "state_noise_valid": noise.get("valid", 0.0),
        },
    )
    return train_cfg, model_cfg, dataset_cfg
