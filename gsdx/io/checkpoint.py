"""Checkpoint serialization for arbitrary pytrees.

Replaces the reference's `torch.save(model.state_dict())`
(`src/train.py:240-243`). Uses flax msgpack serialization: compact,
dependency-free, and structure-checked on restore.
"""

from __future__ import annotations

import os

import flax.serialization
import jax


def save_checkpoint(path: str, tree) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    data = flax.serialization.to_bytes(jax.device_get(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: no torn checkpoints on crash


def load_checkpoint(path: str, target):
    """Restore into a pytree with the same structure as ``target``."""
    with open(path, "rb") as f:
        return flax.serialization.from_bytes(target, f.read())
