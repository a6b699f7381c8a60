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


def _lift_dense0(state, tgt):
    """Migrate pre-r3 GNN checkpoints: the Propagator modules used to hold
    their parameters in a `Dense_0` submodule ({'Dense_0': {kernel, bias}});
    they are now top-level ({kernel, bias}). Lift each such subtree wherever
    the target expects flat kernel/bias so old `latest.ckpt` files restore."""
    if not isinstance(state, dict):
        return state
    if ("Dense_0" in state and isinstance(tgt, dict)
            and "Dense_0" not in tgt and "kernel" in tgt):
        inner = state["Dense_0"]
        state = {**{k: v for k, v in state.items() if k != "Dense_0"}, **inner}
    return {
        k: _lift_dense0(v, tgt.get(k) if isinstance(tgt, dict) else None)
        for k, v in state.items()
    }


def load_checkpoint(path: str, target):
    """Restore into a pytree with the same structure as ``target``.
    Falls back to a structure-migration pass (`_lift_dense0`) for
    checkpoints written before the Propagator param-tree rename."""
    with open(path, "rb") as f:
        data = f.read()
    try:
        return flax.serialization.from_bytes(target, data)
    except (ValueError, KeyError):
        state = flax.serialization.msgpack_restore(data)
        tgt_state = flax.serialization.to_state_dict(jax.device_get(target))
        state = _lift_dense0(state, tgt_state)
        return flax.serialization.from_state_dict(target, state)
