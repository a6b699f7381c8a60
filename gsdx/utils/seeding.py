"""Deterministic seeding (reference `src/gnn/utils.py:43-49`).

JAX is deterministic by construction given PRNG keys; this seeds the numpy /
python RNGs used by host-side pipelines (camera schedules, dataset shuffles)
and returns a root JAX key.
"""

from __future__ import annotations

import random

import numpy as np


def set_seed(seed: int):
    random.seed(seed)
    np.random.seed(seed)
    import jax

    return jax.random.PRNGKey(seed)
