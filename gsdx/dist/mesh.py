"""Device mesh + multi-host init.

The reference is single-process single-GPU with no distributed backend
(SURVEY.md §2.8). This layer is the framework's explicit scale-out story:
a `jax.sharding.Mesh` whose axes are

  data — episodes/graph batches (GNN training), MPPI samples
  tile — image tiles (rasterization) / camera views (tracking)

Collectives are inserted by XLA from sharding annotations (psum of grads
rides ICI within a slice, DCN across hosts via jax.distributed).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host init (`jax.distributed.initialize`). No-op single-host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )


def get_mesh(axes: Sequence[tuple[str, int]] | None = None,
             devices=None) -> Mesh:
    """Build a mesh; default: all devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if axes is None:
        axes = [("data", len(devices))]
    names = [a[0] for a in axes]
    sizes = [a[1] for a in axes]
    assert int(np.prod(sizes)) == len(devices), (
        f"mesh {sizes} != {len(devices)} devices"
    )
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
