"""Per-group Adam with densification surgery hooks.

The reference drives tracking with torch Adam over named param groups, each
with its own lr (`initialize_optimizer`, `src/tracking/train_utils.py:152-164`,
eps 1e-15), and mutates optimizer state during densification
(`src/tracking/external.py:145-230`: cat/prune/zero `exp_avg`/`exp_avg_sq`).
Implemented here as a transparent pytree optimizer so densification can
scatter into the moment buffers directly — something optax hides.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from gsdx.core.gaussians import GaussianParams


@flax.struct.dataclass
class AdamState:
    mu: Any  # first-moment pytree, same structure as params
    nu: Any  # second-moment pytree
    count: jnp.ndarray  # scalar int32 step counter


class GroupAdam:
    """Adam(lr per leaf, betas=(0.9, 0.999), eps=1e-15) over a params pytree.

    ``lrs`` is a pytree of scalars matching the params structure (a leaf lr of
    0 freezes that leaf, mirroring the reference's zero-lr groups).
    """

    def __init__(self, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-15):
        self.b1, self.b2, self.eps = b1, b2, eps

    def init(self, params) -> AdamState:
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                         count=jnp.zeros((), jnp.int32))

    def update(self, grads, state: AdamState, params, lrs):
        count = state.count + 1
        b1, b2 = self.b1, self.b2
        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)

        def upd(g, m, v, p, lr):
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            step = lr * (m / bc1) / (jnp.sqrt(v / bc2) + self.eps)
            return p - step, m, v

        flat_g, treedef = jax.tree.flatten(grads)
        flat_m = treedef.flatten_up_to(state.mu)
        flat_v = treedef.flatten_up_to(state.nu)
        flat_p = treedef.flatten_up_to(params)
        flat_lr = treedef.flatten_up_to(lrs)
        outs = [upd(g, m, v, p, lr)
                for g, m, v, p, lr in zip(flat_g, flat_m, flat_v, flat_p, flat_lr)]
        new_p = treedef.unflatten([o[0] for o in outs])
        new_m = treedef.unflatten([o[1] for o in outs])
        new_v = treedef.unflatten([o[2] for o in outs])
        return new_p, AdamState(mu=new_m, nu=new_v, count=count)


def tracking_lrs(scene_radius, post_first_timestep: bool = False) -> GaussianParams:
    """Per-param lrs (`train_utils.py:152-163`); after the first timestep
    opacities/scales/cam/colors freeze (`train_utils.py:370-373`)."""
    s = jnp.asarray(scene_radius, jnp.float32)
    frozen = 0.0
    return GaussianParams(
        means3d=0.00016 * s,
        rgb_colors=0.0,
        seg_colors=0.0,
        unnorm_rotations=0.001,
        logit_opacities=frozen if post_first_timestep else 0.05,
        log_scales=frozen if post_first_timestep else 0.001,
        cam_m=frozen if post_first_timestep else 1e-4,
        cam_c=frozen if post_first_timestep else 1e-4,
        live=0.0,  # never optimized
    )
