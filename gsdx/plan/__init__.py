from gsdx.plan.actions import (
    angle_normalize,
    clip_actions,
    decode_action,
    optimize_action_mppi,
    sample_action_seq,
)
from gsdx.plan.planner import MPPIConfig, Planner
from gsdx.plan.cost import running_cost
from gsdx.plan.dynamics_rollout import make_batched_rollout

__all__ = [
    "angle_normalize",
    "clip_actions",
    "decode_action",
    "optimize_action_mppi",
    "sample_action_seq",
    "MPPIConfig",
    "Planner",
    "running_cost",
    "make_batched_rollout",
]
