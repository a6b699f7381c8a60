from gsdx.rollout.skinning import interpolate_motions, relations_to_matrix
from gsdx.rollout.dynamics_module import DynamicsModule, RolloutConfig

__all__ = [
    "interpolate_motions",
    "relations_to_matrix",
    "DynamicsModule",
    "RolloutConfig",
]
