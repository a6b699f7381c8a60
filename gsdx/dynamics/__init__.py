from gsdx.dynamics.model import DynamicsPredictor, ModelConfig
from gsdx.dynamics.losses import chamfer_distance, emd_distance, hausdorff_distance
from gsdx.dynamics.train import TrainConfig, make_train_step, train_dynamics

__all__ = [
    "DynamicsPredictor",
    "ModelConfig",
    "chamfer_distance",
    "emd_distance",
    "hausdorff_distance",
    "TrainConfig",
    "make_train_step",
    "train_dynamics",
]
