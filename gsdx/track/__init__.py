from gsdx.track.losses import (
    LossWeights,
    calc_psnr,
    calc_ssim,
    l1_loss,
    tracking_loss,
)
from gsdx.track.optimizer import GroupAdam, tracking_lrs
from gsdx.track.densify import DensifyConfig, densify_step
from gsdx.track.trainer import TrackingConfig, make_fit_timestep, track_sequence

__all__ = [
    "LossWeights",
    "calc_psnr",
    "calc_ssim",
    "l1_loss",
    "tracking_loss",
    "GroupAdam",
    "tracking_lrs",
    "DensifyConfig",
    "densify_step",
    "TrackingConfig",
    "make_fit_timestep",
    "track_sequence",
]
