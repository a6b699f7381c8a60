from gsdx.core.transforms import (
    quat_normalize,
    quat_multiply,
    quat_conjugate,
    quat_to_rotmat,
    rotmat_to_quat,
)
from gsdx.core.cameras import Camera, make_camera
from gsdx.core.gaussians import GaussianParams, TrackingVariables

__all__ = [
    "quat_normalize",
    "quat_multiply",
    "quat_conjugate",
    "quat_to_rotmat",
    "rotmat_to_quat",
    "Camera",
    "make_camera",
    "GaussianParams",
    "TrackingVariables",
]
