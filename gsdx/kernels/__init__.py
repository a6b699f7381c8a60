from gsdx.kernels.composite import (
    FEAT_DIM,
    composite_tiles_pallas,
    composite_tiles_pallas_bwd,
    composite_tiles_xla,
)
from gsdx.kernels.knn import knn
from gsdx.kernels.fps import farthest_point_sampling

__all__ = [
    "FEAT_DIM",
    "composite_tiles_pallas",
    "composite_tiles_pallas_bwd",
    "composite_tiles_xla",
    "knn",
    "farthest_point_sampling",
]
