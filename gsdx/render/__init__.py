from gsdx.render.projection import ProjectedGaussians, project_gaussians
from gsdx.render.rasterize import RasterizeConfig, RenderOutput, rasterize, render
from gsdx.render.renderer import Renderer, params_to_rendervar

__all__ = [
    "ProjectedGaussians",
    "project_gaussians",
    "RasterizeConfig",
    "RenderOutput",
    "rasterize",
    "render",
    "Renderer",
    "params_to_rendervar",
]
