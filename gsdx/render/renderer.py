"""High-level renderer facade (reference `src/render/renderer.py:6-23`)."""

from __future__ import annotations

import jax.numpy as jnp

from gsdx.core.cameras import Camera, make_camera
from gsdx.core.gaussians import GaussianParams
from gsdx.core.transforms import quat_normalize
from gsdx.render.rasterize import RasterizeConfig, rasterize


def params_to_rendervar(params: GaussianParams, seg: bool = False) -> dict:
    """GaussianParams -> rendervar dict (`src/tracking/helpers.py:36-45`).

    seg=True substitutes segmentation colors (`src/tracking/train_utils.py:190`).
    """
    return {
        "means3D": params.means3d,
        "colors_precomp": params.seg_colors if seg else params.rgb_colors,
        "rotations": quat_normalize(params.unnorm_rotations),
        "opacities": params.opacities(),
        "scales": params.scales(),
        "live": params.live,
        "means2D": jnp.zeros_like(params.means3d[:, :2]),
    }


class Renderer:
    """Offline renderer: render one timestep's Gaussians from (w2c, k).

    Mirrors `Renderer.render` (`src/render/renderer.py:18-23`): 1280x720,
    near 0.01 / far 100, default grey background.
    """

    def __init__(self, width: int = 1280, height: int = 720, cfg: RasterizeConfig | None = None):
        self.width = width
        self.height = height
        self.near = 0.01
        self.far = 100.0
        self.cfg = cfg or RasterizeConfig()

    def setup_camera(self, k, w2c, bg=(0.7, 0.7, 0.7)) -> Camera:
        return make_camera(
            k, w2c, width=self.width, height=self.height, near=self.near,
            far=self.far, bg=bg,
        )

    def render(self, w2c, k, timestep_data: dict, bg=(0.7, 0.7, 0.7)):
        """Returns (im (3,H,W), depth (H,W)) like the reference."""
        cam = self.setup_camera(k, w2c, bg=bg)
        out = rasterize(
            timestep_data["means3D"],
            timestep_data["rotations"],
            timestep_data["scales"],
            timestep_data["opacities"],
            timestep_data["colors_precomp"],
            cam,
            self.cfg,
            live=timestep_data.get("live"),
        )
        return out.im, out.depth
