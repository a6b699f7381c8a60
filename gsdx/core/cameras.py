"""Camera model for Gaussian-splat rendering.

The reference builds an OpenGL projection matrix and a
``GaussianRasterizationSettings`` struct from pinhole intrinsics K and a
world-to-camera matrix (`src/tracking/helpers.py:10-33`,
`src/render/renderer.py:25-50`). Its net pixel mapping reduces to

    p_cam = w2c @ p_world
    pix_x = fx * x/z + cx - 0.5
    pix_y = fy * y/z + cy - 0.5
    depth = z

(the -0.5 comes from the CUDA ``ndc2Pix`` convention). We keep the pinhole
parameters directly instead of carrying the matrix product, which is both
simpler and avoids a needless 4x4 matmul chain per Gaussian.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class Camera:
    """Static pinhole camera for rasterization.

    Attributes:
      w2c: (4, 4) world-to-camera (OpenCV convention: +z forward into screen).
      fx, fy, cx, cy: pinhole intrinsics in pixels.
      width, height: image size in pixels (static python ints).
      near, far: clip planes; near-culling uses ``near`` against camera z.
      bg: (3,) background color composited against residual transmittance.
      cam_id: integer camera index (for per-camera affine color correction).
    """

    w2c: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    bg: jnp.ndarray
    cam_id: jnp.ndarray
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)
    near: float = flax.struct.field(pytree_node=False)
    far: float = flax.struct.field(pytree_node=False)

    @property
    def tan_fovx(self) -> jnp.ndarray:
        return self.width / (2.0 * self.fx)

    @property
    def tan_fovy(self) -> jnp.ndarray:
        return self.height / (2.0 * self.fy)

    @property
    def cam_center(self) -> jnp.ndarray:
        """Camera position in world coordinates."""
        R = self.w2c[:3, :3]
        t = self.w2c[:3, 3]
        return -R.T @ t


def make_camera(
    k,
    w2c,
    width: int = 1280,
    height: int = 720,
    near: float = 0.01,
    far: float = 100.0,
    bg=(0.0, 0.0, 0.0),
    cam_id: int = 0,
) -> Camera:
    """Build a Camera from a 3x3 intrinsics matrix and a 4x4 w2c extrinsic.

    Mirrors `setup_camera` (`src/tracking/helpers.py:10-33`): K's (0,0),
    (1,1), (0,2), (1,2) entries become fx, fy, cx, cy; near/far default to the
    offline-render values (`src/render/renderer.py:9-10`); tracking datasets
    use near=1.0 (`src/tracking/train_utils.py:59`).
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    w2c = jnp.asarray(w2c, dtype=jnp.float32)
    return Camera(
        w2c=w2c,
        fx=k[0, 0],
        fy=k[1, 1],
        cx=k[0, 2],
        cy=k[1, 2],
        bg=jnp.asarray(bg, dtype=jnp.float32),
        cam_id=jnp.asarray(cam_id, dtype=jnp.int32),
        width=int(width),
        height=int(height),
        near=float(near),
        far=float(far),
    )


def opencv_to_opengl_w2c(w2c_opencv: np.ndarray) -> np.ndarray:
    """OpenCV <-> OpenGL extrinsics flip (`src/data/utils.py:118-131`)."""
    flip = np.diag([1.0, -1.0, -1.0, 1.0])
    return np.asarray(w2c_opencv) @ flip
