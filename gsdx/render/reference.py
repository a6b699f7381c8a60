"""Dense reference renderer — slow, exact, differentiable. Test oracle only.

Composites every Gaussian against every pixel with strict front-to-back
sequential semantics matching the CUDA reference renderer
(`diff-gaussian-rasterization-w-depth`): depth sort, alpha = min(0.99,
opacity * exp(power)), skip power > 0 and alpha < 1/255, terminate a pixel
once transmittance would drop below 1e-4. O(N * H * W) memory/compute — use
only on tiny scenes in tests. Being pure jnp it is differentiable, so
jax.grad of a loss through this renderer provides reference gradients for the
Pallas production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gsdx.core.cameras import Camera
from gsdx.render.projection import project_gaussians

ALPHA_MIN = 1.0 / 255.0
T_STOP = 1e-4
ALPHA_MAX = 0.99


def render_reference(
    means3d: jnp.ndarray,
    quats: jnp.ndarray,
    scales: jnp.ndarray,
    opacities: jnp.ndarray,
    colors: jnp.ndarray,
    camera: Camera,
    live: jnp.ndarray | None = None,
    mean2d_offset: jnp.ndarray | None = None,
    strict_t_stop: bool = True,
):
    """Render (im (3,H,W), radius (N,), depth (H,W), final_T (H,W)).

    ``mean2d_offset`` is an (N, 2) zeros array whose gradient equals the
    screen-space positional gradient (the reference's ``means2D`` dummy,
    `src/tracking/helpers.py:43`).

    ``strict_t_stop``: emulate the CUDA early-termination (contributions are
    cut once transmittance crosses 1e-4). The production compositor omits the
    cut (error <= 1e-4); set False to compare against it at tight tolerances.
    """
    proj = project_gaussians(means3d, quats, scales, camera, live=live)
    mean2d = proj.mean2d
    if mean2d_offset is not None:
        mean2d = mean2d + mean2d_offset

    H, W = camera.height, camera.width
    N = means3d.shape[0]

    order = jnp.argsort(jnp.where(proj.mask, proj.depth, jnp.inf))
    mean2d_s = mean2d[order]
    conic_s = proj.conic[order]
    depth_s = proj.depth[order]
    mask_s = proj.mask[order]
    op_s = opacities.reshape(N)[order]
    col_s = colors[order]

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)

    dx = px[None] - mean2d_s[:, 0][:, None, None]  # (N, H, W)
    dy = py[None] - mean2d_s[:, 1][:, None, None]
    a, b, c = conic_s[:, 0], conic_s[:, 1], conic_s[:, 2]
    power = (
        -0.5 * (a[:, None, None] * dx * dx + c[:, None, None] * dy * dy)
        - b[:, None, None] * dx * dy
    )
    alpha = jnp.minimum(ALPHA_MAX, op_s[:, None, None] * jnp.exp(power))
    alpha = jnp.where((power > 0) | (alpha < ALPHA_MIN), 0.0, alpha)
    alpha = alpha * mask_s[:, None, None]

    # Transmittance before each Gaussian (exclusive product of (1 - alpha)).
    log_one_minus = jnp.log1p(-alpha)
    cum = jnp.cumsum(log_one_minus, axis=0)
    log_T_before = jnp.concatenate([jnp.zeros_like(cum[:1]), cum[:-1]], axis=0)
    T_before = jnp.exp(log_T_before)

    if strict_t_stop:
        # CUDA semantics: the Gaussian that would push T below 1e-4 and all
        # subsequent ones are dropped; T freezes at its pre-cut value.
        cut = T_before * (1.0 - alpha) < T_STOP
        ever_cut = jnp.cumsum(cut.astype(jnp.int32), axis=0) > 0
        alpha = jnp.where(ever_cut, 0.0, alpha)
        log_one_minus = jnp.log1p(-alpha)
        cum = jnp.cumsum(log_one_minus, axis=0)
        log_T_before = jnp.concatenate(
            [jnp.zeros_like(cum[:1]), cum[:-1]], axis=0
        )
        T_before = jnp.exp(log_T_before)

    w = alpha * T_before  # (N, H, W)
    rgb = jnp.einsum("nhw,nc->chw", w, col_s)
    depth = jnp.einsum("nhw,n->hw", w, depth_s)
    final_T = jnp.exp(cum[-1])
    im = rgb + final_T[None] * camera.bg[:, None, None]
    return im, proj.radius, depth, final_T
