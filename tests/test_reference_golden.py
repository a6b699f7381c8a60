"""External golden: fit the REFERENCE's bundled demo scene (VERDICT r1 #9).

`/root/reference/assets/demo` is real captured data shipped with the
reference (4x 640x480 RealSense views + fused pcd + calibration,
`src/demo.py:125-135`). Fitting it and pinning per-camera PSNR lower bounds
anchors the rasterizer + online trainer against data that shares NO code
with our oracle. Opt-in (GSDX_SLOW=1): a reduced-iteration fit takes minutes
on CPU, seconds on TPU. Measured anchors: 300 iters on TPU v5e reach
>= 26 dB on every camera (full 10k-iter fits reach 28-33 dB, PARITY.md).
"""

import os

import numpy as np
import pytest

ASSETS = "/root/reference/assets/demo"

pytestmark = pytest.mark.skipif(
    not os.environ.get("GSDX_SLOW"),
    reason="opt-in slow golden (set GSDX_SLOW=1)",
)


def test_reference_demo_scene_fit_psnr():
    from PIL import Image

    from gsdx.io.ply import load_ply
    from gsdx.track.online import OnlineGSConfig, OnlineGSTrainer

    pts, cols = load_ply(os.path.join(ASSETS, "pcd.ply"))
    imgs, masks = [], []
    for v in range(4):
        img = np.asarray(
            Image.open(os.path.join(ASSETS, f"img_{v}.png"))
        ).astype(np.float32)[..., :3] / 255.0
        mask = np.asarray(
            Image.open(os.path.join(ASSETS, f"mask_{v}.png"))
        ).astype(np.float32)
        if mask.ndim == 3:
            mask = mask[..., 0]
        mask = mask / max(mask.max(), 1e-6)
        imgs.append(img * mask[..., None])
        masks.append(mask)
    R_list = np.load(os.path.join(ASSETS, "R_list.npy"))
    t_list = np.load(os.path.join(ASSETS, "t_list.npy"))
    intr_list = np.load(os.path.join(ASSETS, "intr_list.npy"))

    gs = OnlineGSTrainer(OnlineGSConfig(num_iters=300))
    gs.update_state(pts, cols if cols is not None else np.full_like(pts, 0.5),
                    imgs, masks, list(R_list), list(t_list), list(intr_list))
    gs.train(progress=True)

    import jax

    p = gs.params
    live = np.asarray(p.live) > 0
    rv = {
        "means3D": np.asarray(p.means3d)[live],
        "colors_precomp": np.asarray(p.rgb_colors)[live],
        "rotations": np.asarray(p.unnorm_rotations)[live],
        "opacities": np.asarray(jax.nn.sigmoid(p.logit_opacities))[live],
        "scales": np.exp(np.asarray(p.log_scales))[live],
    }
    psnrs = []
    for c in range(4):
        im, _ = gs.render(rv, c, bg=(0, 0, 0))
        target = np.asarray(imgs[c]).transpose(2, 0, 1)
        mse = float(np.mean((np.asarray(im) - target) ** 2))
        psnrs.append(-10.0 * np.log10(mse + 1e-12))
    print("per-camera PSNR:", [round(x, 2) for x in psnrs])
    # anchor: every camera must clear the bound measured on real hardware
    assert min(psnrs) >= 24.0, psnrs
