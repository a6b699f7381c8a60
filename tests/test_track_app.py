"""End-to-end tracking CLI: synthetic episode directory -> params.npz.

Builds the reference on-disk episode layout (train_meta.json, camera images,
seg masks, init_pt_cld.npz — `assets/datasets.md`) from a rendered synthetic
scene and runs `gsdx.apps.track.main` with a small iteration budget.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsdx.apps.track import main as track_main

from test_tracking import CFG_RASTER, make_cams, make_gt_scene, render_targets

H, W = 32, 64


pytestmark = pytest.mark.slow  # heavyweight e2e (default tier excludes; --runslow)


@pytest.fixture
def episode_dir(tmp_path, rng):
    from PIL import Image

    pt_cld = make_gt_scene(rng, n=40)
    cams = make_cams()
    n_t = 2
    k = np.array([[50.0, 0, W / 2], [0, 50.0, H / 2], [0, 0, 1]], np.float32)
    w2cs = [np.asarray(jax.tree.map(lambda x: x[i], cams).w2c) for i in range(3)]

    fn, ks, w2c_meta = [], [], []
    for t in range(n_t):
        moved = pt_cld.copy()
        moved[:, :3] += np.array([0.01, 0, 0], np.float32) * t
        ims, segs = render_targets(moved, cams)
        row_fn = []
        for c in range(3):
            cam_dir = tmp_path / f"camera_{c}"
            os.makedirs(cam_dir / "seg", exist_ok=True)
            img = (np.clip(np.asarray(ims[c]).transpose(1, 2, 0), 0, 1)
                   * 255).astype(np.uint8)
            Image.fromarray(img).save(cam_dir / f"color_{t:06d}.jpg",
                                      quality=98)
            seg = (np.asarray(segs[c])[0] > 0.5).astype(np.uint8) * 255
            Image.fromarray(seg).save(cam_dir / "seg" / f"seg_{t:06d}.png")
            row_fn.append(f"camera_{c}/color_{t:06d}.jpg")
        fn.append(row_fn)
        ks.append([k.tolist()] * 3)
        w2c_meta.append([w.tolist() for w in w2cs])

    meta = {"w": W, "h": H, "k": ks, "w2c": w2c_meta, "fn": fn,
            "cam_id": [[0, 1, 2]] * n_t}
    with open(tmp_path / "train_meta.json", "w") as f:
        json.dump(meta, f)
    np.savez(tmp_path / "init_pt_cld.npz", data=pt_cld)
    return tmp_path


def test_track_cli_end_to_end(episode_dir, tmp_path):
    out_dir = tmp_path / "out"
    track_main([
        "--sequence", str(episode_dir),
        "--exp_name", "test",
        "--output_dir", str(out_dir),
        "--iters_first", "120",
        "--iters_rest", "60",
        "--num_knn", "4",
    ])
    params_path = (out_dir / "test" / os.path.basename(str(episode_dir))
                   / "params.npz")
    assert params_path.exists()
    params = dict(np.load(params_path))
    # 2 timesteps stacked for the moving fields; static fields unstacked
    assert params["means3D"].ndim == 3 and params["means3D"].shape[0] == 2
    assert params["log_scales"].ndim == 2
    assert np.isfinite(params["means3D"]).all()
    # the snapshot is consumable by the preprocessing downsampler
    from gsdx.io.preprocess import downsample_trajectories

    # after only 120 iters many logit opacities remain at their 0 init and
    # are dropped by the `> 0` opacity filter, so ask for few points
    xyz = downsample_trajectories(params, n_downsample=8, smooth_iters=2)
    assert xyz.shape == (2, 8, 3)
