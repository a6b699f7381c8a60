"""Automated CPU-sized DemoSession e2e: fit -> click -> rollout -> video.

Drives the reference demo flow (`src/demo.py:95-586`) end to end on the
built-in synthetic scene with a tiny GS-iteration budget and a small
random-init GNN — asserting the full pipeline (online GS fit, click-to-world,
GNN rollout, skinning, rendering, video + .splat export) produces artifacts.
"""

import os

import numpy as np
import pytest

from gsdx.apps.demo import DemoSession

TINY_CFG = """
train_config:
  out_dir: "{out_dir}"
  phases: ["train"]
  batch_size: 2
  n_epochs: 1
  n_iters_per_epoch:
    train: 1
  n_his: 2
  n_future: 2

model_config:
  nf_particle: 32
  nf_relation: 32
  nf_effect: 32
  n_his: 2

dataset_config:
  datasets:
    - name: "episodes_rope"
      materials: ["rope"]
      connect_all: False
      base_dir: "data/d3dg"
      fps_radius_range: [0.03, 0.03]
      adj_radius_range: [0.08, 0.08]
      topk: 3
      max_nobj: 24
      max_tool: 1
      max_nR: 96
"""


pytestmark = pytest.mark.slow  # heavyweight e2e (default tier excludes; --runslow)


def test_demo_session_end_to_end(tmp_path):
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_CFG.format(out_dir=str(tmp_path / "log")))
    out_dir = str(tmp_path / "demo_out")

    session = DemoSession(str(cfg_path), assets=None, out_dir=out_dir,
                          gs_iters=12)
    session.reset(train_gs=True)
    assert session.particle_pos.shape[0] > 0
    assert np.isfinite(session.particle_pos).all()

    # click a push across the synthetic rope (camera 0, 320x240 views)
    action, rendervars, frames = session.run_sim((120, 120), (200, 130))
    assert action.shape == (2, 3)
    assert len(rendervars) >= 2 and len(frames) == len(rendervars)
    h, w, _ = frames[0].shape
    assert (h, w) == (240, 320)
    assert all(np.isfinite(f).all() for f in frames)
    # mp4 when an encoder exists, gif fallback otherwise (no ffmpeg here)
    import glob

    vids = glob.glob(os.path.join(out_dir, "sim_cam0.*"))
    assert vids and os.path.getsize(vids[0]) > 0

    splat = session.export_splat()
    assert os.path.exists(splat) and os.path.getsize(splat) > 0
