"""Headless demo session + ply IO."""

import os

import numpy as np

from gsdx.apps.demo import click_to_xyz
from gsdx.io.ply import load_ply, save_ply


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    cols = rng.uniform(size=(50, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "x.ply")
    save_ply(path, pts, cols)
    p2, c2 = load_ply(path)
    np.testing.assert_allclose(p2, pts, atol=1e-6)
    np.testing.assert_allclose(c2, cols, atol=1 / 255.0)


def test_click_to_xyz_identity_camera():
    intr = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    extr = np.eye(4)
    extr[2, 3] = 2.0  # camera at world z = -2 looking toward +z
    # principal-point click must land on the camera axis at the z plane
    p = click_to_xyz(50, 50, intr, extr, z=0.5)
    np.testing.assert_allclose(p[:2], [0, 0], atol=1e-6)
    np.testing.assert_allclose(p[2], 0.5, atol=1e-6)
    # off-center click moves proportionally
    p2 = click_to_xyz(60, 50, intr, extr, z=0.5)
    assert p2[0] > 0
