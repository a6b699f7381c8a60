"""Perception: masks -> fused multi-view tabletop point cloud.

Re-implements `PerceptionModule` (`src/real_world/utils/perception_module.py:
18-236`) with the open-vocabulary detector/segmenter (GroundingDINO + SAM,
external checkpoints — SURVEY §2.7 N8) behind a pluggable provider
interface. The geometric pipeline — unproject, world transform, workspace
crop, voxel downsample, iterative outlier removal — runs on device via
`gsdx.core.pointcloud`.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gsdx.core.pointcloud import (
    statistical_outlier_mask,
    voxel_downsample,
)
from gsdx.realworld.env import WORKSPACE_BBOX


class SegmentationProvider:
    """Text-prompted instance segmentation interface.

    Implementations: GroundingDINO+SAM (if the checkpoints are available),
    recorded-mask replay, or simple color/depth heuristics for tests.
    """

    def segment(self, image: np.ndarray, prompt: str) -> np.ndarray:
        """(H, W, 3) u8 -> (H, W) bool object mask."""
        raise NotImplementedError


class ThresholdSegmenter(SegmentationProvider):
    """Depth/color-threshold segmenter — the fake provider for robotless
    runs: foreground = pixels that differ from the background color."""

    def __init__(self, bg_color=(0.7, 0.7, 0.7), tol: float = 0.12):
        self.bg = np.asarray(bg_color, np.float32) * 255
        self.tol = tol * 255

    def segment(self, image: np.ndarray, prompt: str = "") -> np.ndarray:
        diff = np.abs(image.astype(np.float32) - self.bg[None, None]).max(-1)
        return diff > self.tol


class PerceptionModule:
    def __init__(self, segmenter: Optional[SegmentationProvider] = None,
                 bbox: np.ndarray = WORKSPACE_BBOX,
                 voxel_size: float = 0.005, max_points: int = 20000):
        self.segmenter = segmenter or ThresholdSegmenter()
        self.bbox = np.asarray(bbox, np.float32)
        self.voxel_size = voxel_size
        self.max_points = max_points

    def get_tabletop_points(
        self,
        colors: np.ndarray,  # (C, H, W, 3) u8
        depths: np.ndarray,  # (C, H, W) u16 mm or float m
        intrinsics: List[np.ndarray],
        R_list: List[np.ndarray],  # cam->world rotations
        t_list: List[np.ndarray],
        prompt: str = "object",
        obj_names: Optional[List[str]] = None,
        return_imgs: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Fused object point cloud (`get_tabletop_points`,
        `perception_module.py:128-236`): per-view mask -> unproject ->
        world -> bbox crop -> voxel downsample 5mm -> iterative statistical
        outlier removal. Returns (points (M,3), colors (M,3) in [0,1]).

        With ``obj_names`` and an instance-capable segmenter (grounded-SAM),
        the per-view filter is the reference's table-subtraction: keep
        everything except the table mask minus the object masks
        (`perception_module.py:183-199`); otherwise the provider's single
        object mask is used directly.
        """
        pts_all, col_all, mask_all = [], [], []
        use_table_flow = obj_names and hasattr(self.segmenter,
                                               "table_object_masks")
        for c in range(len(colors)):
            if use_table_flow:
                _, _, mask = self.segmenter.table_object_masks(
                    colors[c], obj_names)
            else:
                mask = self.segmenter.segment(colors[c], prompt)
            mask_all.append(np.asarray(mask, bool))
            depth = depths[c].astype(np.float32)
            if depths[c].dtype == np.uint16:
                depth = depth / 1000.0
            k = np.asarray(intrinsics[c], np.float32)
            H, W = depth.shape
            ys, xs = np.mgrid[0:H, 0:W]
            z = depth
            x = (xs - k[0, 2]) * z / k[0, 0]
            y = (ys - k[1, 2]) * z / k[1, 1]
            pts_cam = np.stack([x, y, z], -1).reshape(-1, 3)
            valid = (mask & (depth > 1e-4)).reshape(-1)
            pts_w = pts_cam[valid] @ np.asarray(R_list[c]).T + np.asarray(
                t_list[c])[None]
            cols = colors[c].reshape(-1, 3)[valid].astype(np.float32) / 255.0
            inb = np.all(
                (pts_w >= self.bbox[:, 0][None])
                & (pts_w <= self.bbox[:, 1][None]), axis=-1
            )
            pts_all.append(pts_w[inb])
            col_all.append(cols[inb])
        pts = np.concatenate(pts_all, axis=0)
        cols = np.concatenate(col_all, axis=0)
        if len(pts) == 0:
            if return_imgs:
                return pts, cols, list(colors), mask_all
            return pts, cols

        # fixed-capacity device pipeline
        cap = int(2 ** np.ceil(np.log2(max(len(pts), 2))))
        pts_pad = np.zeros((cap, 3), np.float32)
        pts_pad[: len(pts)] = pts
        valid = np.zeros((cap,), bool)
        valid[: len(pts)] = True
        down, mask_v = voxel_downsample(
            jnp.asarray(pts_pad), self.voxel_size, self.max_points,
            valid=jnp.asarray(valid),
        )
        down_np = np.asarray(down)[np.asarray(mask_v)]

        keep = np.ones(len(down_np), bool)
        for it in range(5):
            m = statistical_outlier_mask(
                jnp.asarray(down_np), 25, 2.0 + 0.5 * it,
                valid=jnp.asarray(keep),
            )
            m = np.asarray(m)
            if (m == keep).all():
                break
            keep = m
        final_pts = down_np[keep]
        # nearest original color per voxel point
        if len(final_pts) and len(pts):
            from scipy.spatial import cKDTree

            tree = cKDTree(pts)
            _, idx = tree.query(final_pts, k=1)
            final_cols = cols[idx]
        else:
            final_cols = np.zeros((0, 3), np.float32)
        if return_imgs:
            return final_pts, final_cols, list(colors), mask_all
        return final_pts, final_cols

    def get_tabletop_points_env(self, env, prompt: str = "object",
                                return_imgs: bool = False):
        """Convenience: perceive straight from an Env (`perception_module.py`
        `get_tabletop_points_env`). With ``return_imgs`` also returns the
        per-view color images (u8) and boolean object masks."""
        obs = env.get_obs(get_color=True, get_depth=True)
        R_list, t_list = env.get_extrinsics()
        return self.get_tabletop_points(
            obs["color"], obs["depth"], env.get_intrinsics(), R_list, t_list,
            prompt=prompt, return_imgs=return_imgs,
        )
