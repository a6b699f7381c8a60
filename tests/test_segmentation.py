"""Grounded-SAM segmentation provider: mask logic unit tests with mocked
detector/segmenter outputs (checkpoints are external — SURVEY §2.7 N8;
behavior matched to `src/real_world/utils/perception_module.py:53-199`)."""

import numpy as np
import pytest

from gsdx.realworld.perception import PerceptionModule, ThresholdSegmenter
from gsdx.realworld.segmentation import (
    GroundedSAMSegmenter,
    SegmenterConfig,
    aggregate_instance_mask,
    boxes_cxcywh_to_xyxy,
    combine_table_object_masks,
    dedup_masks_by_iou,
    make_segmenter,
    normalize_captions,
)


def _rect(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_normalize_captions():
    assert normalize_captions([" Rope", "table.", "RED cube "]) == [
        "rope.", "table.", "red cube."]


def test_boxes_cxcywh_to_xyxy():
    boxes = np.array([[0.5, 0.5, 0.5, 0.25]])  # centered half-width box
    out = boxes_cxcywh_to_xyxy(boxes, width=200, height=100)
    np.testing.assert_allclose(out, [[50.0, 37.5, 150.0, 62.5]])


def test_dedup_keeps_higher_score():
    a = _rect(10, 10, 0, 5, 0, 10)
    b = a.copy()  # IoU 1.0 duplicate
    c = _rect(10, 10, 5, 10, 0, 10)  # disjoint
    keep = dedup_masks_by_iou(np.stack([a, b, c]), np.array([0.4, 0.9, 0.5]))
    np.testing.assert_array_equal(keep, [1, 2])  # b beats a, c kept
    keep = dedup_masks_by_iou(np.stack([a, b, c]), np.array([0.9, 0.4, 0.5]))
    np.testing.assert_array_equal(keep, [0, 2])


def test_dedup_partial_overlap_below_threshold():
    a = _rect(10, 10, 0, 6, 0, 10)
    b = _rect(10, 10, 4, 10, 0, 10)  # IoU = 2/10
    keep = dedup_masks_by_iou(np.stack([a, b]), np.array([0.9, 0.1]))
    np.testing.assert_array_equal(keep, [0, 1])


def test_combine_table_object_masks():
    table = _rect(8, 8, 0, 8, 0, 8)
    obj = _rect(8, 8, 2, 4, 2, 4)
    mt, mo, keep = combine_table_object_masks(
        np.stack([table, obj]), ["table", "rope"], ["rope"])
    assert not mt[3, 3] and mo[3, 3]  # object subtracted from table
    assert mt[0, 0] and not mo[0, 0]
    np.testing.assert_array_equal(keep, ~mt)  # object+background kept
    assert keep[3, 3] and not keep[0, 0]


def test_aggregate_instance_mask_overwrites():
    a = _rect(6, 6, 0, 4, 0, 4)
    b = _rect(6, 6, 2, 6, 2, 6)
    agg = aggregate_instance_mask(np.stack([a, b]))
    assert agg[0, 0] == 1 and agg[3, 3] == 2 and agg[5, 5] == 2
    assert agg[5, 0] == 0


class MockedSegmenter(GroundedSAMSegmenter):
    """Deterministic stand-in for the torch models: 'table' fills the frame,
    any other prompt detects a centered box; duplicate low-score detection
    exercises the dedup path."""

    def _ensure_models(self):  # never import torch
        pass

    def _run_dino(self, image, captions):
        boxes, scores, labels = [], [], []
        for i, cap in enumerate(captions):
            if cap == "table.":
                boxes.append([0.5, 0.5, 1.0, 1.0])
                scores.append(0.8)
                labels.append(i)
            else:
                boxes.append([0.5, 0.5, 0.5, 0.5])
                scores.append(0.9)
                labels.append(i)
                boxes.append([0.5, 0.5, 0.52, 0.52])  # near-duplicate
                scores.append(0.4)
                labels.append(i)
        return (np.array(boxes, np.float32), np.array(scores, np.float32),
                np.array(labels, np.int64))

    def _run_sam(self, image, boxes_xyxy):
        h, w = image.shape[:2]
        masks = []
        for x0, y0, x1, y1 in boxes_xyxy:
            m = np.zeros((h, w), bool)
            m[int(max(y0, 0)):int(min(y1, h)),
              int(max(x0, 0)):int(min(x1, w))] = True
            masks.append(m)
        return np.stack(masks)


def test_mocked_segment_instances_dedups_and_labels():
    seg = MockedSegmenter(SegmenterConfig())
    img = np.zeros((40, 80, 3), np.uint8)
    masks, labels, scores = seg.segment_instances(img, ["Rope"])
    assert masks.shape[0] == 1  # near-duplicate removed
    assert labels == ["rope"]
    assert scores[0] == pytest.approx(0.9)
    # centered half-size box
    assert masks[0, 20, 40] and not masks[0, 0, 0]


def test_mocked_segment_union_contract():
    seg = MockedSegmenter(SegmenterConfig())
    img = np.zeros((40, 80, 3), np.uint8)
    mask = seg.segment(img, "rope")
    assert mask.dtype == bool and mask.shape == (40, 80)
    assert mask[20, 40] and not mask[0, 0]


def test_mocked_table_object_masks():
    seg = MockedSegmenter(SegmenterConfig())
    img = np.zeros((40, 80, 3), np.uint8)
    mt, mo, keep = seg.table_object_masks(img, ["rope"])
    assert mo[20, 40] and not mt[20, 40]  # object cut out of table
    assert mt[0, 0]
    assert keep[20, 40] and not keep[0, 0]


def test_perception_module_uses_table_flow():
    """PerceptionModule routes through table_object_masks when obj_names are
    given and the provider supports instances."""
    seg = MockedSegmenter(SegmenterConfig())
    pm = PerceptionModule(segmenter=seg, voxel_size=0.02, max_points=4096)
    H, W = 40, 80
    colors = np.full((1, H, W, 3), 128, np.uint8)
    depth = np.full((1, H, W), 0.8, np.float32)
    k = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], np.float32)
    # camera looking down +z; world == cam, bbox generous
    pm.bbox = np.array([[-2, 2], [-2, 2], [-2, 2]], np.float32)
    pts, cols = pm.get_tabletop_points(
        colors, depth, [k], [np.eye(3)], [np.zeros(3)], obj_names=["rope"])
    assert len(pts) > 0
    # object+background kept; pure-table corner pixels unprojected away
    # (the mocked table spans the frame, objects the center box)
    assert np.isfinite(pts).all() and cols.shape == pts.shape


def test_make_segmenter_falls_back_without_models():
    seg = make_segmenter()
    assert isinstance(seg, ThresholdSegmenter)
    with pytest.raises(Exception):
        make_segmenter(require=True)
