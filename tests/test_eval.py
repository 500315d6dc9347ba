"""mAP metric tests (tools/eval_coco.py) on constructed cases with known AP."""
import numpy as np

from tools.eval_coco import (average_precision, box_iou_matrix, evaluate,
                             match_detections)


def test_iou_matrix_basics():
    a = np.array([[0, 0, 10, 10]], np.float32)
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]],
                 np.float32)
    iou = box_iou_matrix(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 25 / 175, 0.0], atol=1e-6)


def test_perfect_detector_ap_is_one():
    gt = {0: {0: np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32)}}
    det = {0: {0: (np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
                   np.array([0.9, 0.8]))}}
    res = evaluate(det, gt)
    assert res["mAP50"] == 1.0
    assert res["mAP50_95"] == 1.0


def test_no_detections_ap_zero():
    gt = {0: {0: np.array([[0, 0, 10, 10]], np.float32)}}
    res = evaluate({}, gt)
    assert res["mAP50"] == 0.0


def test_false_positives_reduce_precision():
    gt = {0: {0: np.array([[0, 0, 10, 10]], np.float32)}}
    # one perfect hit at high score, one far-away FP at higher score
    det = {0: {0: (np.array([[50, 50, 60, 60], [0, 0, 10, 10]], np.float32),
                   np.array([0.95, 0.9]))}}
    res = evaluate(det, gt)
    # recall reaches 1.0 but precision at that recall is 0.5
    assert 0.4 < res["mAP50"] < 0.6


def test_localization_quality_separates_thresholds():
    gt = {0: {0: np.array([[0, 0, 100, 100]], np.float32)}}
    det = {0: {0: (np.array([[0, 0, 100, 80]], np.float32),  # IoU = 0.8
                   np.array([0.9]))}}
    res = evaluate(det, gt)
    assert res["mAP50"] == 1.0          # passes 0.5/0.75 thresholds
    assert 0.5 < res["mAP50_95"] < 0.75  # fails at ≥0.85 thresholds


def test_greedy_matching_one_gt_per_det():
    gt_boxes = np.array([[0, 0, 10, 10]], np.float32)
    det_boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    matched = match_detections(det_boxes, np.array([0.9, 0.8]), gt_boxes, 0.5)
    assert matched.tolist() == [True, False]  # second det can't re-match


def test_ap_handles_empty_class():
    assert np.isnan(average_precision(np.zeros(0), np.zeros(0, bool), 0))
    assert average_precision(np.zeros(0), np.zeros(0, bool), 3) == 0.0


def test_multi_class_macro_average():
    gt = {0: {0: np.array([[0, 0, 10, 10]], np.float32),
              1: np.array([[20, 20, 30, 30]], np.float32)}}
    det = {0: {0: (np.array([[0, 0, 10, 10]], np.float32), np.array([0.9])),
               1: (np.array([[90, 90, 99, 99]], np.float32), np.array([0.9]))}}
    res = evaluate(det, gt)
    assert abs(res["mAP50"] - 0.5) < 1e-6  # class 0 AP=1, class 1 AP=0