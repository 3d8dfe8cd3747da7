"""mAP@50 evaluator tests on hand-worked cases."""
import numpy as np
import pytest

from vision_conglomerate_tpu.tools.map_eval import average_precision, compute_map50


def test_perfect_detection_map_1():
    gt = [(np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], float), np.asarray([0, 1]))]
    preds = [(np.asarray([[0, 0, 10, 10], [20, 20, 40, 40]], float),
              np.asarray([0.9, 0.8]), np.asarray([0, 1]))]
    out = compute_map50(preds, gt, num_classes=2)
    assert out["map"] == pytest.approx(1.0)
    np.testing.assert_allclose(out["ap_per_class"], [1.0, 1.0])


def test_no_detections_map_0():
    gt = [(np.asarray([[0, 0, 10, 10]], float), np.asarray([0]))]
    preds = [(np.zeros((0, 4)), np.zeros(0), np.zeros(0, int))]
    out = compute_map50(preds, gt, num_classes=1)
    assert out["map"] == pytest.approx(0.0)


def test_false_positive_lowers_ap():
    gt = [(np.asarray([[0, 0, 10, 10]], float), np.asarray([0]))]
    # one matching det (lower score) + one high-score FP far away
    preds = [(np.asarray([[100, 100, 110, 110], [0, 0, 10, 10]], float),
              np.asarray([0.9, 0.8]), np.asarray([0, 0]))]
    out = compute_map50(preds, gt, num_classes=1)
    # PR: first det FP (p=0, r=0), second TP (p=0.5, r=1) -> AP = 0.5
    assert out["map"] == pytest.approx(0.5)


def test_duplicate_detection_counts_as_fp():
    gt = [(np.asarray([[0, 0, 10, 10]], float), np.asarray([0]))]
    preds = [(np.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], float),
              np.asarray([0.9, 0.8]), np.asarray([0, 0]))]
    out = compute_map50(preds, gt, num_classes=1)
    assert out["map"] == pytest.approx(1.0)  # dup is FP after recall=1 -> AP unaffected


def test_iou_threshold_matters():
    gt = [(np.asarray([[0, 0, 10, 10]], float), np.asarray([0]))]
    # IoU = 60/140 = 0.43: x shifted by 4
    preds = [(np.asarray([[4, 0, 14, 10]], float), np.asarray([0.9]), np.asarray([0]))]
    out50 = compute_map50(preds, gt, num_classes=1)
    assert out50["map"] == pytest.approx(0.0)
    from vision_conglomerate_tpu.tools.map_eval import compute_map
    out25 = compute_map(preds, gt, num_classes=1, iou_threshold=0.25)
    assert out25["map"] == pytest.approx(1.0)


def test_average_precision_envelope():
    # zigzag precision gets enveloped
    recall = np.asarray([0.5, 0.5, 1.0])
    precision = np.asarray([1.0, 0.5, 0.6])
    ap = average_precision(recall, precision)
    assert ap == pytest.approx(0.5 * 1.0 + 0.5 * 0.6)
