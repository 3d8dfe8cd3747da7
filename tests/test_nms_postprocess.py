"""NMS / postprocess / heatmap unit tests.

The fixed-point parallel NMS must produce EXACTLY the sequential greedy
keep-set (torchvision semantics) — verified against a plain numpy greedy
implementation on random boxes.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_conglomerate_tpu.ops.heatmap import decode_heatmap_peaks, make_gt_heatmap_np
from vision_conglomerate_tpu.ops.masks import crop_section
from vision_conglomerate_tpu.ops.nms import batched_nms


def _greedy_nms_np(boxes, scores, iou_threshold):
    """Sequential greedy NMS on score-sorted candidates (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if j == i or suppressed[j]:
                continue
            # iou
            x1 = max(boxes[i, 0], boxes[j, 0])
            y1 = max(boxes[i, 1], boxes[j, 1])
            x2 = min(boxes[i, 2], boxes[j, 2])
            y2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0, x2 - x1) * max(0, y2 - y1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a + b - inter + 1e-9)
            if iou > iou_threshold and scores[j] < scores[i]:
                suppressed[j] = True
    return sorted(keep)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_nms_matches_sequential_greedy(seed):
    rng = np.random.default_rng(seed)
    n = 64
    xy = rng.uniform(0, 100, size=(n, 2))
    wh = rng.uniform(5, 40, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
    scores = np.unique(scores)[::-1][:n]  # distinct scores => unambiguous order
    n = len(scores)
    boxes = boxes[:n]

    ref_keep = _greedy_nms_np(boxes, scores, 0.5)

    out = batched_nms(
        jnp.asarray(boxes[None]), jnp.asarray(scores[None]),
        jnp.zeros((1, n), jnp.int32),
        iou_threshold=0.5, score_threshold=0.0,
        max_detections=n, pre_nms_topk=n, class_agnostic=True)
    got = sorted(np.asarray(out.indices[0])[np.asarray(out.valid[0])].tolist())
    assert got == ref_keep


def test_nms_score_threshold_and_capacity():
    boxes = jnp.asarray([[[0, 0, 10, 10], [100, 100, 110, 110], [200, 200, 210, 210]]],
                        jnp.float32)
    scores = jnp.asarray([[0.9, 0.5, 0.05]])
    classes = jnp.zeros((1, 3), jnp.int32)
    out = batched_nms(boxes, scores, classes, iou_threshold=0.5,
                      score_threshold=0.1, max_detections=2, pre_nms_topk=3)
    assert int(out.valid[0].sum()) == 2
    np.testing.assert_allclose(np.asarray(out.scores[0][:2]), [0.9, 0.5])


def test_nms_class_aware_vs_agnostic():
    # two overlapping boxes, different classes
    boxes = jnp.asarray([[[0, 0, 10, 10], [1, 1, 11, 11]]], jnp.float32)
    scores = jnp.asarray([[0.9, 0.8]])
    classes = jnp.asarray([[0, 1]], jnp.int32)
    agnostic = batched_nms(boxes, scores, classes, iou_threshold=0.5,
                           max_detections=2, pre_nms_topk=2, class_agnostic=True)
    aware = batched_nms(boxes, scores, classes, iou_threshold=0.5,
                        max_detections=2, pre_nms_topk=2, class_agnostic=False)
    assert int(agnostic.valid[0].sum()) == 1
    assert int(aware.valid[0].sum()) == 2


def test_heatmap_decode_centroid():
    hm = make_gt_heatmap_np(50, 20, 1, (64, 32), variance=5.0)
    assert hm.shape == (32, 64)
    cx, cy, r, found = decode_heatmap_peaks(jnp.asarray(hm[None]), threshold=128)
    assert bool(found[0])
    assert abs(float(cx[0]) - 50) <= 1.0
    assert abs(float(cy[0]) - 20) <= 1.0
    # empty map
    z = jnp.zeros((1, 32, 64), jnp.uint8)
    _, _, _, found0 = decode_heatmap_peaks(z, threshold=128)
    assert not bool(found0[0])


def test_crop_section_semantics():
    img = jnp.ones((2, 8, 8))
    boxes = jnp.asarray([[4.0, 4.0, 4.0, 4.0], [1.0, 1.0, 2.0, 2.0]])
    out = np.asarray(crop_section(img, boxes))
    assert out[0].sum() == 16  # 4x4 box centered at (4,4): cols/rows 2..5
    assert out[1].sum() == 4   # 2x2 box centered at (1,1): cols/rows 0..1
    assert out[0, 0, 0] == 0 and out[0, 3, 3] == 1


def test_postprocess_shapes():
    from vision_conglomerate_tpu.ops.postprocess import postprocess_detections
    rng = np.random.default_rng(0)
    b, m, c = 2, 100, 3
    preds = rng.normal(size=(b, m, 5 + c)).astype(np.float32)
    preds[..., 1 + c:5 + c] = rng.uniform(10, 50, size=(b, m, 4))
    out = postprocess_detections(
        jnp.asarray(preds), num_classes=c, iou_threshold=0.5,
        score_threshold=0.0, max_detections=10, pre_nms_topk=64)
    assert out.boxes_xyxy.shape == (b, 10, 4)
    assert out.scores.shape == (b, 10)
    assert out.keypoints.shape == (b, 10, 0, 3)
