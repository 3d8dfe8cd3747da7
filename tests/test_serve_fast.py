"""Serve-fast path (ops/serve_decode.py): numerical parity with the
reference-layout decode + postprocess, incl. og rescale, segmentation coefs
and BasicHead packed fields."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_conglomerate_tpu.models import DetectionNet, SegmentationNet
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections
from vision_conglomerate_tpu.ops.serve_decode import decode_and_postprocess

CONFIG = {
    "train_anchors": True,
    "backbone": "CSPBackBone",
    "neck": "RepBiPAN",
    "head": "EffiDecHead",
    "cspbackbone_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "repbipan_config": {"width_multiple": 0.25, "depth_multiple": 0.2},
    "effidechead_config": {"width_multiple": 0.5},
}
ANCHORS = {
    "sm": [[0.1, 0.1], [0.15, 0.15], [0.2, 0.2]],
    "md": [[0.25, 0.25], [0.3, 0.3], [0.35, 0.35]],
    "lg": [[0.4, 0.4], [0.5, 0.5], [0.6, 0.6]],
}
KW = dict(iou_threshold=0.35, score_threshold=0.2, box_allowance=4.0,
          max_detections=50)


def _assert_same_detections(ref, fast):
    for i in range(ref.valid.shape[0]):
        rv, fv = np.asarray(ref.valid[i]), np.asarray(fast.valid[i])
        assert rv.sum() == fv.sum()
        rs = np.sort(np.asarray(ref.scores[i])[rv])[::-1]
        fs = np.sort(np.asarray(fast.scores[i])[fv])[::-1]
        np.testing.assert_allclose(rs, fs, rtol=1e-5, atol=1e-6)
        rb = np.asarray(ref.boxes_xyxy[i])[rv]
        fb = np.asarray(fast.boxes_xyxy[i])[fv]
        np.testing.assert_allclose(
            rb[np.lexsort(rb.T)], fb[np.lexsort(fb.T)], rtol=1e-4, atol=1e-3)
        rc = np.sort(np.asarray(ref.classes[i])[rv])
        fc = np.sort(np.asarray(fast.classes[i])[fv])
        np.testing.assert_array_equal(rc, fc)


def test_fast_path_matches_reference_path():
    model = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = postprocess_detections(
        model.apply(v, x, train=False, inference=True), num_classes=2, **KW)
    fast = decode_and_postprocess(
        model.apply(v, x, train=False, raw_fields=True), (64, 64),
        num_classes=2, **KW)
    _assert_same_detections(ref, fast)


def test_fast_path_og_rescale_parity():
    model = DetectionNet(num_classes=2, config=CONFIG, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    og = (96, 128)  # (h, w), both differ -> reference rescales
    ref = postprocess_detections(
        model.apply(v, x, train=False, inference=True, og_size=og),
        num_classes=2, **KW)
    fast = decode_and_postprocess(
        model.apply(v, x, train=False, raw_fields=True), (64, 64),
        num_classes=2, og_size=og, **KW)
    _assert_same_detections(ref, fast)


def test_fast_path_segmentation_coefs_parity():
    cfg = dict(CONFIG)
    cfg["num_masks"] = 8
    cfg["protos_config"] = {"c_h": 16}
    model = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    preds, protos = model.apply(v, x, train=False, inference=True)
    ref = postprocess_detections(preds, num_classes=2, num_masks=8, **KW)
    raw, protos2 = model.apply(v, x, train=False, raw_fields=True)
    fast = decode_and_postprocess(raw, (64, 64), num_classes=2, num_masks=8, **KW)
    np.testing.assert_allclose(np.asarray(protos), np.asarray(protos2),
                               rtol=1e-5, atol=1e-6)
    _assert_same_detections(ref, fast)
    # coefs of matching (score-sorted) detections must agree: pair by score
    for i in range(2):
        rv, fv = np.asarray(ref.valid[i]), np.asarray(fast.valid[i])
        r_order = np.argsort(-np.asarray(ref.scores[i])[rv])
        f_order = np.argsort(-np.asarray(fast.scores[i])[fv])
        rc = np.asarray(ref.mask_coefs[i])[rv][r_order]
        fc = np.asarray(fast.mask_coefs[i])[fv][f_order]
        np.testing.assert_allclose(rc, fc, rtol=1e-4, atol=1e-5)


def test_fast_path_basichead_packed():
    cfg = dict(CONFIG)
    cfg["head"] = "BasicHead"
    cfg["basichead_config"] = {"width_multiple": 0.5}
    model = DetectionNet(num_classes=2, config=cfg, anchors=ANCHORS)
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = postprocess_detections(
        model.apply(v, x, train=False, inference=True), num_classes=2, **KW)
    raw = model.apply(v, x, train=False, raw_fields=True)
    assert "packed" in raw[1][0]
    fast = decode_and_postprocess(raw, (64, 64), num_classes=2, **KW)
    _assert_same_detections(ref, fast)
