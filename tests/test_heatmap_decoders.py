"""Centroid (device) vs HoughCircles (reference CPU) heatmap decoders must
agree on clean Gaussian blobs — the eval-metric compatibility claim
(pipeline default decode="centroid", decode="hough" parity path)."""
import numpy as np
import pytest

import jax.numpy as jnp

from vision_conglomerate_tpu.ops.heatmap import decode_heatmap_peaks, make_gt_heatmap_np

cv2 = pytest.importorskip("cv2")


def _hough(hm, threshold=128):
    h = hm.copy()
    h[h < threshold] = 0
    h[h >= threshold] = 255
    circles = cv2.HoughCircles(h, cv2.HOUGH_GRADIENT, dp=1, minDist=1,
                               param1=50, param2=2, minRadius=2, maxRadius=7)
    if circles is not None and len(circles) == 1:
        return circles[0][0][0], circles[0][0][1], True
    return None, None, False


@pytest.mark.parametrize("xy", [(50, 20), (100, 40), (10, 10)])
def test_centroid_agrees_with_hough_on_gaussian_blob(xy):
    x, y = xy
    hm = make_gt_heatmap_np(x, y, 1, (128, 64), variance=5.0)
    cx, cy, r, found = decode_heatmap_peaks(jnp.asarray(hm[None]), threshold=128)
    hx, hy, hfound = _hough(hm)
    assert bool(found[0])
    if hfound:  # Hough can fail on tiny blobs; centroid must not
        tol = 2.0  # both must land within the reference's tp_dist_tol=4
        assert abs(float(cx[0]) - hx) <= tol
        assert abs(float(cy[0]) - hy) <= tol
    assert abs(float(cx[0]) - x) <= 1.0
    assert abs(float(cy[0]) - y) <= 1.0


def test_both_decoders_reject_empty():
    z = np.zeros((64, 128), np.uint8)
    _, _, _, found = decode_heatmap_peaks(jnp.asarray(z[None]), threshold=128)
    assert not bool(found[0])
    _, _, hfound = _hough(z)
    assert not hfound
