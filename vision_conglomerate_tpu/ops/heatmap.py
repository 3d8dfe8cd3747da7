"""TrackNet heatmap ops: device-side peak decode + GT heatmap rendering.

The reference decodes heatmaps on CPU via cv2.HoughCircles
(pipeline/tracknet_trainer.py:124; inference_tracknet.py:64). The TPU-native
default is a thresholded-centroid decode (below) that stays on device; the
cv2 Hough path is kept in the pipeline as an optional compatibility decoder.
"""
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("threshold",))
def decode_heatmap_peaks(heatmaps: jnp.ndarray, threshold: int = 128):
    """Decode (B, H, W) uint8/float heatmaps to circle (x, y, r) + found flag.

    Matches the reference's pre-Hough pipeline (threshold at `threshold`,
    binarize to 255 — tracknet_trainer.py:107-123) then replaces Hough with
    the centroid + equivalent-radius of the above-threshold blob:
    x, y = intensity centroid; r = sqrt(area / pi).
    """
    hm = heatmaps.astype(jnp.float32)
    binary = (hm >= threshold).astype(jnp.float32)
    b, h, w = hm.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    area = binary.sum(axis=(1, 2))
    found = area > 0
    denom = jnp.maximum(area, 1.0)
    cx = (binary * xs).sum(axis=(1, 2)) / denom
    cy = (binary * ys).sum(axis=(1, 2)) / denom
    r = jnp.sqrt(area / jnp.pi)
    return cx, cy, r, found


def make_gt_heatmap_np(x: int, y: int, visibility: int, img_wh: Tuple[int, int],
                       variance: float = 5.0) -> np.ndarray:
    """Gaussian GT heatmap as uint8 (reference tracknet_dataset.py:64-73)."""
    w, h = img_wh
    if visibility == 0:
        return np.zeros((h, w), dtype=np.uint8)
    yg, xg = np.mgrid[0 - y:h - y, 0 - x:w - x]
    heatmap = (np.exp(-(yg ** 2 + xg ** 2) / (2 * variance)) * 255).astype(np.uint8)
    return heatmap
