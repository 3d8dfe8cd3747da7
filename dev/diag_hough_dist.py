"""Distance diagnostics for the Hough decode protocol: per-window distance
between decoded circle center and GT for both decoders on a few eval
windows (CPU)."""
import sys

sys.path.insert(0, ".")
import dev.cpu  # noqa: F401

import numpy as np
import cv2
import jax.numpy as jnp
import yaml

from vision_conglomerate_tpu.data.tracknet import TrackNetDataset
from vision_conglomerate_tpu.infer.tracknet_runner import load_tracknet_model
from vision_conglomerate_tpu.nn.blocks import bn_folding
from vision_conglomerate_tpu.ops.heatmap import decode_heatmap_peaks

ckpt, cfg_path = sys.argv[1], sys.argv[2]
cfg = yaml.safe_load(open(cfg_path))
tc = cfg["train_config"]

model, variables, _ = load_tracknet_model(ckpt, cfg["model_config"],
                                          use_reparam=True, dtype=jnp.float32)
train_ds = TrackNetDataset(
    data_path=tc["data_path"], num_stacks=3,
    img_wh=tuple(tc["img_config"]["img_wh"]), avg_diameter=5,
    split_percentage=0.7, seed=42)
ds = TrackNetDataset(labels_df=train_ds.unused_labels_df, num_stacks=3,
                     img_wh=tuple(tc["img_config"]["img_wh"]), avg_diameter=5)

hough_kw = dict(method=cv2.HOUGH_GRADIENT, dp=1, minDist=1, param1=50,
                param2=2, minRadius=2, maxRadius=7)
for i in range(6):
    img, target, others = ds[i]
    vis, gx, gy, _ = others
    if vis == 0:
        continue
    with bn_folding(True):
        logits = model.apply(variables, jnp.asarray(img)[None], train=False)
    hm = np.asarray(jnp.argmax(logits, -1))[0].astype(np.uint8)
    cx, cy, r, found = decode_heatmap_peaks(jnp.asarray(hm)[None], threshold=128)
    cdist = float(np.hypot(float(cx[0]) - gx, float(cy[0]) - gy))
    bin_hm = hm.copy()
    bin_hm[bin_hm < 128] = 0
    bin_hm[bin_hm >= 128] = 255
    blob_px = int((bin_hm > 0).sum())
    circles = cv2.HoughCircles(bin_hm, **hough_kw)
    if circles is None:
        print(f"w{i}: centroid d={cdist:.2f} ({int(found[0])}), blob_px={blob_px}, hough: none")
    else:
        hx, hy = circles[0][0][0], circles[0][0][1]
        print(f"w{i}: centroid d={cdist:.2f}, blob_px={blob_px}, "
              f"hough n={len(circles)} first=({hx:.1f},{hy:.1f}) gt=({gx:.0f},{gy:.0f}) "
              f"d={np.hypot(hx - gx, hy - gy):.2f} r={circles[0][0][2]:.1f}")
