"""Mid-run diagnostic: load a TrackNet checkpoint on CPU, forward one
training window, report predicted-heatmap statistics (global max grayscale,
value at the GT ball pixel, peak location) to tell 'peak below the 128
decode threshold' apart from 'collapsed to background'."""
import sys

sys.path.insert(0, ".")
import dev.cpu  # noqa: F401  (forces the CPU backend before first use)

import numpy as np
import jax.numpy as jnp
import yaml

from vision_conglomerate_tpu.data.tracknet import TrackNetDataset
from vision_conglomerate_tpu.infer.tracknet_runner import load_tracknet_model
from vision_conglomerate_tpu.nn.blocks import bn_folding

ckpt = sys.argv[1]
cfg_path = sys.argv[2]

with open(cfg_path) as f:
    cfg = yaml.safe_load(f)

model, variables, _ = load_tracknet_model(
    ckpt, cfg["model_config"], use_reparam=True, dtype=jnp.float32)

tcfg = cfg["train_config"]
ds = TrackNetDataset(
    tcfg["data_path"], img_wh=tuple(tcfg["img_config"]["img_wh"]),
    num_stacks=tcfg["img_config"]["num_stacks"],
    avg_diameter=tcfg["img_config"]["avg_diameter"])
print(f"dataset windows: {len(ds)}")

for i in (0, 3, 7):
    img, target, others = ds[i]
    with bn_folding(True):
        logits = model.apply(variables, jnp.asarray(img)[None], train=False)
    pred_val = np.asarray(jnp.argmax(logits, axis=-1))[0]  # (H, W) grayscale
    probs = np.asarray(jnp.max(jnp.asarray(logits, jnp.float32), axis=-1))[0]
    gt = np.asarray(target)
    gy, gx = np.unravel_index(gt.argmax(), gt.shape)
    py, px = np.unravel_index(pred_val.argmax(), pred_val.shape)
    print(f"window {i}: gt max {gt.max()} at ({gx},{gy}) | "
          f"pred global max {pred_val.max()} at ({px},{py}) | "
          f"pred at gt px {pred_val[gy, gx]} | "
          f"nonzero pred px {(pred_val > 0).sum()} | "
          f"logit-max range [{probs.min():.2f},{probs.max():.2f}]")
