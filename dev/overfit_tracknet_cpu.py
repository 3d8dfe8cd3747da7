"""Learnability check for the TrackNet pipeline: overfit a handful of tiny
windows on CPU and confirm the 256-way-CE heatmap actually fires (argmax
crosses the 128 decode threshold at the ball) — distinguishing 'the hardware
run just needs more steps' from 'the pipeline can never produce tp>0'.

Usage: python dev/overfit_tracknet_cpu.py [steps=400] [hw=96]
"""
import sys

sys.path.insert(0, ".")
import dev.cpu  # noqa: F401

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vision_conglomerate_tpu.ops.heatmap import make_gt_heatmap_np
from vision_conglomerate_tpu.losses.focal import softmax_cross_entropy
from vision_conglomerate_tpu.models import TrackNet

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
hw = int(sys.argv[2]) if len(sys.argv) > 2 else 96

rng = np.random.default_rng(0)
B = 4
frames = rng.normal(0, 0.05, size=(B, hw, hw, 9)).astype(np.float32) + 0.4
hms = []
for b in range(B):
    x, y = rng.integers(10, hw - 10, size=2)
    # paint the ball into all 3 stacked frames
    yy, xx = np.mgrid[0:hw, 0:hw]
    ball = ((xx - x) ** 2 + (yy - y) ** 2 <= 9).astype(np.float32)
    for c in range(9):
        frames[b, :, :, c] = np.where(ball > 0, 0.95, frames[b, :, :, c])
    hms.append(make_gt_heatmap_np(int(x), int(y), 1, (hw, hw), variance=5))
heatmaps = np.stack(hms)
print("gt nonzero px per img:", [(h > 0).sum() for h in heatmaps],
      "gt>=128 px:", [(h >= 128).sum() for h in heatmaps])

model = TrackNet(config={"weight_init": "uniform", "architecture": "base",
                         "base_arch_config": {"encoder_config": {"width_multiple": 0.5},
                                              "decoder_config": {"width_multiple": 0.5}}},
                 dtype=jnp.float32)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, 9)), train=False)
params, batch_stats = variables["params"], variables.get("batch_stats", {})
tx = optax.adam(1e-3)
opt_state = tx.init(params)

fx = jnp.asarray(frames)
hy = jnp.asarray(heatmaps).astype(jnp.int32)


@jax.jit
def step(params, batch_stats, opt_state):
    def loss_fn(p):
        logits, mut = model.apply({"params": p, "batch_stats": batch_stats},
                                  fx, train=True, mutable=["batch_stats"])
        return softmax_cross_entropy(logits, hy).mean(), mut

    (loss, mut), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, mut["batch_stats"], opt_state, loss


for i in range(steps):
    params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state)
    if i % 50 == 0 or i == steps - 1:
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             fx, train=False)
        pred = np.asarray(jnp.argmax(logits, -1))
        hits = 0
        for b in range(B):
            gy, gx = np.unravel_index(heatmaps[b].argmax(), heatmaps[b].shape)
            m = pred[b].max()
            py, px = np.unravel_index(pred[b].argmax(), pred[b].shape)
            d = np.hypot(px - gx, py - gy)
            hits += int(m >= 128 and d <= 4)
        print(f"step {i}: loss {float(loss):.5f} | pred max {pred.max()} | "
              f"tp-equivalent hits {hits}/{B}")
