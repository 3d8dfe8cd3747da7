"""xprof the detection TRAIN step and print the top ops by self-time.

The serve path is settled at ~43% MFU; the train step measures 15.6%
(dev/bench_train_step.py) — this trace attributes the gap (backward convs vs
assignment/scatter vs loss-layout elementwise vs optimizer).

Usage: python dev/profile_train.py [batch] [img_size]
(img_size defaults to 640; pass e.g. `2 64` for a CPU smoke run)
"""
import os
import shutil
import sys

import numpy as np

import jax
import jax.numpy as jnp

if os.environ.get("VCT_CPU"):  # CPU smoke (the axon pin ignores env vars)
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, ".")

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 640
LOGDIR = "/tmp/train_trace"


def main():
    from __graft_entry__ import ANCHORS, DET_CONFIG
    from vision_conglomerate_tpu.losses import DetectionLossConfig
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.parallel import make_mesh
    from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer

    cfg = dict(DET_CONFIG)
    cfg["dtype"] = "bfloat16"
    model = DetectionNet(num_classes=2, config=cfg, anchors=ANCHORS,
                         dtype=jnp.bfloat16)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=2), tx,
        mesh=make_mesh(1), sample_input_shape=(SIZE, SIZE, 3))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        (rng.uniform(size=(BATCH, SIZE, SIZE, 3)) * 255).astype(np.uint8))
    labels = np.zeros((BATCH, 16, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    labels[:, 1] = [0, 0.25, 0.3, 0.04, 0.04]
    mask = np.zeros((BATCH, 16), bool)
    mask[:, :2] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)
    lr = jnp.float32(1e-3)

    state = pipe.state
    for _ in range(3):  # compile + settle
        state, m = pipe._train_step(state, lr, imgs, labels, mask)
    jax.block_until_ready(state.params)

    shutil.rmtree(LOGDIR, ignore_errors=True)
    jax.profiler.start_trace(LOGDIR)
    for _ in range(3):
        state, m = pipe._train_step(state, lr, imgs, labels, mask)
    jax.block_until_ready(state.params)
    jax.profiler.stop_trace()

    from dev.trace_util import print_top_ops

    print_top_ops(LOGDIR, steps=3, label=f"train step b{BATCH}", top_n=40)


if __name__ == "__main__":
    main()
