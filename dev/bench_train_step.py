"""Grounded TRAIN-step throughput + MFU on the current chip (VERDICT r2
item #7, second half: the 324 img/s@b16 device-only number in docs/PERF.md
needs an MFU grounding like the serve bench has).

Times the full jitted detection train step (forward + assignment + loss +
backward + optimizer + BN-stat pmean on a 1-device mesh) with DEVICE-RESIDENT
batches (no H2D), and reports XLA-cost-analysis FLOPs -> achieved TFLOP/s ->
MFU vs the bf16 peak.

Usage: python dev/bench_train_step.py [batch] [iters]
"""
import sys
import time

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402
from vision_conglomerate_tpu.losses import DetectionLossConfig  # noqa: E402
from vision_conglomerate_tpu.models import DetectionNet  # noqa: E402
from vision_conglomerate_tpu.parallel import make_mesh  # noqa: E402
from vision_conglomerate_tpu.train import (  # noqa: E402
    TrainDetectionPipeline, make_optimizer)

PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
               "TPU v6 lite": 918.0}


def main():
    cfg = dict(DET_CONFIG)
    cfg["dtype"] = "bfloat16"
    model = DetectionNet(num_classes=2, config=cfg, anchors=ANCHORS,
                         dtype=jnp.bfloat16)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=2), tx,
        mesh=make_mesh(1), sample_input_shape=(640, 640, 3))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        (rng.uniform(size=(BATCH, 640, 640, 3)) * 255).astype(np.uint8))
    labels = np.zeros((BATCH, 16, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    labels[:, 1] = [0, 0.25, 0.3, 0.04, 0.04]
    mask = np.zeros((BATCH, 16), bool)
    mask[:, :2] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)
    lr = jnp.float32(1e-3)

    lowered = pipe._train_step.lower(pipe.state, lr, imgs, labels, mask)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0

    state = pipe.state
    for _ in range(3):
        state, m = pipe._train_step(state, lr, imgs, labels, mask)
    jax.block_until_ready(state.params)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, m = pipe._train_step(state, lr, imgs, labels, mask)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    imgs_per_sec = BATCH * ITERS / dt
    gflops_img = flops / BATCH / 1e9
    achieved = imgs_per_sec * gflops_img / 1e3
    dev = jax.devices()[0]
    peak = PEAK_TFLOPS.get(getattr(dev, "device_kind", ""), None)
    mfu = achieved / peak if peak else float("nan")
    print(f"device {dev} batch {BATCH}: {imgs_per_sec:.1f} img/s "
          f"({dt / ITERS * 1000:.1f} ms/step), {gflops_img:.1f} GFLOP/img "
          f"(fwd+bwd+opt) -> {achieved:.1f} TFLOP/s = MFU {mfu:.1%}")


if __name__ == "__main__":
    main()
