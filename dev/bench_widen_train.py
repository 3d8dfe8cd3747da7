"""Early-channel-widening TRAIN-step A/B (PERF lever #2 closure).

Times the full jitted detection train step (production b128+remat regime,
docs/PERF.md round-3 sweep) for a sweep of
cspbackbone_config.early_min_channels values, device-resident batches.
Companion to dev/bench_widen_serve.py, which measures the serve side.

Usage: python dev/bench_widen_train.py [min_ch ...]  (default: 0 128)
Env:   BENCH_BATCH (default 128), BENCH_ITERS (default 10)
"""
import copy
import os
import sys
import time

import numpy as np

vals = [int(v) for v in sys.argv[1:]] or [0, 128]
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
ITERS = int(os.environ.get("BENCH_ITERS", "10"))

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402
from vision_conglomerate_tpu.losses import DetectionLossConfig  # noqa: E402
from vision_conglomerate_tpu.models import DetectionNet  # noqa: E402
from vision_conglomerate_tpu.parallel import make_mesh  # noqa: E402
from vision_conglomerate_tpu.train import TrainDetectionPipeline, make_optimizer  # noqa: E402

PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
               "TPU v6 lite": 918.0}


def bench_one(min_ch: int):
    cfg = copy.deepcopy(DET_CONFIG)
    cfg["dtype"] = "bfloat16"
    cfg["remat"] = True  # the b128 production regime (docs/PERF.md)
    if min_ch:
        cfg.setdefault("cspbackbone_config", {})["early_min_channels"] = min_ch
    model = DetectionNet(num_classes=2, config=cfg, anchors=ANCHORS,
                         dtype=jnp.bfloat16)
    tx, _ = make_optimizer({"name": "Adam", "lr": 1e-3})
    pipe = TrainDetectionPipeline(
        model, DetectionLossConfig(num_classes=2), tx,
        mesh=make_mesh(1), sample_input_shape=(640, 640, 3))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray((rng.uniform(size=(BATCH, 640, 640, 3)) * 255).astype(np.uint8))
    labels = np.zeros((BATCH, 16, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    labels[:, 1] = [0, 0.25, 0.3, 0.04, 0.04]
    mask = np.zeros((BATCH, 16), bool)
    mask[:, :2] = True
    labels, mask = jnp.asarray(labels), jnp.asarray(mask)
    lr = jnp.float32(1e-3)

    compiled = pipe._train_step.lower(pipe.state, lr, imgs, labels, mask).compile()
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

    ips = BATCH * ITERS / dt
    gfl = flops / BATCH / 1e9
    ach = ips * gfl / 1e3
    peak = PEAK_TFLOPS.get(getattr(jax.devices()[0], "device_kind", ""), None)
    mfu = ach / peak if peak else float("nan")
    print(f"early_min_channels={min_ch or 'off':>4}  batch {BATCH} remat: "
          f"{ips:7.1f} img/s ({dt / ITERS * 1000:6.1f} ms/step)  "
          f"{gfl:6.1f} GFLOP/img (w/ remat recompute)  MFU {mfu:.1%}", flush=True)
    return ips, gfl


if __name__ == "__main__":
    res = {v: bench_one(v) for v in vals}
    if 0 in res:
        for v, (ips, gfl) in res.items():
            if v:
                print(f"min_ch {v}: {ips / res[0][0]:.3f}x img/s at "
                      f"{gfl / res[0][1]:.2f}x FLOPs vs off", flush=True)
