"""Early-channel-widening serve A/B (PERF lever #2, docs/PERF.md).

Benches the deploy-form (RepVGG-fused, BN-folded) bf16 serve path — same
protocol as bench.py (uint8 input, /255 in-jit, device postprocess+NMS,
approx top-k) — for a sweep of cspbackbone_config.early_min_channels
values. The early stem/s2/s4 layers run 16/32/64 channels at width 0.5
(9-18% MXU lane utilization); clamping them up toward the 128-deep MXU
trades FLOPs for utilization, so the interesting question is wall-clock:
if the MXU was idling on lanes, widening is (nearly) free capacity.

Usage: python dev/bench_widen_serve.py [min_ch ...]   (default: 0 64 128; 0 = off)
Env:   BENCH_BATCH (default 128), BENCH_QUANTIZE=int8|none (default none —
       the A/B isolates the conv-shape change in one arithmetic mode).
"""
import os
import sys
import time

import numpy as np

vals = [int(v) for v in sys.argv[1:]] or [0, 64, 128]
BATCH = int(os.environ.get("BENCH_BATCH", "128"))
QUANTIZE = os.environ.get("BENCH_QUANTIZE", "none")
WARMUP, ITERS = 3, 10

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402
from vision_conglomerate_tpu.models import DetectionNet  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import bn_folding  # noqa: E402
from vision_conglomerate_tpu.nn.quantize import int8_serving  # noqa: E402
from vision_conglomerate_tpu.nn.reparam import deploy_transform  # noqa: E402
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections  # noqa: E402

PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
               "TPU v6 lite": 918.0}


def bench_one(min_ch: int):
    import copy
    cfg = copy.deepcopy(DET_CONFIG)
    if min_ch:
        cfg.setdefault("cspbackbone_config", {})["early_min_channels"] = min_ch
        cfg.setdefault("repbipan_config", {})  # neck channels derive from registry
    num_classes = 2
    train_model = DetectionNet(num_classes=num_classes, config=cfg,
                               anchors=ANCHORS, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = train_model.init(jax.random.PRNGKey(0), x0, train=False)
    dparams, dstats = deploy_transform(variables["params"], variables["batch_stats"])
    model = DetectionNet(num_classes=num_classes, config=cfg, anchors=ANCHORS,
                         deploy=True, dtype=jnp.bfloat16)
    deploy_vars = {"params": dparams}
    if dstats:
        deploy_vars["batch_stats"] = dstats

    x = jax.random.randint(jax.random.PRNGKey(1), (BATCH, 640, 640, 3), 0, 256, jnp.uint8)
    if QUANTIZE == "int8":
        from vision_conglomerate_tpu.infer.runner import quantize_model_int8
        calib = x[:16].astype(jnp.float32) / 255.0
        deploy_vars = quantize_model_int8(model, deploy_vars, calib)

    @jax.jit
    def serve(x):
        x = x.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        with bn_folding(), int8_serving(QUANTIZE == "int8"):
            preds = model.apply(deploy_vars, x, train=False, inference=True)
        return postprocess_detections(
            preds, num_classes=num_classes, iou_threshold=0.35,
            score_threshold=0.3, box_allowance=4.0, max_detections=300,
            topk_method="approx")

    compiled = serve.lower(x).compile()
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0))
    except Exception:
        flops = 0.0

    for _ in range(WARMUP):
        jax.block_until_ready(serve(x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = serve(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = BATCH * ITERS / dt
    gfl = flops / BATCH / 1e9 if flops else 0.0
    ach = ips * gfl / 1e3
    peak = PEAK_TFLOPS.get(getattr(jax.devices()[0], "device_kind", ""), None)
    mfu = ach / peak if peak else float("nan")
    print(f"early_min_channels={min_ch or 'off':>4}  batch {BATCH} {QUANTIZE}: "
          f"{ips:8.1f} img/s ({dt / ITERS * 1000:6.2f} ms/batch)  "
          f"{gfl:6.1f} GFLOP/img  {ach:6.1f} TFLOP/s  MFU {mfu:.1%}", flush=True)
    return ips, gfl, mfu


if __name__ == "__main__":
    results = {v: bench_one(v) for v in vals}
    base = results.get(0)
    if base:
        for v, (ips, gfl, _) in results.items():
            if v:
                print(f"min_ch {v}: {ips / base[0]:.3f}x img/s at "
                      f"{gfl / base[1]:.2f}x FLOPs vs off", flush=True)
