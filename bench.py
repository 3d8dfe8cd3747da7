"""Benchmark: 640x640 detection inference throughput on the current chip.

Measures the flagship path end-to-end ON DEVICE: deploy-form (RepVGG-fused)
bf16 DetectionNet forward + per-scale decode + flatten + on-device NMS.
Prints ONE JSON line {metric, value, unit, vs_baseline}.

vs_baseline: the reference publishes no numbers (BASELINE.md); the divisor is
an ESTIMATED A100 PyTorch eager throughput for the same ~7M-param detector at
640x640 batch inference (~1000 img/s, fp16, batch 32 — to be replaced by a
measured value when the reference can be run side by side).
"""
import json
import sys
import time

A100_TORCH_EST_IMGS_PER_SEC = 1000.0

BATCH = 128  # throughput-optimal on v5e for this model (see docs/PERF.md)
WARMUP = 3
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import ANCHORS, DET_CONFIG
    from vision_conglomerate_tpu.models import DetectionNet
    from vision_conglomerate_tpu.nn.blocks import bn_folding
    from vision_conglomerate_tpu.nn.reparam import deploy_transform
    from vision_conglomerate_tpu.ops.postprocess import postprocess_detections

    num_classes = 2
    train_model = DetectionNet(
        num_classes=num_classes, config=DET_CONFIG, anchors=ANCHORS, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = train_model.init(jax.random.PRNGKey(0), x0, train=False)
    dparams, dstats = deploy_transform(variables["params"], variables["batch_stats"])
    model = DetectionNet(
        num_classes=num_classes, config=DET_CONFIG, anchors=ANCHORS,
        deploy=True, dtype=jnp.bfloat16)
    deploy_vars = {"params": dparams}
    if dstats:
        deploy_vars["batch_stats"] = dstats

    @jax.jit
    def serve(x):
        with bn_folding():
            preds = model.apply(deploy_vars, x, train=False, inference=True)
        return postprocess_detections(
            preds, num_classes=num_classes,
            iou_threshold=0.35, score_threshold=0.3,
            box_allowance=4.0, max_detections=300)

    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (BATCH, 640, 640, 3), jnp.float32)

    for _ in range(WARMUP):
        jax.block_until_ready(serve(x))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = serve(x)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    imgs_per_sec = BATCH * ITERS / dt

    print(f"device: {jax.devices()[0]}, batch {BATCH}: "
          f"{imgs_per_sec:.1f} img/s ({dt / ITERS * 1000:.2f} ms/batch)",
          file=sys.stderr)
    print(json.dumps({
        "metric": "detection_inference_640_images_per_sec_per_chip",
        "value": round(imgs_per_sec, 2),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / A100_TORCH_EST_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    # the remote TPU compile service occasionally 500s; one retry rides
    # through transient hiccups without failing the driver's single run
    try:
        main()
    except Exception as e:  # noqa: BLE001
        print(f"bench attempt 1 failed ({type(e).__name__}: {e}); retrying",
              file=sys.stderr)
        time.sleep(10)
        main()
