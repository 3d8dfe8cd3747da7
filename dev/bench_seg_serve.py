"""Dev: segmentation serving throughput + FLOP/MFU grounding (VERDICT r4
weak #3 / item #4).

Same XLA cost-analysis protocol as bench.py and dev/bench_tracknet.py, on
the full seg serve path: deploy-form (RepVGG-fused) bf16 SegmentationNet
forward + decode + on-device NMS + 32-proto mask assembly (proto
resolution, max_detections=100 — the same program shape as the recorded
batch-scaling numbers in docs/PERF.md "Other workloads"). uint8 input with
in-jit /255, approx top-k: the bench.py serve posture, so the seg rows are
directly comparable to the detection rows. The mask-assembly einsum +
full-image sigmoid/threshold is what makes seg serving distinct from
detection (reference inference_seg.py:123-126).

Usage: python dev/bench_seg_serve.py [batch=128] [int8]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402

PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v4": 275.0,
               "TPU v6 lite": 918.0}
PEAK_INT8_TOPS = {"TPU v5 lite": 394.0, "TPU v5e": 394.0, "TPU v4": 275.0,
                  "TPU v6 lite": 1836.0}


def _cost_analysis_flops(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main(batch=128, int8=False):
    from vision_conglomerate_tpu.models import SegmentationNet
    from vision_conglomerate_tpu.nn.blocks import bn_folding
    from vision_conglomerate_tpu.nn.quantize import int8_serving
    from vision_conglomerate_tpu.nn.reparam import deploy_transform
    from vision_conglomerate_tpu.ops.postprocess import (
        assemble_instance_masks, postprocess_detections)

    cfg = dict(DET_CONFIG)
    cfg["num_masks"] = 32
    cfg["protos_config"] = {"c_h": 256}
    train_model = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS,
                                  dtype=jnp.bfloat16)
    v = train_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)),
                        train=False)
    dp, ds = deploy_transform(v["params"], v["batch_stats"], fuse_repvgg=True)
    model = SegmentationNet(num_classes=2, config=cfg, anchors=ANCHORS,
                            deploy=True, dtype=jnp.bfloat16)
    dv = {"params": dp}
    if ds:
        dv["batch_stats"] = ds

    x = jax.random.randint(jax.random.PRNGKey(1), (batch, 640, 640, 3),
                           0, 256, jnp.uint8)
    if int8:  # same PTQ protocol as bench.py / inference CLIs
        from vision_conglomerate_tpu.infer.runner import quantize_model_int8

        calib = x[:16].astype(jnp.float32) / 255.0
        dv = quantize_model_int8(model, dv, calib)

    @jax.jit
    def serve(a):
        a = a.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        with bn_folding(), int8_serving(int8):
            preds, protos = model.apply(dv, a, train=False, inference=True)
        post = postprocess_detections(
            preds, num_classes=2, num_masks=32, iou_threshold=0.35,
            score_threshold=0.3, box_allowance=4.0, max_detections=100,
            topk_method="approx")
        masks = assemble_instance_masks(protos, post.mask_coefs)
        return post, masks

    compiled = serve.lower(x).compile()
    total_flops = _cost_analysis_flops(compiled)
    gflops_per_image = total_flops / batch / 1e9 if total_flops else 0.0

    for _ in range(3):
        jax.block_until_ready(serve(x))
    t0 = time.perf_counter()
    for _ in range(10):
        out = serve(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 10
    imgs_per_sec = batch / dt
    achieved_tflops = imgs_per_sec * gflops_per_image / 1e3
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "")
    peak = PEAK_TFLOPS.get(kind)
    mode_peak = (PEAK_INT8_TOPS if int8 else PEAK_TFLOPS).get(kind)
    print(f"seg serve batch={batch}{' int8' if int8 else ''}: "
          f"{dt * 1e3:.2f} ms/batch, {imgs_per_sec:.1f} img/s",
          file=sys.stderr)
    print(json.dumps({
        "metric": "seg_inference_640_images_per_sec" + ("_int8" if int8 else ""),
        "batch": batch,
        "images_per_sec": round(imgs_per_sec, 1),
        "ms_per_batch": round(dt * 1e3, 2),
        "gflops_per_image": round(gflops_per_image, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "mfu": round(achieved_tflops / peak, 4) if peak else None,
        "mfu_vs_mode_peak": (round(achieved_tflops / mode_peak, 4)
                             if mode_peak else None),
        "device_kind": kind,
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128,
         int8="int8" in sys.argv[2:])
