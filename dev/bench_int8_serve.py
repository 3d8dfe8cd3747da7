"""Full-model int8 PTQ serve vs bf16 deploy serve, batch 128 (VERDICT r2 #4)."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from __graft_entry__ import ANCHORS, DET_CONFIG  # noqa: E402
from vision_conglomerate_tpu.models import DetectionNet  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import bn_folding  # noqa: E402
from vision_conglomerate_tpu.nn.quantize import (  # noqa: E402
    collect_calibration, int8_quantize_params, int8_serving)
from vision_conglomerate_tpu.nn.reparam import deploy_transform  # noqa: E402
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections  # noqa: E402

BATCH = 128
ITERS = 10


def timed(fn, x):
    jax.block_until_ready(fn(x))
    jax.block_until_ready(fn(x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS
    return BATCH / dt, dt * 1000


def main():
    num_classes = 2
    train_model = DetectionNet(
        num_classes=num_classes, config=DET_CONFIG, anchors=ANCHORS, dtype=jnp.bfloat16)
    x0 = jnp.zeros((1, 640, 640, 3), jnp.float32)
    variables = train_model.init(jax.random.PRNGKey(0), x0, train=False)
    dparams, dstats = deploy_transform(variables["params"], variables["batch_stats"])
    model = DetectionNet(
        num_classes=num_classes, config=DET_CONFIG, anchors=ANCHORS,
        deploy=True, dtype=jnp.bfloat16)
    dv = {"params": dparams}
    if dstats:
        dv["batch_stats"] = dstats

    x = jax.random.randint(jax.random.PRNGKey(1), (BATCH, 640, 640, 3), 0, 256, jnp.uint8)
    calib = x[:16].astype(jnp.float32) / 255.0
    absmax = collect_calibration(model, dv, [calib], inference=True)
    qv = dict(dv)
    qv["params"] = int8_quantize_params(dv["params"], absmax)
    n_q = sum(1 for p, _ in jax.tree_util.tree_leaves_with_path(qv["params"])
              if "q_kernel" in str(p))
    print(f"{n_q} convs quantized to int8")

    def serve_with(vs, int8):
        @jax.jit
        def serve(xx):
            xx = xx.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
            with bn_folding(), int8_serving(int8):
                preds = model.apply(vs, xx, train=False, inference=True)
            return postprocess_detections(
                preds, num_classes=num_classes, iou_threshold=0.35,
                score_threshold=0.3, box_allowance=4.0, max_detections=300,
                topk_method="approx")
        return serve

    ips_bf, ms_bf = timed(serve_with(dv, False), x)
    print(f"bf16 serve: {ips_bf:8.1f} img/s ({ms_bf:.2f} ms/batch)")
    ips_i8, ms_i8 = timed(serve_with(qv, True), x)
    print(f"int8 serve: {ips_i8:8.1f} img/s ({ms_i8:.2f} ms/batch)  "
          f"{ips_i8 / ips_bf:.3f}x")


if __name__ == "__main__":
    main()
