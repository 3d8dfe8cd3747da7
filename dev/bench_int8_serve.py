"""Full-model int8 PTQ serve vs bf16 deploy serve, batch 128 (VERDICT r2 #4)."""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from dev.serve_build import build_deploy_model, timed  # noqa: E402
from vision_conglomerate_tpu.infer.runner import quantize_model_int8  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import bn_folding  # noqa: E402
from vision_conglomerate_tpu.nn.quantize import int8_serving  # noqa: E402
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections  # noqa: E402

BATCH = 128


def main():
    num_classes = 2
    model, dv = build_deploy_model(num_classes=num_classes)

    x = jax.random.randint(jax.random.PRNGKey(1), (BATCH, 640, 640, 3), 0, 256, jnp.uint8)
    calib = x[:16].astype(jnp.float32) / 255.0
    qv = quantize_model_int8(model, dv, calib)
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
