"""Fast (lanes-major) serve path vs reference-layout serve path, batch 128."""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from dev.serve_build import build_deploy_model, timed  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import bn_folding  # noqa: E402
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections  # noqa: E402
from vision_conglomerate_tpu.ops.serve_decode import decode_and_postprocess  # noqa: E402

BATCH = 128


def main():
    num_classes = 2
    model, deploy_vars = build_deploy_model(num_classes=num_classes)

    kw = dict(topk_method="approx",  # serve setting on both paths
              iou_threshold=0.35, score_threshold=0.3, box_allowance=4.0,
              max_detections=300)

    @jax.jit
    def serve_ref(xx):
        xx = xx.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        with bn_folding():
            preds = model.apply(deploy_vars, xx, train=False, inference=True)
        return postprocess_detections(preds, num_classes=num_classes, **kw)

    @jax.jit
    def serve_fast(xx):
        xx = xx.astype(jnp.bfloat16) / jnp.bfloat16(255.0)
        with bn_folding():
            raw = model.apply(deploy_vars, xx, train=False, raw_fields=True)
        return decode_and_postprocess(raw, (640, 640), num_classes=num_classes, **kw)

    x = jax.random.randint(jax.random.PRNGKey(1), (BATCH, 640, 640, 3), 0, 256, jnp.uint8)
    ips_r, ms_r = timed(serve_ref, x)
    print(f"reference-layout serve: {ips_r:8.1f} img/s ({ms_r:.2f} ms/batch)")
    ips_f, ms_f = timed(serve_fast, x)
    print(f"lanes-major fast serve: {ips_f:8.1f} img/s ({ms_f:.2f} ms/batch)")
    print(f"speedup {ips_f / ips_r:.3f}x")


if __name__ == "__main__":
    main()
