"""Sizing experiment: upper bound of the fused-conv+SiLU prize.

Benches the flagship serve path three ways on the current chip:
  a) normal           — deploy-form forward + decode + NMS (bench.py path)
  b) no-activation    — same, with every activation patched to identity
                        (numerically wrong; isolates the standalone
                        elementwise-pass cost XLA can't fuse into convs)
  c) forward-only     — normal forward without decode+NMS (sizes the
                        postprocess share)

If (a)-(b) is small, a Pallas fused conv cannot win much and the perf work
should pivot (VERDICT r2 item #1 allows a measured kill).
"""
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from dev.serve_build import build_deploy_model, timed  # noqa: E402
from vision_conglomerate_tpu.nn import blocks  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import bn_folding  # noqa: E402
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections  # noqa: E402

BATCH = 128


def build():
    num_classes = 2
    model, deploy_vars = build_deploy_model(num_classes=num_classes)
    return model, deploy_vars, num_classes


def main():
    model, deploy_vars, num_classes = build()
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 640, 640, 3), jnp.float32)

    @jax.jit
    def serve(xx):
        with bn_folding():
            preds = model.apply(deploy_vars, xx, train=False, inference=True)
        return postprocess_detections(
            preds, num_classes=num_classes, iou_threshold=0.35,
            score_threshold=0.3, box_allowance=4.0, max_detections=300)

    @jax.jit
    def forward_only(xx):
        with bn_folding():
            return model.apply(deploy_vars, xx, train=False, inference=True)

    ips_a, ms_a = timed(serve, x)
    print(f"a) normal serve:      {ips_a:8.1f} img/s  ({ms_a:.2f} ms/batch)")

    ips_c, ms_c = timed(forward_only, x)
    print(f"c) forward+decode:    {ips_c:8.1f} img/s  ({ms_c:.2f} ms/batch)")

    # patch every activation to identity and rebuild the jitted program
    orig = blocks.get_activation
    blocks.get_activation = lambda name: (lambda t: t)
    try:
        @jax.jit
        def serve_noact(xx):
            with bn_folding():
                preds = model.apply(deploy_vars, xx, train=False, inference=True)
            return postprocess_detections(
                preds, num_classes=num_classes, iou_threshold=0.35,
                score_threshold=0.3, box_allowance=4.0, max_detections=300)

        ips_b, ms_b = timed(serve_noact, x)
    finally:
        blocks.get_activation = orig
    print(f"b) no-activation:     {ips_b:8.1f} img/s  ({ms_b:.2f} ms/batch)")
    print(f"activation cost: {ms_a - ms_b:.2f} ms/batch "
          f"({(ms_a - ms_b) / ms_a:.1%} of serve) -> fused-conv ceiling "
          f"{ips_b:.0f} img/s ({ips_b / ips_a:.2f}x)")
    print(f"postprocess cost (NMS path beyond decode): {ms_a - ms_c:.2f} ms/batch")


if __name__ == "__main__":
    main()
