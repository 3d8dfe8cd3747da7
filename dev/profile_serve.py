"""xprof the batch-128 serve step and print the top ops by self-time.

Usage: python dev/profile_serve.py [fast]
"""
import shutil
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from dev.serve_build import build_deploy_model  # noqa: E402
from vision_conglomerate_tpu.nn.blocks import bn_folding  # noqa: E402
from vision_conglomerate_tpu.ops.postprocess import postprocess_detections  # noqa: E402
from vision_conglomerate_tpu.ops.serve_decode import decode_and_postprocess  # noqa: E402

BATCH = 128
LOGDIR = "/tmp/serve_trace"


def build(fast: bool):
    num_classes = 2
    model, deploy_vars = build_deploy_model(num_classes=num_classes)
    kw = dict(iou_threshold=0.35, score_threshold=0.3, box_allowance=4.0,
              max_detections=300)

    if fast:
        @jax.jit
        def serve(xx):
            with bn_folding():
                raw = model.apply(deploy_vars, xx, train=False, raw_fields=True)
            return decode_and_postprocess(raw, (640, 640), num_classes=num_classes, **kw)
    else:
        @jax.jit
        def serve(xx):
            with bn_folding():
                preds = model.apply(deploy_vars, xx, train=False, inference=True)
            return postprocess_detections(preds, num_classes=num_classes, **kw)
    return serve


def main():
    fast = len(sys.argv) > 1 and sys.argv[1] == "fast"
    serve = build(fast)
    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 640, 640, 3), jnp.float32)
    jax.block_until_ready(serve(x))
    jax.block_until_ready(serve(x))

    shutil.rmtree(LOGDIR, ignore_errors=True)
    jax.profiler.start_trace(LOGDIR)
    for _ in range(3):
        out = serve(x)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()

    from dev.trace_util import print_top_ops

    print_top_ops(LOGDIR, steps=3,
                  label=f"{'fast' if fast else 'reference'} serve", top_n=30)


if __name__ == "__main__":
    main()
