"""xprof the batch-128 serve step and print the top ops by self-time.

Usage: python dev/profile_serve.py [fast]
"""
import glob
import gzip
import json
import os
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

    # parse the trace-viewer events straight from the xplane proto
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = glob.glob(os.path.join(LOGDIR, "**", "*.xplane.pb"), recursive=True)
    data, _ = rtd.xspace_to_tool_data(xspaces, "trace_viewer", {})
    trace = json.loads(data)
    events = [e for e in trace.get("traceEvents", [])
              if e.get("ph") == "X" and e.get("dur")]
    # keep only TPU-core lanes (XLA ops), drop host threads
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in trace.get("traceEvents", []) if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tpu_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    dev_events = [e for e in events if e["pid"] in tpu_pids] or events

    agg = {}
    for e in dev_events:
        name = e["name"]
        agg[name] = agg.get(name, 0.0) + e["dur"]
    total = sum(agg.values())
    print(f"{'fast' if fast else 'reference'} serve: {len(dev_events)} device "
          f"events, {total / 3 / 1000:.2f} ms/step aggregated")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{dur / 3 / 1000:9.3f} ms  {dur / total:6.1%}  {name[:110]}")


if __name__ == "__main__":
    main()
