"""Shared xprof-trace parsing for the dev profile scripts.

Parses trace-viewer events from an xplane proto dir, keeps TPU-core lanes,
aggregates per-op self time, and prints the top ops. Used by
dev/profile_serve.py and dev/profile_train.py.
"""
import glob
import json
import os


def print_top_ops(logdir: str, steps: int, label: str, top_n: int = 30):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    xspaces = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
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
    print(f"{label}: {len(dev_events)} device events, "
          f"{total / steps / 1000:.2f} ms/step aggregated")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top_n]:
        print(f"{dur / steps / 1000:9.3f} ms  {dur / total:6.1%}  {name[:110]}")
    return agg
