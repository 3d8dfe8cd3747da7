"""Shared xprof-trace parsing for the dev profile scripts.

jax.profiler.start_trace writes both an xplane proto and a ready-made
trace-viewer JSON (`*.trace.json.gz`) per run. The tensorboard-plugin
converter in this image is unusable (its _pywrap_profiler lacks
xspace_to_tools_data), so parse the JSON directly: keep device lanes,
aggregate per-op self time, print the top ops. Used by dev/profile_serve.py
and dev/profile_train.py.
"""
import glob
import gzip
import json
import os


def load_trace_events(logdir: str):
    traces = sorted(
        glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not traces:
        raise FileNotFoundError(f"no *.trace.json.gz under {logdir}")
    with gzip.open(traces[-1], "rt") as f:
        return json.load(f).get("traceEvents", [])


def print_top_ops(logdir: str, steps: int, label: str, top_n: int = 30):
    raw = load_trace_events(logdir)
    events = [e for e in raw if e.get("ph") == "X" and e.get("dur")]
    # keep only TPU/device lanes (XLA ops), drop host threads
    pid_names = {e["pid"]: e.get("args", {}).get("name", "")
                 for e in raw if e.get("ph") == "M"
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
