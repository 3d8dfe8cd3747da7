"""Regenerate tests/fixtures/bytetrack_golden.json `expected` from the
current tools/bytetrack.py implementation.

The golden is a self-regression lock (NOT supervision parity — see
docs/BYTETRACK_AUDIT.md): after any deliberate semantic change, rerun this
and review the id diff as the behavior-change artifact.
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from vision_conglomerate_tpu.tools.bytetrack import ByteTrack, Detections  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
FIXTURES = [os.path.join(FIXDIR, name) for name in
            ("bytetrack_golden.json", "bytetrack_golden_mcf3.json")]


def regen(fixture):
    with open(fixture) as f:
        data = json.load(f)
    tracker = ByteTrack(**data["config"])
    expected = []
    for fr in data["frames"]:
        det = Detections(
            xyxy=np.asarray(fr["xyxy"], np.float32),
            confidence=np.asarray(fr["confidence"], np.float32),
            class_id=np.asarray(fr["class_id"], int))
        out = tracker.update_with_detections(det)
        order = np.argsort(out.xyxy[:, 0]) if len(out) else np.asarray([], int)
        expected.append({
            "tracker_ids": [int(i) for i in out.tracker_id[order]],
            "classes": [int(c) for c in out.class_id[order]],
        })
    old = data["expected"]
    n_diff = sum(1 for a, b in zip(old, expected) if a != b)
    n_diff += abs(len(old) - len(expected))
    data["expected"] = expected
    with open(fixture, "w") as f:
        json.dump(data, f, indent=1)
    print(f"rewrote {fixture}: {n_diff}/{len(expected)} frames changed")


def main():
    for fixture in FIXTURES:
        regen(fixture)


if __name__ == "__main__":
    main()
