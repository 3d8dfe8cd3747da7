"""Synthetic moving-shapes video + ground-truth tracks for the hardware
video+tracking evidence (VERDICT r3 items #1/#9 -> BASELINE.md).

Renders the same object styles as dev/make_shapes_dataset.py (class 0 =
small bright ball, class 1 = dark player-ish box) on a fixed textured
background, with ballistic motion for balls (constant velocity + gravity,
elastic bounces off the frame walls) and constant-velocity motion for
boxes. This is the video analogue of the synthetic training set the round-4
detection checkpoint was trained on, so a correct model+tracker stack
should hold one stable track id per object for the whole clip — the
behavior the reference's flagship demo loop exercises
(/root/reference/inference_det.py:168-252,288-294).

Writes <out>/clip.mp4 and <out>/gt.csv with columns
(frame, obj_id, cls, cx, cy, w, h) in pixels, frame 0-based to match the
inference driver's output.csv frame numbering.

Score mode matches an inference output.csv (frame, track_id, confidence,
class, X, Y, W, H — X/Y/W/H are center-format pixels, see
infer/runner.py:410-416) against gt.csv and prints per-object track
continuity: recall, dominant-track-id coverage, id switches, px error.

Styles: `det` (default) matches dev/make_shapes_dataset.py; `seg` matches
dev/make_seg_dataset.py (bright moving ellipses + dark rotating boxes, for
the mask-over-video evidence); `--keypoints` draws the top/bottom keypoint
markers of the keypoint dataset on every object so the keypoint head has
real signal in the clip.

Usage:
  python dev/make_shapes_video.py <out_dir> [n_frames] [size] [fps] [--style det|seg] [--keypoints]
  python dev/make_shapes_video.py --score <gt.csv> <output.csv>
"""
import os
import sys

import numpy as np


def _background(size, rng):
    base = rng.integers(40, 160, size=3)
    img = (rng.normal(0, 18, size=(size, size, 3)) + base).clip(0, 255)
    return img.astype(np.uint8)


def _objects(size, rng, style="det"):
    """Initial object states: (cls, cx, cy, w, h, vx, vy) in px / px-per-frame."""
    objs = []
    if style == "seg":
        for _ in range(2):  # bright ellipses, ballistic
            rx = rng.uniform(0.05, 0.09) * size
            ry = rx * rng.uniform(0.75, 1.25)
            objs.append({
                "cls": 0, "shape": "ellipse", "w": 2 * rx, "h": 2 * ry,
                "cx": rng.uniform(0.2, 0.8) * size, "cy": rng.uniform(0.15, 0.45) * size,
                "vx": rng.uniform(2.5, 5.0) * rng.choice([-1, 1]),
                "vy": rng.uniform(-4.0, 0.0),
                "color": tuple(int(v) for v in rng.integers(190, 256, size=3)),
            })
        for i in range(2):  # dark rotating boxes, constant velocity
            w = rng.uniform(0.1, 0.18) * size
            h = rng.uniform(0.15, 0.26) * size
            objs.append({
                "cls": 1, "shape": "rotbox", "w": w, "h": h,
                "angle": rng.uniform(-0.4, 0.4), "vangle": rng.uniform(-0.02, 0.02),
                "cx": (0.25 + 0.5 * i) * size, "cy": rng.uniform(0.55, 0.75) * size,
                "vx": rng.uniform(1.5, 3.0) * (1 if i == 0 else -1),
                "vy": rng.uniform(-1.0, 1.0),
                "color": tuple(int(v) for v in rng.integers(0, 90, size=3)),
            })
        return objs
    for _ in range(2):  # balls: ballistic
        r = rng.uniform(0.014, 0.028) * size
        objs.append({
            "cls": 0, "shape": "ball", "w": 2 * r, "h": 2 * r,
            "cx": rng.uniform(0.2, 0.8) * size, "cy": rng.uniform(0.15, 0.45) * size,
            "vx": rng.uniform(2.5, 5.0) * rng.choice([-1, 1]),
            "vy": rng.uniform(-4.0, 0.0),
            "color": tuple(int(v) for v in rng.integers(200, 256, size=3)),
        })
    for i in range(2):  # player boxes: constant velocity, separate halves
        w = rng.uniform(0.07, 0.12) * size
        h = rng.uniform(0.18, 0.28) * size
        objs.append({
            "cls": 1, "shape": "box", "w": w, "h": h,
            "cx": (0.25 + 0.5 * i) * size, "cy": rng.uniform(0.55, 0.75) * size,
            "vx": rng.uniform(1.5, 3.0) * (1 if i == 0 else -1),
            "vy": rng.uniform(-1.0, 1.0),
            "color": tuple(int(v) for v in rng.integers(0, 120, size=3)),
        })
    return objs


def _step(obj, size, gravity=0.25):
    if obj["cls"] == 0:
        obj["vy"] += gravity
    obj["cx"] += obj["vx"]
    obj["cy"] += obj["vy"]
    # elastic bounce keeping the full box inside the frame
    for c, v, ext in (("cx", "vx", obj["w"] / 2), ("cy", "vy", obj["h"] / 2)):
        lo, hi = ext + 2, size - ext - 2
        if obj[c] < lo:
            obj[c] = lo + (lo - obj[c])
            obj[v] = -obj[v]
        elif obj[c] > hi:
            obj[c] = hi - (obj[c] - hi)
            obj[v] = -obj[v]


def _rotbox_poly(o):
    c, s = np.cos(o["angle"]), np.sin(o["angle"])
    pts = np.array([[-o["w"] / 2, -o["h"] / 2], [o["w"] / 2, -o["h"] / 2],
                    [o["w"] / 2, o["h"] / 2], [-o["w"] / 2, o["h"] / 2]])
    return pts @ np.array([[c, -s], [s, c]]).T + [o["cx"], o["cy"]]


def _aabb(o):
    """Axis-aligned (w, h) of the drawn shape (rotated boxes swell)."""
    if o["shape"] == "rotbox":
        poly = _rotbox_poly(o)
        return (poly[:, 0].max() - poly[:, 0].min(),
                poly[:, 1].max() - poly[:, 1].min())
    return o["w"], o["h"]


def _draw(bg, objs, keypoints=False):
    from PIL import Image, ImageDraw
    im = Image.fromarray(bg.copy())
    draw = ImageDraw.Draw(im)
    for o in objs:
        x0, y0 = o["cx"] - o["w"] / 2, o["cy"] - o["h"] / 2
        x1, y1 = o["cx"] + o["w"] / 2, o["cy"] + o["h"] / 2
        if o["shape"] in ("ball", "ellipse"):
            draw.ellipse([x0, y0, x1, y1], fill=o["color"], outline=(30, 30, 30))
        elif o["shape"] == "rotbox":
            draw.polygon([tuple(p) for p in _rotbox_poly(o)], fill=o["color"],
                         outline=(240, 240, 240))
        else:
            draw.rectangle([x0, y0, x1, y1], fill=o["color"],
                           outline=(240, 240, 240), width=2)
        if keypoints:
            # same markers as dev/make_shapes_dataset.py --keypoints:
            # red dot at top-center, blue at bottom-center (always visible)
            kr = max(2.0, 0.08 * min(o["w"], o["h"]))
            for (kx, ky), col in (((o["cx"], o["cy"] - o["h"] / 2 + kr), (255, 40, 40)),
                                  ((o["cx"], o["cy"] + o["h"] / 2 - kr), (40, 40, 255))):
                draw.ellipse([kx - kr, ky - kr, kx + kr, ky + kr], fill=col)
    return np.asarray(im)


def make_clip(out_dir, n_frames=120, size=640, fps=30, seed=4,
              style="det", keypoints=False):
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    bg = _background(size, rng)
    objs = _objects(size, rng, style=style)
    vpath = os.path.join(out_dir, "clip.mp4")
    vw = cv2.VideoWriter(vpath, cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size))
    rows = []
    for t in range(n_frames):
        frame = _draw(bg, objs, keypoints=keypoints)
        vw.write(cv2.cvtColor(frame, cv2.COLOR_RGB2BGR))
        for oid, o in enumerate(objs):
            w, h = _aabb(o)
            rows.append((t, oid, o["cls"], o["cx"], o["cy"], w, h))
        for o in objs:
            o["angle"] = o.get("angle", 0.0) + o.get("vangle", 0.0)
            _step(o, size)
    vw.release()
    import pandas as pd
    pd.DataFrame(rows, columns=["frame", "obj_id", "cls", "cx", "cy", "w", "h"]) \
        .to_csv(os.path.join(out_dir, "gt.csv"), index=False)
    print(f"wrote {vpath} ({n_frames} frames @ {size}px) + gt.csv")
    return vpath


def score(gt_csv, out_csv):
    """Track-continuity report: match output.csv rows to GT objects per frame
    (same class, nearest center within half the GT diagonal), then per object
    report recall, dominant-id coverage, id switches, and center px error."""
    import pandas as pd
    gt = pd.read_csv(gt_csv)
    out = pd.read_csv(out_csv)
    # class column may be names (classmap) or ints; normalize to str
    out["class"] = out["class"].astype(str)
    report = {}
    for oid, g in gt.groupby("obj_id"):
        cls = str(int(g["cls"].iloc[0]))
        ids, errs = [], []
        matched_frames = 0
        for _, row in g.iterrows():
            cand = out[(out["frame"] == row["frame"]) & (out["class"] == cls)]
            if not len(cand):
                ids.append(None)
                continue
            d = np.hypot(cand["X"] - row["cx"], cand["Y"] - row["cy"])
            gate = 0.5 * np.hypot(row["w"], row["h"])
            j = d.idxmin()
            if d[j] > gate:
                ids.append(None)
                continue
            matched_frames += 1
            ids.append(int(cand.loc[j, "track_id"]))
            errs.append(float(d[j]))
        seen = [i for i in ids if i is not None]
        if not seen:
            report[oid] = {"recall": 0.0}
            continue
        vals, counts = np.unique(seen, return_counts=True)
        dom = vals[counts.argmax()]
        switches = sum(1 for a, b in zip(seen, seen[1:]) if a != b)
        report[oid] = {
            "cls": cls, "recall": matched_frames / len(g),
            "dominant_id": int(dom),
            "dominant_coverage": counts.max() / len(seen),
            "n_ids": len(vals), "id_switches": switches,
            "median_px_err": float(np.median(errs)),
            "max_px_err": float(np.max(errs)),
        }
    for oid, r in sorted(report.items()):
        print(f"obj {oid}: " + ", ".join(f"{k}={v:.3f}" if isinstance(v, float)
                                         else f"{k}={v}" for k, v in r.items()))
    return report


if __name__ == "__main__":
    if sys.argv[1] == "--score":
        score(sys.argv[2], sys.argv[3])
    else:
        argv = [a for a in sys.argv[1:] if not a.startswith("--")]
        style = "seg" if "--style=seg" in sys.argv or "seg" in [
            sys.argv[i + 1] for i, a in enumerate(sys.argv) if a == "--style"] else "det"
        kps = "--keypoints" in sys.argv
        out = argv[0]
        argv = [a for a in argv[1:] if a != "seg"]
        n = int(argv[0]) if len(argv) > 0 else 120
        size = int(argv[1]) if len(argv) > 1 else 640
        fps = int(argv[2]) if len(argv) > 2 else 30
        make_clip(out, n_frames=n, size=size, fps=fps, style=style, keypoints=kps)
