"""Generate the synthetic-shapes detection dataset used for the round-2
training-run evidence (BASELINE.md).

The reference's padel-ball data is credential-gated (Kaggle/Roboflow) and
this environment has zero egress, so the trainability + mAP-harness evidence
uses a reproducible stand-in styled after the domain: class 0 = small
ball-like bright circles, class 1 = larger player-ish boxes, on textured
backgrounds. YOLO-format labels, data/<split>/ layout.

With `--keypoints`, every object also gets 2 labeled keypoints appended as
(x, y, vis) triples in YOLO image-normalized coords (the format the
reference's dataset consumes and renormalizes bbox-relative,
/root/reference/dataset/detection_dataset.py:41-51): a visually distinct
TOP marker (drawn dot) and BOTTOM marker, so keypoint training has real
signal; ~10% of keypoints are marked vis=0 (not drawn) to exercise the
visibility classes.

Usage: python dev/make_shapes_dataset.py [out_root] [n_train] [n_valid] [size] [--keypoints] [--png]
"""
import os
import sys

import numpy as np
from PIL import Image, ImageDraw


def make_split(root, n, size, rng, keypoints=False, ext="jpg"):
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        # textured background
        base = rng.integers(40, 160, size=3)
        img = (rng.normal(0, 18, size=(size, size, 3)) + base).clip(0, 255)
        im = Image.fromarray(img.astype(np.uint8))
        draw = ImageDraw.Draw(im)
        labels = []
        n_obj = int(rng.integers(2, 7))
        for _ in range(n_obj):
            cls = int(rng.integers(0, 2))
            if cls == 0:  # small bright ball
                r = rng.uniform(0.012, 0.03) * size
                cx = rng.uniform(r + 2, size - r - 2)
                cy = rng.uniform(r + 2, size - r - 2)
                color = tuple(int(v) for v in rng.integers(200, 256, size=3))
                draw.ellipse([cx - r, cy - r, cx + r, cy + r], fill=color,
                             outline=(30, 30, 30))
                w = h = 2 * r
            else:  # player-ish tall box
                w = rng.uniform(0.06, 0.14) * size
                h = rng.uniform(0.15, 0.3) * size
                cx = rng.uniform(w / 2 + 2, size - w / 2 - 2)
                cy = rng.uniform(h / 2 + 2, size - h / 2 - 2)
                color = tuple(int(v) for v in rng.integers(0, 120, size=3))
                draw.rectangle([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                               fill=color, outline=(240, 240, 240), width=2)
            row = [cls, cx / size, cy / size, w / size, h / size]
            if keypoints:
                # kp0 = top-center (red dot), kp1 = bottom-center (blue dot)
                kr = max(2.0, 0.08 * min(w, h))
                for (kx, ky), col in (((cx, cy - h / 2 + kr), (255, 40, 40)),
                                      ((cx, cy + h / 2 - kr), (40, 40, 255))):
                    vis = 2 if rng.uniform() > 0.1 else 0
                    if vis:
                        draw.ellipse([kx - kr, ky - kr, kx + kr, ky + kr], fill=col)
                    row += [kx / size, ky / size, vis]
            labels.append(tuple(row))
        # jpg (quality 95) by default: the shipped configs set img_ext "jpg"
        # and the native decode backend is a jpeg decoder
        im.save(os.path.join(root, f"img_{i:04d}.{ext}"),
                **({"quality": 95} if ext == "jpg" else {}))
        with open(os.path.join(root, f"img_{i:04d}.txt"), "w") as f:
            for row in labels:
                f.write(" ".join(
                    str(v) if isinstance(v, int) else f"{v:.6f}" for v in row) + "\n")


def main():
    argv = [a for a in sys.argv[1:] if a not in ("--keypoints", "--png")]
    keypoints = "--keypoints" in sys.argv[1:]
    ext = "png" if "--png" in sys.argv[1:] else "jpg"
    out = argv[0] if len(argv) > 0 else "data/detection"
    n_train = int(argv[1]) if len(argv) > 1 else 240
    n_valid = int(argv[2]) if len(argv) > 2 else 60
    size = int(argv[3]) if len(argv) > 3 else 640
    make_split(os.path.join(out, "train"), n_train, size,
               np.random.default_rng(0), keypoints=keypoints, ext=ext)
    make_split(os.path.join(out, "valid"), n_valid, size,
               np.random.default_rng(1), keypoints=keypoints, ext=ext)
    print(f"wrote {n_train} train + {n_valid} valid {size}px images to {out}"
          + (" (with keypoints)" if keypoints else ""))


if __name__ == "__main__":
    main()
