"""Generate the synthetic-shapes detection dataset used for the round-2
training-run evidence (BASELINE.md).

The reference's padel-ball data is credential-gated (Kaggle/Roboflow) and
this environment has zero egress, so the trainability + mAP-harness evidence
uses a reproducible stand-in styled after the domain: class 0 = small
ball-like bright circles, class 1 = larger player-ish boxes, on textured
backgrounds. YOLO-format labels, data/<split>/ layout.

Usage: python dev/make_shapes_dataset.py [out_root] [n_train] [n_valid] [size]
"""
import os
import sys

import numpy as np
from PIL import Image, ImageDraw


def make_split(root, n, size, rng):
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
            labels.append((cls, cx / size, cy / size, w / size, h / size))
        im.save(os.path.join(root, f"img_{i:04d}.png"))
        with open(os.path.join(root, f"img_{i:04d}.txt"), "w") as f:
            for cls, x, y, w, h in labels:
                f.write(f"{cls} {x:.6f} {y:.6f} {w:.6f} {h:.6f}\n")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data/detection"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 240
    n_valid = int(sys.argv[3]) if len(sys.argv) > 3 else 60
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 640
    make_split(os.path.join(out, "train"), n_train, size,
               np.random.default_rng(0))
    make_split(os.path.join(out, "valid"), n_valid, size,
               np.random.default_rng(1))
    print(f"wrote {n_train} train + {n_valid} valid {size}px images to {out}")


if __name__ == "__main__":
    main()
