"""Generate a synthetic-shapes SEGMENTATION dataset (polygon labels).

Same rationale as dev/make_shapes_dataset.py (the real data is
credential-gated, this environment has zero egress): class 0 = bright
ellipses, class 1 = dark rotated boxes, YOLO-polygon label format
`cls x1 y1 x2 y2 ...` (normalized), data/<split>/ layout — the format
/root/reference/dataset/segmentation_dataset.py:25-52 consumes.

Usage: python dev/make_seg_dataset.py [out_root] [n_train] [n_valid] [size]
"""
import os
import sys

import numpy as np
from PIL import Image, ImageDraw


def ellipse_polygon(cx, cy, rx, ry, n=16):
    t = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([cx + rx * np.cos(t), cy + ry * np.sin(t)], axis=1)


def box_polygon(cx, cy, w, h, angle):
    c, s = np.cos(angle), np.sin(angle)
    pts = np.array([[-w / 2, -h / 2], [w / 2, -h / 2], [w / 2, h / 2], [-w / 2, h / 2]])
    rot = pts @ np.array([[c, -s], [s, c]]).T
    return rot + [cx, cy]


def make_split(root, n, size, rng, ext="png"):
    os.makedirs(root, exist_ok=True)
    for i in range(n):
        base = rng.integers(40, 160, size=3)
        img = (rng.normal(0, 18, size=(size, size, 3)) + base).clip(0, 255)
        im = Image.fromarray(img.astype(np.uint8))
        draw = ImageDraw.Draw(im)
        lines = []
        for _ in range(int(rng.integers(2, 6))):
            cls = int(rng.integers(0, 2))
            if cls == 0:
                rx = rng.uniform(0.04, 0.1) * size
                ry = rx * rng.uniform(0.7, 1.3)
                cx = rng.uniform(rx + 2, size - rx - 2)
                cy = rng.uniform(ry + 2, size - ry - 2)
                poly = ellipse_polygon(cx, cy, rx, ry)
                color = tuple(int(v) for v in rng.integers(190, 256, size=3))
            else:
                w = rng.uniform(0.1, 0.2) * size
                h = rng.uniform(0.15, 0.3) * size
                cx = rng.uniform(w / 2 + h / 2 + 2, size - w / 2 - h / 2 - 2)
                cy = rng.uniform(w / 2 + h / 2 + 2, size - w / 2 - h / 2 - 2)
                poly = box_polygon(cx, cy, w, h, rng.uniform(-0.4, 0.4))
                color = tuple(int(v) for v in rng.integers(0, 90, size=3))
            draw.polygon([tuple(p) for p in poly], fill=color,
                         outline=(240, 240, 240))
            flat = (np.clip(poly, 0, size - 1) / size).reshape(-1)
            lines.append(str(cls) + " " + " ".join(f"{v:.6f}" for v in flat))
        im.save(os.path.join(root, f"img_{i:04d}.{ext}"))
        with open(os.path.join(root, f"img_{i:04d}.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data/segmentation"
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    n_valid = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 640
    # default png (lossless; exercises the native libpng decode path); the
    # shipped config keeps the reference's img_ext "jpg" — pass ext=jpg here
    # or point train_seg at a config with img_ext: png (docs/BASELINE.md
    # hardware runs use the latter).
    ext = sys.argv[5] if len(sys.argv) > 5 else "png"
    make_split(os.path.join(out, "train"), n_train, size, np.random.default_rng(0), ext)
    make_split(os.path.join(out, "valid"), n_valid, size, np.random.default_rng(1), ext)
    print(f"wrote {n_train} train + {n_valid} valid {size}px seg {ext} images to {out}")


if __name__ == "__main__":
    main()
