"""Dev: generate a directory of real-sized JPEGs for end-to-end serving
benches (dev/bench_serve_e2e.py).

1280x720 JPEG quality-90 frames in the shapes style — the point is a
realistic host-side decode + resize cost per image (the reference serves
camera frames, /root/reference/inference_det.py:168-252), not label quality.

Usage: python dev/make_serve_imgs.py <out_dir> [n=512] [w=1280] [h=720]
"""
import os
import sys

import numpy as np
from PIL import Image, ImageDraw


def main():
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 1280
    h = int(sys.argv[4]) if len(sys.argv) > 4 else 720
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        base = rng.integers(40, 160, size=3)
        img = (rng.normal(0, 18, size=(h, w, 3)) + base).clip(0, 255)
        im = Image.fromarray(img.astype(np.uint8))
        draw = ImageDraw.Draw(im)
        for _ in range(int(rng.integers(2, 7))):
            if rng.integers(0, 2) == 0:
                r = rng.uniform(0.012, 0.03) * h
                cx, cy = rng.uniform(r, w - r), rng.uniform(r, h - r)
                draw.ellipse([cx - r, cy - r, cx + r, cy + r],
                             fill=tuple(int(v) for v in rng.integers(200, 256, 3)),
                             outline=(30, 30, 30))
            else:
                bw, bh = rng.uniform(0.06, 0.14) * w, rng.uniform(0.15, 0.3) * h
                cx = rng.uniform(bw / 2, w - bw / 2)
                cy = rng.uniform(bh / 2, h - bh / 2)
                draw.rectangle([cx - bw / 2, cy - bh / 2, cx + bw / 2, cy + bh / 2],
                               fill=tuple(int(v) for v in rng.integers(0, 120, 3)),
                               outline=(240, 240, 240), width=2)
        im.save(os.path.join(out, f"frame_{i:05d}.jpg"), quality=90)
    print(f"wrote {n} {w}x{h} JPEGs to {out}")


if __name__ == "__main__":
    main()
