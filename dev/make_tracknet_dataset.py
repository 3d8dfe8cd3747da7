"""Generate a synthetic TrackNet dataset: clips of a small bright ball on a
ballistic arc over textured frames, with the reference's clip layout
(`<root>/<match>/Clip<k>/{frames + Label.csv}`) and CSV schema
(`file name, visibility, x-coordinate, y-coordinate, status` —
/root/reference/dataset/tracknet_dataset.py:11-95).

Some frames hide the ball (visibility 0) so the eval protocol's
per-visibility tp/fp/tn/fn buckets are all exercised.

Usage: python dev/make_tracknet_dataset.py [out_root] [n_clips] [frames_per_clip] [w] [h]
"""
import os
import sys

import numpy as np
from PIL import Image, ImageDraw


def make_clip(clip_dir, n_frames, w, h, rng):
    os.makedirs(clip_dir, exist_ok=True)
    # ballistic arc with a bounce, plus a short invisible stretch
    x0 = rng.uniform(0.1, 0.3) * w
    vx = rng.uniform(0.4, 0.8) * w / n_frames
    y0 = rng.uniform(0.2, 0.5) * h
    vy = rng.uniform(-1.5, -0.5) * h / n_frames
    g = rng.uniform(2.0, 4.0) * h / n_frames**2
    hide_at = rng.integers(n_frames // 2, n_frames - 2)
    hide_len = int(rng.integers(1, 3))
    r = 4
    rows = []
    base = rng.integers(50, 140, size=3)
    for t in range(n_frames):
        img = (rng.normal(0, 12, size=(h, w, 3)) + base).clip(0, 255)
        im = Image.fromarray(img.astype(np.uint8))
        x = x0 + vx * t
        y = y0 + vy * t + 0.5 * g * t * t
        if y > h - r:  # bounce
            y = 2 * (h - r) - y
        visible = (0 <= x < w) and (0 <= y < h) and not (hide_at <= t < hide_at + hide_len)
        if visible:
            d = ImageDraw.Draw(im)
            d.ellipse([x - r, y - r, x + r, y + r], fill=(250, 250, 120),
                      outline=(40, 40, 40))
        fname = f"{t:04d}.png"
        im.save(os.path.join(clip_dir, fname))
        rows.append((fname, int(visible), int(x) if visible else 0,
                     int(y) if visible else 0, 0))
    with open(os.path.join(clip_dir, "Label.csv"), "w") as f:
        f.write("file name,visibility,x-coordinate,y-coordinate,status\n")
        for row in rows:
            f.write(",".join(str(v) for v in row) + "\n")


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "data/tracknet"
    n_clips = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    n_frames = int(sys.argv[3]) if len(sys.argv) > 3 else 40
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 640
    h = int(sys.argv[5]) if len(sys.argv) > 5 else 352
    rng = np.random.default_rng(0)
    for k in range(n_clips):
        make_clip(os.path.join(out, "game1", f"Clip{k + 1}"), n_frames, w, h, rng)
    print(f"wrote {n_clips} clips x {n_frames} frames ({w}x{h}) to {out}")


if __name__ == "__main__":
    main()
