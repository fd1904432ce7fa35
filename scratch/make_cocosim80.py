"""Synthetic 80-class COCO-scale dataset generator (runs/fullcfg_r5).

Round-5 scale-up of scratch/make_cocosim.py (VERDICT r4 missing #4): the
reference's flagship config is 80-class COCO trainvalno5k (reference
README.md:49-56); COCO itself is unreachable here, so this generates a
same-shaped workload one order of magnitude above the r4 demo:

* ~5,000 JPEGs (400-640 x 300-480),
* 80 classes, visually separable by fill color (80 max-separation HSV
  anchors) plus a class-keyed interior pattern (stripe direction/density)
  so classification isn't a pure 1-pixel color read,
* 2-20 objects per image (stresses the 90-row label pad and the
  dense-candidate eval regime with real class diversity),
* darknet-layout labels + list file + .names, seeded and reproducible.

Usage: python scratch/make_cocosim80.py [/tmp/cocosim80] [5000]
"""

import colorsys
import os
import sys

import cv2
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cocosim80"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
C = 80


def class_colors():
    """80 well-separated RGB fills: 20 hues x (sat, val) in
    {(1.0, 1.0), (1.0, 0.55), (0.45, 1.0), (0.7, 0.75)}."""
    cols = []
    for i in range(20):
        h = i / 20.0
        for s, v in ((1.0, 1.0), (1.0, 0.55), (0.45, 1.0), (0.7, 0.78)):
            r, g, b = colorsys.hsv_to_rgb(h, s, v)
            cols.append((int(r * 255), int(g * 255), int(b * 255)))
    return cols


COLORS = class_colors()


def draw_object(img, cls, x1, y1, bw, bh, rng):
    col = COLORS[cls]
    img[y1:y1 + bh, x1:x1 + bw] = col
    # class-keyed stripe pattern: direction by cls%4, pitch by cls//20
    pitch = 6 + 3 * (cls // 20)
    dark = tuple(int(c * 0.55) for c in col)
    if cls % 4 == 0:
        for y in range(y1, y1 + bh, pitch):
            img[y:y + 2, x1:x1 + bw] = dark
    elif cls % 4 == 1:
        for x in range(x1, x1 + bw, pitch):
            img[y1:y1 + bh, x:x + 2] = dark
    elif cls % 4 == 2:
        cv2.rectangle(img, (x1 + bw // 4, y1 + bh // 4),
                      (x1 + 3 * bw // 4, y1 + 3 * bh // 4), dark, -1)
    cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), (250, 250, 250), 2)


def main():
    rng = np.random.default_rng(0)
    os.makedirs(f"{OUT}/images", exist_ok=True)
    os.makedirs(f"{OUT}/labels", exist_ok=True)
    paths = []
    for i in range(N):
        h = int(rng.integers(300, 481))
        w = int(rng.integers(400, 641))
        base = rng.integers(50, 170, (6, 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        noise = rng.normal(0, 10, img.shape)
        img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        rows = []
        for _ in range(int(rng.integers(2, 21))):
            cls = int(rng.integers(0, C))
            bw = int(rng.integers(max(w // 14, 24), w // 4))
            bh = int(rng.integers(max(h // 14, 24), h // 4))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            draw_object(img, cls, x1, y1, bw, bh, rng)
            rows.append([cls, (x1 + bw / 2) / w, (y1 + bh / 2) / h,
                         bw / w, bh / h])
        p = f"{OUT}/images/im{i:05d}.jpg"
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        np.savetxt(f"{OUT}/labels/im{i:05d}.txt", np.asarray(rows),
                   fmt="%.6f")
        paths.append(p)
        if (i + 1) % 1000 == 0:
            print(f"{i + 1}/{N}", flush=True)
    with open(f"{OUT}/list.txt", "w") as f:
        f.write("\n".join(paths) + "\n")
    with open(f"{OUT}/cocosim80.names", "w") as f:
        f.write("\n".join(f"c{i:02d}" for i in range(C)) + "\n")
    print(f"wrote {N} images to {OUT}")


if __name__ == "__main__":
    main()
