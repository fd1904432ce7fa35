"""Synthetic 80-class COCO-scale dataset generator (runs/fullcfg_r5), v2.

Round-5 scale-up of scratch/make_cocosim.py (VERDICT r4 missing #4): the
reference's flagship config is 80-class COCO trainvalno5k (reference
README.md:49-56); COCO itself is unreachable here, so this generates a
same-shaped workload one order of magnitude above the r4 demo:

* ~5,000 JPEGs (400-640 x 300-480),
* 80 classes, 2-20 objects per image (stresses the 90-row label pad and
  the dense-candidate eval regime with real class diversity),
* darknet-layout labels + list file + .names, seeded and reproducible.

v2 class key (the round-5 lesson, measured on-chip): v1 keyed classes by
fill color alone — the reference training augmentation (HSV hue +-0.1 =
+-36deg vs the palette's 18deg hue steps; sat/exposure x1.5 scrambling
the sat/val variants) makes that key UNLEARNABLE, and the class head of
an otherwise-healthy run provably converges to the 1/80 prior (logits
-4.1 ~= log(1/79); boxes/objectness trained fine).  v2 keys each class
by an augmentation-invariant structural code:

* a 4x3 dot-matrix glyph in the box interior, mirror-symmetric in x
  (RandomHorizontalFlip maps each class to itself), sized RELATIVE to
  the box (jitter-crop + multi-scale 320-608 rescale-safe), drawn as
  strong darkening (HSV exposure/saturation shifts preserve dark-vs-
  light contrast),
* 8 code bits = 4 middle-column cells + 4 mirrored side-column cells,
  encoding the class id directly (80 < 256),
* fill color kept as a secondary (aug-degraded) cue, same palette as v1.

Object placement uses light rejection sampling: a candidate whose
central 60% region overlaps an accepted box's central region by >20%
is redrawn (up to 40 tries) so glyphs stay readable under z-order
overdraw — scenes stay dense (up to 20 objects) like the COCO regime.

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
    {(1.0, 1.0), (1.0, 0.55), (0.45, 1.0), (0.7, 0.78)}."""
    cols = []
    for i in range(20):
        h = i / 20.0
        for s, v in ((1.0, 1.0), (1.0, 0.55), (0.45, 1.0), (0.7, 0.78)):
            r, g, b = colorsys.hsv_to_rgb(h, s, v)
            cols.append((int(r * 255), int(g * 255), int(b * 255)))
    return cols


COLORS = class_colors()


def draw_object(img, cls, x1, y1, bw, bh):
    col = COLORS[cls]
    img[y1:y1 + bh, x1:x1 + bw] = col
    # v3: glyph = BLACK dots on a WHITE inner panel (v2's dark-on-fill
    # dots at 0.35x contrast left the class head on a slow learning
    # trajectory; black-on-white is the maximal contrast the HSV aug and
    # JPEG cannot touch).  4x3 mirror-symmetric dot-matrix, box-relative:
    # bit b of the class id fills middle-column cell r=b (bits 0-3) or
    # BOTH side cells r=b-4 (bits 4-7) — identical under horizontal flip.
    px0, py0 = int(x1 + 0.14 * bw), int(y1 + 0.14 * bh)
    px1, py1 = int(x1 + 0.86 * bw), int(y1 + 0.86 * bh)
    img[py0:py1, px0:px1] = (245, 245, 245)
    pw, ph = px1 - px0, py1 - py0
    gw, gh = pw / 3.0, ph / 4.0
    pad_x, pad_y = 0.18 * gw, 0.18 * gh
    for bit in range(8):
        if not (cls >> bit) & 1:
            continue
        r = bit % 4
        cols_ = (1,) if bit < 4 else (0, 2)
        for c_ in cols_:
            ax, bx = int(px0 + c_ * gw + pad_x), int(px0 + (c_ + 1) * gw - pad_x)
            ay, by = int(py0 + r * gh + pad_y), int(py0 + (r + 1) * gh - pad_y)
            img[ay:by, ax:bx] = (8, 8, 8)
    cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), (250, 250, 250), 2)


def _core(x1, y1, bw, bh):
    """Central 60% region of a box (the glyph-bearing area)."""
    return (x1 + 0.2 * bw, y1 + 0.2 * bh, x1 + 0.8 * bw, y1 + 0.8 * bh)


def _overlap_frac(a, b):
    iw = min(a[2], b[2]) - max(a[0], b[0])
    ih = min(a[3], b[3]) - max(a[1], b[1])
    if iw <= 0 or ih <= 0:
        return 0.0
    area = (a[2] - a[0]) * (a[3] - a[1])
    return iw * ih / max(area, 1e-6)


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
        cores = []
        for _ in range(int(rng.integers(2, 21))):
            for _try in range(40):
                cls = int(rng.integers(0, C))
                bw = int(rng.integers(max(w // 12, 36), w // 4))
                bh = int(rng.integers(max(h // 12, 36), h // 4))
                x1 = int(rng.integers(0, w - bw))
                y1 = int(rng.integers(0, h - bh))
                core = _core(x1, y1, bw, bh)
                if all(_overlap_frac(core, c) <= 0.2
                       and _overlap_frac(c, core) <= 0.2 for c in cores):
                    break
            else:
                continue  # scene full — skip this object
            draw_object(img, cls, x1, y1, bw, bh)
            cores.append(core)
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
