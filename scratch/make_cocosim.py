"""Synthetic COCO-convention dataset generator for the full-config
training demo (runs/fullcfg_r4): colored-rectangle objects on textured
backgrounds, written as JPEGs + darknet label txts + list file.

The reference's flagship training config (COCO trainvalno5k: aug ON,
multi-scale 320-608, reference README.md:49-56, dataset.py:79-93) cannot
run here (no network, no COCO), so this provides a same-shaped workload:
several object classes, 1-4 boxes/image, mixed image sizes.
"""

import os
import sys

import cv2
import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cocosim"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 512

COLORS = [(220, 40, 40), (40, 200, 60), (60, 80, 230)]   # 3 classes


def main():
    rng = np.random.default_rng(0)
    os.makedirs(f"{OUT}/images", exist_ok=True)
    os.makedirs(f"{OUT}/labels", exist_ok=True)
    paths = []
    for i in range(N):
        h = int(rng.integers(300, 481))
        w = int(rng.integers(400, 641))
        base = rng.integers(60, 180, (6, 8, 3), dtype=np.uint8)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        noise = rng.normal(0, 12, img.shape)
        img = np.clip(img.astype(np.float32) + noise, 0, 255).astype(np.uint8)
        rows = []
        for _ in range(int(rng.integers(1, 5))):
            cls = int(rng.integers(0, len(COLORS)))
            bw = int(rng.integers(w // 10, w // 3))
            bh = int(rng.integers(h // 10, h // 3))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            img[y1:y1 + bh, x1:x1 + bw] = COLORS[cls]
            # light outline so boxes stay distinct under heavy overlap
            cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), (250, 250, 250), 2)
            rows.append([cls, (x1 + bw / 2) / w, (y1 + bh / 2) / h,
                         bw / w, bh / h])
        p = f"{OUT}/images/im{i:05d}.jpg"
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        np.savetxt(f"{OUT}/labels/im{i:05d}.txt", np.asarray(rows), fmt="%.6f")
        paths.append(p)
    with open(f"{OUT}/list.txt", "w") as f:
        f.write("\n".join(paths) + "\n")
    with open(f"{OUT}/cocosim.names", "w") as f:
        f.write("red\ngreen\nblue\n")
    print(f"wrote {N} images to {OUT}")


if __name__ == "__main__":
    main()
