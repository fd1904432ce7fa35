"""Host input-pipeline feed rate: can batch assembly outrun the train step?

Builds a synthetic COCO-like set of real JPEGs (640x480, photographic-ish
gradients so JPEG decode cost is realistic), then measures DataHelper
assembly throughput with the full training transform (decode + HSV + jitter
crop + flip + letterbox + ToArray) at dim 416, bs 64, for several worker
counts.  Pure host CPU — no JAX/TPU involved.

Device step rates to beat (bench.py, bf16 bs16): 320: ~457 imgs/s,
416: ~280 imgs/s, 608: ~137 imgs/s.
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2

from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.sampler import CyclicSampler
from yolo_v3_tpu.data import transforms as T

cv2.setNumThreads(0)

N_IMGS = 256
BS = 64
N_BATCHES = 12


def build_dataset(root):
    img_dir = os.path.join(root, "images")
    lbl_dir = os.path.join(root, "labels")
    os.makedirs(img_dir)
    os.makedirs(lbl_dir)
    rng = np.random.default_rng(0)
    paths = []
    # photographic-ish content: smooth gradients + texture, so JPEG files
    # have realistic size/decode cost (~100-200 KB at 640x480 q95)
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    for i in range(N_IMGS):
        base = (
            128
            + 80 * np.sin(xx / (20 + i % 17) + i)
            + 60 * np.cos(yy / (15 + i % 13))
        )
        img = np.stack([base, np.roll(base, i % 7, 0),
                        np.roll(base, -(i % 11), 1)], -1)
        img += rng.normal(0, 12, img.shape)
        img = np.clip(img, 0, 255).astype(np.uint8)
        p = os.path.join(img_dir, f"img_{i:06d}.jpg")
        cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 95])
        n = int(rng.integers(1, 9))
        rows = np.zeros((n, 5), np.float32)
        rows[:, 0] = rng.integers(0, 80, n)
        rows[:, 1:3] = rng.uniform(0.2, 0.8, (n, 2))
        rows[:, 3:5] = rng.uniform(0.05, 0.4, (n, 2))
        np.savetxt(os.path.join(lbl_dir, f"img_{i:06d}.txt"), rows, fmt="%.6f")
        paths.append(p)
    list_file = os.path.join(root, "list.txt")
    with open(list_file, "w") as f:
        f.write("\n".join(paths) + "\n")
    sz = sum(os.path.getsize(p) for p in paths) / len(paths) / 1024
    print(f"built {N_IMGS} jpegs, avg {sz:.0f} KB")
    return list_file


def measure(list_file, num_workers, dim=416, native_threads=0):
    ds = ListDataset(list_file, trans_fn=lambda d: T.training_transform(d))
    sampler = CyclicSampler(len(ds.img_list), BS, dim=(dim, dim), seed=1)
    helper = DataHelper(ds, sampler, max_batches=N_BATCHES + 2,
                        num_workers=num_workers, prefetch=0,
                        native_threads=native_threads)
    it = iter(helper)
    next(it)  # warm the pool
    t0 = time.perf_counter()
    n = 0
    for batch in it:
        n += batch["img"].shape[0]
        if n >= N_BATCHES * BS:
            break
    dt = time.perf_counter() - t0
    helper.close()
    return n / dt


def main():
    with tempfile.TemporaryDirectory() as root:
        list_file = build_dataset(root)
        print(f"host cpus: {os.cpu_count()}")
        for w in (0, 4, 8):
            ips = measure(list_file, w)
            print(f"workers={w:2d}: {ips:7.1f} imgs/sec "
                  f"({1000 * BS / ips:6.1f} ms/batch{BS})", flush=True)
        for nt in (2, 4, 8):
            ips = measure(list_file, 0, native_threads=nt)
            print(f"native={nt:2d}: {ips:7.1f} imgs/sec "
                  f"({1000 * BS / ips:6.1f} ms/batch{BS})", flush=True)


if __name__ == "__main__":
    main()
