#!/usr/bin/env python
"""Input-pipeline feed rate vs device step rate.

Measures DataHelper assembly throughput (JPEG decode + darknet augmentation
+ letterbox + collate) at several worker counts, against the device train
step rate it must feed (reference comparison: torch DataLoader workers,
reference dataset.py:461-465).

Usage:
    python scripts/bench_input_pipeline.py --train-list data/train.txt \
        [--dim 416] [--batch 16] [--batches 20] [--workers 0 2 4 8]

Without --train-list a synthetic JPEG dataset is generated (shapes match
COCO-ish images), which still exercises the full cv2 pipeline.
"""

import argparse
import tempfile
import time

import numpy as np


def synthetic_list(n=64, lo=320, hi=640) -> str:
    import cv2
    import os

    root = tempfile.mkdtemp(prefix="feedbench_")
    img_dir = f"{root}/images"
    lbl_dir = f"{root}/labels"
    os.makedirs(img_dir)
    os.makedirs(lbl_dir)
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        h, w = int(rng.integers(lo, hi)), int(rng.integers(lo, hi))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = f"{img_dir}/img_{i:04d}.jpg"
        cv2.imwrite(p, img)
        rows = np.zeros((3, 5), np.float32)
        rows[:, 0] = rng.integers(0, 80, 3)
        rows[:, 1:3] = rng.uniform(0.3, 0.7, (3, 2))
        rows[:, 3:5] = rng.uniform(0.1, 0.3, (3, 2))
        np.savetxt(f"{lbl_dir}/img_{i:04d}.txt", rows, fmt="%.6f")
        paths.append(p)
    lst = f"{root}/list.txt"
    with open(lst, "w") as f:
        f.write("\n".join(paths) + "\n")
    return lst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-list", default=None)
    ap.add_argument("--dim", type=int, default=416)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--batches", type=int, default=20)
    ap.add_argument("--workers", type=int, nargs="+", default=[0, 2, 4])
    ap.add_argument("--native-threads", type=int, nargs="+", default=[2, 4, 8],
                    help="also bench the C++ decode+augment path "
                         "(data/native_aug.py) at these thread counts")
    args = ap.parse_args()

    from yolo_v3_tpu.data.datasets import ListDataset
    from yolo_v3_tpu.data.loader import DataHelper
    from yolo_v3_tpu.data.sampler import CyclicSampler
    from yolo_v3_tpu.data import transforms as T

    lst = args.train_list or synthetic_list()

    def run(tag, **dh_kw):
        ds = ListDataset(lst, trans_fn=lambda d: T.training_transform(d))
        sampler = CyclicSampler(len(ds), args.batch, seed=0,
                                dim=(args.dim, args.dim))
        dh = DataHelper(ds, sampler, max_batches=args.batches, prefetch=2,
                        **dh_kw)
        it = iter(dh)
        next(it)  # warm the pool
        t0 = time.perf_counter()
        n = 1
        for batch in it:
            n += 1
        dt = time.perf_counter() - t0
        rate = (n - 1) * args.batch / dt
        print(f"{tag}: {rate:8.1f} imgs/sec assembled "
              f"({dt / (n - 1) * 1e3:.1f} ms/batch{args.batch})")
        dh.close()

    for nw in args.workers:
        run(f"python workers={nw}", num_workers=nw)
    from yolo_v3_tpu.data.native_loader import native_available
    if native_available():
        for nt in args.native_threads:
            run(f"native threads={nt}", native_threads=nt)

    print("\ncompare against the device step rate (bench.py "
          "train_imgs_per_sec_<dim>): the pipeline feeds the step when "
          "assembled imgs/sec exceeds it.")


if __name__ == "__main__":
    main()
