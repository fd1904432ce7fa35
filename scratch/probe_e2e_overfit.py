"""Find a fast-converging overfit recipe for the train->detect e2e test.

CPU mesh, tiny net, 2 synthetic images with bright rectangles, dim 32.
Stages of training with detection checks between stages.
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.sampler import CyclicSampler
from yolo_v3_tpu.data import transforms as T
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.loop import train
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig
from yolo_v3_tpu.detector import Detector

import tempfile, cv2, os.path as osp

DIM = int(os.environ.get("DIM", 32))
LR = float(os.environ.get("LR", 1e-3))
STAGES = int(os.environ.get("STAGES", 6))
PER = int(os.environ.get("PER", 25))

root = tempfile.mkdtemp()
os.makedirs(osp.join(root, "images"))
os.makedirs(osp.join(root, "labels"))

# 2 images 64x64, one bright rectangle each, distinct class + position
specs = [
    (0, 16, 8, 48, 40),    # 32x32 box
    (1, 24, 28, 56, 56),   # 32x28 box
]
paths, gts = [], []
rng = np.random.default_rng(0)
for i, (c, x1, y1, x2, y2) in enumerate(specs):
    img = rng.integers(0, 60, (64, 64, 3), dtype=np.uint8)
    color = [(255, 80, 80), (80, 255, 80)][c]
    img[y1:y2, x1:x2] = color
    p = osp.join(root, "images", f"img_{i:04d}.jpg")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR), [cv2.IMWRITE_JPEG_QUALITY, 95])
    cx, cy = (x1 + x2) / 2 / 64, (y1 + y2) / 2 / 64
    w, h = (x2 - x1) / 64, (y2 - y1) / 64
    with open(osp.join(root, "labels", f"img_{i:04d}.txt"), "w") as f:
        f.write(f"{c} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}\n")
    paths.append(p)
    gts.append((c, x1, y1, x2, y2))
with open(osp.join(root, "train.txt"), "w") as f:
    f.write("\n".join(paths) + "\n")

# anchors sized for DIM-scale boxes (GT is ~16px at dim 32)
A = DIM / 32.0
CFG = YoloConfig(
    num_classes=2, img_dim=DIM,
    anchors=((4*A, 4*A), (6*A, 5*A), (5*A, 7*A),
             (10*A, 8*A), (8*A, 11*A), (12*A, 12*A),
             (16*A, 14*A), (14*A, 18*A), (20*A, 20*A)),
)
TCFG = TrainConfig(lr=LR, backbone_lr=LR, net_subdivisions=1, multi_scale=False)

def make_data(n):
    ds = ListDataset(osp.join(root, "train.txt"),
                     trans_fn=lambda dim: T.eval_transform(dim))
    sampler = CyclicSampler(len(ds), 2, seed=0, dim=(DIM, DIM))
    return DataHelper(ds, sampler, max_net_batches=n, net_subdivisions=1, prefetch=0)

imgs = [cv2.cvtColor(cv2.imread(pth), cv2.COLOR_BGR2RGB) for pth in paths]

def check(p, s, verbose=False):
    det = Detector(p, s, CFG, precision="fp32")
    out = det.detect(imgs, conf_thr=0.2, nms_thr=0.4)
    ok = 0
    for i, ((c, x1, y1, x2, y2), rows) in enumerate(zip(gts, out)):
        best = 0.0
        for r in rows:
            rc, rx, ry, rw, rh = int(r[0]), *r[1:5]
            bx1, by1, bx2, by2 = rx - rw/2, ry - rh/2, rx + rw/2, ry + rh/2
            ix = max(0, min(bx2, x2) - max(bx1, x1))
            iy = max(0, min(by2, y2) - max(by1, y1))
            inter = ix * iy
            union = (x2-x1)*(y2-y1) + (bx2-bx1)*(by2-by1) - inter
            iou = inter / union if union else 0
            if verbose:
                print(f"   img{i} det cls={rc} ({bx1:.0f},{by1:.0f},{bx2:.0f},{by2:.0f}) p={r[5]:.2f} iou={iou:.2f}")
            if rc == c and iou > 0.5:
                best = max(best, iou)
        ok += best > 0.5
    return ok

params, state = jax.tree.map(jnp.array, D.init_yolonet(
    jax.random.PRNGKey(0), CFG.num_classes, blocks=(1, 1, 1, 1, 1)))
total = 0
for stage in range(STAGES):
    t0 = time.time()
    lines = []
    params, state, _, rec = train(make_data(PER), params, state, CFG, TCFG,
                                  log_fn=lambda l: lines.append(l))
    total += PER
    dt = time.time() - t0
    st = rec.current_stats
    ok = check(params, state, verbose=(stage == STAGES - 1))
    print(f"nb={total} ({dt:.0f}s, {dt/PER*1000:.0f}ms/nb) loss={st['loss']:.3f} "
          f"recall={st.get('recall', -1):.2f} matched={ok}/{len(gts)}", flush=True)
    if ok == len(gts):
        break
