"""Compare training-mode forward (batch stats) vs eval-mode (running stats)
on the overfit net, and locate where obj=1 cells come from."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"

import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.sampler import CyclicSampler
from yolo_v3_tpu.data import transforms as T
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models.loss import yolo_loss
from yolo_v3_tpu.train.loop import train
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig
from yolo_v3_tpu.ops.decode import decode_all

import tempfile, cv2, os.path as osp

DIM = 32
root = tempfile.mkdtemp()
os.makedirs(osp.join(root, "images")); os.makedirs(osp.join(root, "labels"))
specs = [(0, 16, 8, 48, 40), (1, 24, 28, 56, 56)]
paths = []
rng = np.random.default_rng(0)
for i, (c, x1, y1, x2, y2) in enumerate(specs):
    img = rng.integers(0, 60, (64, 64, 3), dtype=np.uint8)
    img[y1:y2, x1:x2] = [(255, 80, 80), (80, 255, 80)][c]
    p = osp.join(root, "images", f"img_{i:04d}.jpg")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR), [cv2.IMWRITE_JPEG_QUALITY, 95])
    cx, cy = (x1+x2)/2/64, (y1+y2)/2/64
    with open(osp.join(root, "labels", f"img_{i:04d}.txt"), "w") as f:
        f.write(f"{c} {cx:.6f} {cy:.6f} {(x2-x1)/64:.6f} {(y2-y1)/64:.6f}\n")
    paths.append(p)
with open(osp.join(root, "train.txt"), "w") as f:
    f.write("\n".join(paths) + "\n")

A = DIM / 32.0
CFG = YoloConfig(num_classes=2, img_dim=DIM,
    anchors=((4*A,4*A),(6*A,5*A),(5*A,7*A),(10*A,8*A),(8*A,11*A),(12*A,12*A),
             (16*A,14*A),(14*A,18*A),(20*A,20*A)))
TCFG = TrainConfig(lr=1e-3, backbone_lr=1e-3, net_subdivisions=1, multi_scale=False)

def make_data(n):
    ds = ListDataset(osp.join(root, "train.txt"), trans_fn=lambda d: T.eval_transform(d))
    sampler = CyclicSampler(len(ds), 2, seed=0, dim=(DIM, DIM))
    return DataHelper(ds, sampler, max_net_batches=n, net_subdivisions=1, prefetch=0)

params, state = jax.tree.map(jnp.array, D.init_yolonet(
    jax.random.PRNGKey(0), CFG.num_classes, blocks=(1, 1, 1, 1, 1)))
params, state, _, rec = train(make_data(100), params, state, CFG, TCFG,
                              log_fn=lambda l: None)
print("loss", rec.current_stats["loss"], "recall", rec.current_stats["recall"])

ds = ListDataset(osp.join(root, "train.txt"), trans_fn=lambda d: T.eval_transform(d))
samples = [ds.get(i, (DIM, DIM), 0) for i in range(2)]
x = jnp.asarray(np.stack([s["img"] for s in samples]))
labels = jnp.asarray(np.stack([s["label"] for s in samples]))

raws_train, _ = D.apply_yolonet(params, state, x, training=True)
raws_eval, _ = D.apply_yolonet(params, state, x, training=False)
for i, (a, b) in enumerate(zip(raws_train, raws_eval)):
    print(f"scale{i} train-vs-eval maxdiff {float(jnp.abs(a-b).max()):.4f} "
          f"mean {float(jnp.abs(a-b).mean()):.4f}")

l_t, st_t = yolo_loss(raws_train, labels, CFG, DIM)
l_e, st_e = yolo_loss(raws_eval, labels, CFG, DIM)
print("loss(train-mode raws)", float(l_t), "recall", float(st_t["recall"]))
print("loss(eval-mode raws)", float(l_e), "recall", float(st_e["recall"]))

for name, raws in (("train", raws_train), ("eval", raws_eval)):
    flat = decode_all(raws, CFG, DIM)
    for b in range(2):
        rows = np.asarray(flat[b])
        t = np.argmax(rows[:, 4])
        r = rows[t]
        print(f"{name} img{b} top obj={r[4]:.3f} idx={t} box=({r[0]:.1f},{r[1]:.1f},{r[2]:.1f},{r[3]:.1f}) cls={r[5:].round(2)}")

# --- recalibrate BN then re-check eval forward -----------------------------
state2 = D.recalibrate_bn(params, state, x)
raws_recal, _ = D.apply_yolonet(params, state2, x, training=False)
for i, (a, b) in enumerate(zip(raws_train, raws_recal)):
    print(f"scale{i} train-vs-recal maxdiff {float(jnp.abs(a-b).max()):.4f}")

from yolo_v3_tpu.detector import Detector
det = Detector(params, state2, CFG, precision="fp32")
imgs = [cv2.cvtColor(cv2.imread(pth), cv2.COLOR_BGR2RGB) for pth in paths]
out = det.detect(imgs, conf_thr=0.2, nms_thr=0.4)
for i, rows in enumerate(out):
    for r in rows[:3]:
        print(f"img{i} det cls={int(r[0])} xywh=({r[1]:.1f},{r[2]:.1f},{r[3]:.1f},{r[4]:.1f}) prob={r[5]:.2f}")
