"""Debug the train/infer mismatch: train tiny net, then compare plain
eval-mode forward vs folded forward vs detector output."""
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

# Build the EXACT training feed batch (letterboxed via cv2)
ds = ListDataset(osp.join(root, "train.txt"), trans_fn=lambda d: T.eval_transform(d))
batch = np.stack([ds.get(i, (DIM, DIM), 0)["img"] for i in range(2)])
x = jnp.asarray(batch)
print("feed range", batch.min(), batch.max(), batch.shape)

# 1. plain eval-mode forward
raws_plain, _ = D.apply_yolonet(params, state, x, training=False)
# 2. folded forward
folded = D.fold_batchnorm(params, state)
raws_folded = D.apply_yolonet_folded(folded, x)
# 3. folded+s2d
folded_s2d = D.fold_space_to_depth(folded)
raws_s2d = D.apply_yolonet_folded(folded_s2d, x)

for name, raws in [("plain", raws_plain), ("folded", raws_folded), ("s2d", raws_s2d)]:
    print(name, [np.abs(np.asarray(r)).max() for r in raws])
for a, b in zip(raws_plain, raws_folded):
    print("plain-vs-folded maxdiff", float(jnp.abs(a - b).max()))
for a, b in zip(raws_plain, raws_s2d):
    print("plain-vs-s2d maxdiff", float(jnp.abs(a - b).max()))

# decode the plain raws and look at top candidates per image
dets = decode_all(raws_plain, CFG, DIM)
print("decoded shape", [d.shape for d in dets] if isinstance(dets, (list, tuple)) else dets.shape)
flat = jnp.concatenate([d.reshape(2, -1, 5 + CFG.num_classes) for d in dets], axis=1) if isinstance(dets, (list, tuple)) else dets
for b in range(2):
    rows = np.asarray(flat[b])
    obj = rows[:, 4]
    top = np.argsort(-obj)[:4]
    for t in top:
        r = rows[t]
        print(f"img{b} obj={r[4]:.3f} box=({r[0]:.1f},{r[1]:.1f},{r[2]:.1f},{r[3]:.1f}) cls={r[5:].round(2)}")
