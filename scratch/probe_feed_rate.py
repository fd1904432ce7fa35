"""Host-only timing of the x_wing train feed (no TPU): where do the
15-20 s/net-batch go?  Replicates the cli train data path (--no-aug
--cache bs64 x4) and times (a) cache-warm epoch iteration, (b) the
micro-batch np.stack assembly in the loop."""
import time
import numpy as np
from yolo_v3_tpu.data.datasets import CVATDataset, CachedDataset
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.sampler import CyclicSampler
from yolo_v3_tpu.data import transforms as T

trans = lambda dim: T.eval_transform(dim, max_labels=50)
ds = CachedDataset(CVATDataset("/root/reference/custom_data/x_wing",
                               "/root/reference/custom_data/5_x_wing.xml",
                               trans_fn=trans))
sampler = CyclicSampler(len(ds), 64, seed=0, dim=(416, 416),
                        rand_dim_interval=256)
data = DataHelper(ds, sampler, max_net_batches=8, net_subdivisions=4)

micro_i, micro_l = [], []
t0 = time.time()
nb = 0
t_asm = 0.0
for sample in data:
    micro_i.append(sample["img"]); micro_l.append(sample["label"])
    if len(micro_i) == 4:
        ta = time.time()
        imgs = np.stack(micro_i).astype(np.float32)
        labels = np.stack(micro_l).astype(np.float32)
        t_asm += time.time() - ta
        micro_i, micro_l = [], []
        nb += 1
        t1 = time.time()
        print(f"nb {nb}: {t1-t0:.2f}s total (stack {t_asm:.2f}s) "
              f"imgs {imgs.shape} {imgs.dtype}", flush=True)
        t0, t_asm = t1, 0.0
