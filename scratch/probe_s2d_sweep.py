"""Round-5 probe: s2d train-entry fate — bs64 train step at dims 320/416/608.

VERDICT r4 weak #3: `train_ms_per_step_bs64_416_s2d` (177.9) loses to the
plain entry (163.9) at 416, but the entry's share of step time grows with
dim^2 relative to depth — this sweep confirms or refutes a crossover at
320/608 so the TrainConfig.s2d_entry default can be decided with data.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scratch/probe_s2d_sweep.py
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.optimizer import make_optimizer
from yolo_v3_tpu.train.step import make_train_step
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()


def _sync(tree):
    return np.asarray(jax.tree.leaves(tree)[0].ravel()[0:1])


def main():
    chiplock.acquire("probe_s2d_sweep")
    config = YoloConfig()
    tcfg = TrainConfig(lr=1e-3, backbone_lr=1e-4, compute_dtype="bfloat16")
    params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
    tx = make_optimizer(params, tcfg)

    B = 64
    labels = np.zeros((1, B, config.max_labels, 5), np.float32)
    labels[..., :3, :] = [1, 0.5, 0.5, 0.3, 0.3]
    labels = jnp.asarray(labels)

    rows = {}
    for s2d in (False, True):
        step = make_train_step(config, tx, compute_dtype=jnp.bfloat16,
                               s2d_entry=s2d)
        for dim in (320, 416, 608):
            imgs = jax.jit(lambda k, d=dim: jax.random.uniform(
                k, (1, B, d, d, 3), jnp.float32))(jax.random.PRNGKey(dim))
            o = tx.init(params)
            p, s, o, st = step(params, state, o, imgs, labels)
            _sync(st)
            t0 = time.perf_counter()
            iters = 8
            for _ in range(iters):
                p, s, o, st = step(p, s, o, imgs, labels)
            _sync(st)
            ms = (time.perf_counter() - t0) / iters * 1e3
            rows[(dim, s2d)] = ms
            print(f"dim {dim} s2d={int(s2d)}: {ms:7.2f} ms/step "
                  f"({B / ms * 1e3:6.1f} imgs/s)", flush=True)

    print("\ndim  plain    s2d     delta")
    for dim in (320, 416, 608):
        a, b = rows[(dim, False)], rows[(dim, True)]
        print(f"{dim}  {a:7.2f}  {b:7.2f}  {100 * (b - a) / a:+.1f}%")
    chiplock.release()


if __name__ == "__main__":
    main()
