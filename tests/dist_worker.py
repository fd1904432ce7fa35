"""Child worker for the REAL 2-process jax.distributed test.

Each process of a 2-process CPU "slice" (1 local device each, localhost
coordinator) runs this script: `dist.initialize()` via the env-var path
(the branch that is a no-op in every in-process test), a global 2-device
mesh, one DP train step on its process-local half of a deterministic
global net-batch, and writes the resulting (replicated) params to disk.
The parent test compares them against the single-process run of the same
global batch.  SURVEY §2.3 multi-host contract; the reference is
single-process (no counterpart).

Usage: dist_worker.py OUT.npz   (env: JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID — absent => single-process run)
"""

import os
import sys

import numpy as np


def global_batch():
    """Deterministic tiny net-batch: [S=1, B=4, 64, 64, 3] images and
    [1, 4, T, 5] labels, identical on every process."""
    rng = np.random.default_rng(0)
    imgs = rng.uniform(0, 1, (1, 4, 64, 64, 3)).astype(np.float32)
    labels = np.zeros((1, 4, 30, 5), np.float32)
    for b in range(4):  # one box per image, class alternating
        labels[0, b, 0] = [b % 2, 0.5, 0.5, 0.4, 0.3]
    return imgs, labels


def main():
    out = sys.argv[1]
    import jax
    import jax.numpy as jnp

    from yolo_v3_tpu.models import darknet as D
    from yolo_v3_tpu.parallel import distributed as dist
    from yolo_v3_tpu.parallel import mesh as M
    from yolo_v3_tpu.train.optimizer import make_optimizer
    from yolo_v3_tpu.train.step import make_train_step
    from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig

    ctx = dist.initialize()  # env-var configuration path
    n = ctx.num_processes
    if n > 1:
        assert ctx.is_distributed
        assert jax.process_count() == n, jax.process_count()
        assert len(jax.local_devices()) == 1
        assert len(jax.devices()) == n, jax.devices()

    mesh = dist.make_global_mesh(space=1)
    cfg = YoloConfig(num_classes=2, img_dim=64)
    params, state = D.init_yolonet(jax.random.PRNGKey(0), 2,
                                   blocks=(1, 1, 1, 1, 1))
    tx = make_optimizer(params, TrainConfig(lr=1e-3, backbone_lr=1e-4))
    step = make_train_step(cfg, tx)

    imgs, labels = global_batch()
    # each process contributes its contiguous shard of the global batch,
    # exactly what make_data_helper(host_id, n_hosts) hands it
    sl = slice(ctx.process_id * 4 // n, (ctx.process_id + 1) * 4 // n)
    gi, gl = dist.shard_train_inputs_global(mesh, imgs[:, sl], labels[:, sl])
    p = dist.replicate_global(mesh, params)
    s = dist.replicate_global(mesh, state)
    o = dist.replicate_global(mesh, tx.init(params))

    p2, *_ = step(p, s, o, gi, gl)
    # replicated outputs are fully addressable on every process
    flat = {f"p{i}": np.asarray(x)
            for i, x in enumerate(jax.tree.leaves(p2))}
    if ctx.process_id == 0:
        np.savez(out, **flat)
    print(f"proc {ctx.process_id}/{n}: ok", flush=True)


if __name__ == "__main__":
    main()
