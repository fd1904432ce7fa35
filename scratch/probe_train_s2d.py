"""On-chip A/B: training step with plain vs s2d entry (VERDICT r2 item 4).

Times the full bs64/416 bf16 net-batch step (S=1) both ways with the
differenced-chain methodology, plus loss/grad-norm parity on one batch.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.optimizer import make_optimizer
from yolo_v3_tpu.train.step import make_train_step
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

B, DIM = 64, 416
cfg = YoloConfig(num_classes=80)
tcfg = TrainConfig(lr=1e-4, backbone_lr=1e-4)

params, state = D.init_yolonet(jax.random.PRNGKey(0), 80)
tx = make_optimizer(params, tcfg)
opt0 = tx.init(params)

rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.uniform(0, 1, (1, B, DIM, DIM, 3)).astype(np.float32))
labels = np.zeros((1, B, 30, 5), np.float32)
labels[0, :, 0] = [1, 0.5, 0.5, 0.4, 0.3]
labels = jnp.asarray(labels)


def run(s2d):
    step = make_train_step(cfg, tx, compute_dtype=jnp.bfloat16, s2d_entry=s2d)

    def chain(n):
        @jax.jit
        def f(params, state, opt):
            def body(i, carry):
                p, s, o = carry
                p, s, o, stats = step(p, s, o, imgs, labels)  # jit inlines
                return (p, s, o)
            return jax.lax.fori_loop(0, n, body, (params, state, opt))
        t0 = time.perf_counter()
        out = f(params, state, opt0)
        np.asarray(jax.tree.leaves(out[0])[0])
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = f(params, state, opt0)
        np.asarray(jax.tree.leaves(out[0])[0])
        return time.perf_counter() - t0, tc

    t2, c2 = chain(2)
    t6, _ = chain(6)
    per = (t6 - t2) / 4.0
    # parity artifacts: stats after one step
    p, s, o, stats = step(params, state, opt0, imgs, labels)
    host = {k: float(np.asarray(v)) for k, v in stats.items()}
    return per, c2, host


per0, c0, st0 = run(False)
print(f"plain  {per0*1e3:7.1f} ms/net-batch  {B/per0:6.0f} imgs/s "
      f"(compile {c0:.0f}s) loss={st0['loss']:.4f}", flush=True)
per1, c1, st1 = run(True)
print(f"s2d    {per1*1e3:7.1f} ms/net-batch  {B/per1:6.0f} imgs/s "
      f"(compile {c1:.0f}s) loss={st1['loss']:.4f}", flush=True)
print(f"speedup x{per0/per1:.3f}   dloss={abs(st0['loss']-st1['loss']):.5f}",
      flush=True)
