"""Train-step stage attribution (bs64, 416, bf16): where do the 164 ms go?

Variants (differenced jit chains, carry-threaded):
  fwd       — loss_fn forward only (loss value; no grad)
  grad      — value_and_grad (full train compute, no optimizer)
  full      — the shipping make_train_step (S=1)
  loss_only — forward to raw heads, then target-build+loss alone ("loss")
  net_only  — forward to raw heads only (no loss)

Interpretation: grad-fwd ~ backward; fwd-net_only ~ loss+targets on the
forward side; full-grad ~ optimizer/accumulation overhead.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

sys.path.insert(0, "/root/repo")
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models.loss import yolo_loss
from yolo_v3_tpu.train.optimizer import make_optimizer
from yolo_v3_tpu.train.step import loss_fn, make_train_step
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

B, DIM = 64, 416
config = YoloConfig()


def timed(fn, args, n):
    @jax.jit
    def chain(args):
        def body(i, carry):
            a, acc = carry
            v = fn(*a)
            t = (v > 1e18).astype(jnp.float32)
            imgs = a[0].at[(0,) * a[0].ndim].add(t.astype(a[0].dtype))
            return ((imgs,) + a[1:], acc + v)
        _, acc = lax.fori_loop(0, n, body, (args, jnp.float32(0)))
        return acc

    t0 = time.perf_counter()
    np.asarray(chain(args))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain(args))
    return time.perf_counter() - t0, c


def main():
    params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, DIM, DIM, 3)).astype(np.float32),
                       jnp.bfloat16)
    labels = np.zeros((B, config.max_labels, 5), np.float32)
    labels[:, :4] = [[0, 0.3, 0.3, 0.2, 0.2], [1, 0.7, 0.6, 0.3, 0.3],
                     [2, 0.5, 0.5, 0.1, 0.4], [3, 0.2, 0.8, 0.15, 0.15]]
    labels = jnp.asarray(labels)

    params16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def net_only(im, lb):
        raws, _ = D.apply_yolonet(params16, state, im.astype(jnp.bfloat16),
                                  training=True)
        return sum(r.astype(jnp.float32).sum() for r in raws)

    def fwd(im, lb):
        loss, _ = loss_fn(params, state, im, lb, config=config,
                          compute_dtype=jnp.bfloat16)
        return loss

    grad_fn = jax.value_and_grad(
        lambda p, im, lb: loss_fn(p, state, im, lb, config=config,
                                  compute_dtype=jnp.bfloat16)[0])

    def grad(im, lb):
        loss, grads = grad_fn(params, im, lb)
        return loss + jax.tree.leaves(grads)[0].astype(jnp.float32).sum()

    for name, fn in (("net_only", net_only), ("fwd", fwd), ("grad", grad)):
        t2, c = timed(fn, (imgs, labels), 2)
        t6, _ = timed(fn, (imgs, labels), 6)
        print(f"{name:9s} per-call {(t6-t2)/4.0*1e3:8.2f} ms "
              f"(compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
