"""Train-step cost breakdown at bs16/416 bf16: forward-only vs +loss vs
+grad vs full step (optimizer+update), differenced where possible."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.optimizer import make_optimizer
from yolo_v3_tpu.train.step import make_train_step, loss_fn
from yolo_v3_tpu.utils.config import YoloConfig, TrainConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, args, iters=10, repeats=4):
    sync(fn(*args))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


config = YoloConfig()
params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
B, DIM = 16, 416
imgs = jax.jit(lambda k: jax.random.uniform(k, (B, DIM, DIM, 3), jnp.float32))(
    jax.random.PRNGKey(0))
labels = np.zeros((B, config.max_labels, 5), np.float32)
labels[:, :3, :] = [1, 0.5, 0.5, 0.3, 0.3]
labels = jnp.asarray(labels)

cd = jnp.bfloat16

fwd = jax.jit(lambda p, s, x: jax.tree.map(
    lambda r: r.astype(jnp.float32).mean(),
    D.apply_yolonet(jax.tree.map(lambda a: a.astype(cd), p), s,
                    x.astype(cd), training=True)[0]))
t_fwd = timeit(fwd, (params, state, imgs))
print(f"forward (training=True)     : {t_fwd:7.2f} ms", flush=True)

lossf = jax.jit(lambda p, s, x, y: loss_fn(p, s, x, y, config,
                                           compute_dtype=cd)[0])
t_loss = timeit(lossf, (params, state, imgs, labels))
print(f"forward+loss                : {t_loss:7.2f} ms (delta {t_loss-t_fwd:6.2f})",
      flush=True)

gradf = jax.jit(lambda p, s, x, y: jax.tree.map(
    lambda g: g.astype(jnp.float32).mean() if hasattr(g, 'astype') else g,
    jax.grad(lambda pp: loss_fn(pp, s, x, y, config, compute_dtype=cd)[0])(p)))
t_grad = timeit(gradf, (params, state, imgs, labels))
print(f"forward+loss+grad           : {t_grad:7.2f} ms (delta {t_grad-t_loss:6.2f})",
      flush=True)

tcfg = TrainConfig(lr=1e-3, backbone_lr=1e-4, compute_dtype="bfloat16")
tx = make_optimizer(params, tcfg)
opt_state = tx.init(params)
step = make_train_step(config, tx, compute_dtype=cd)
imgs1 = imgs[None]
labels1 = labels[None]
p, s, o, st = step(params, state, opt_state, imgs1, labels1)
sync(st)


def full(p_, s_, o_):
    return step(p_, s_, o_, imgs1, labels1)[3]


t_full = timeit(full, (p, s, o))
print(f"full step (scan+opt+update) : {t_full:7.2f} ms (delta {t_full-t_grad:6.2f})",
      flush=True)
print(f"-> {B / t_full * 1e3:7.1f} imgs/sec at bs{B}/{DIM}", flush=True)
