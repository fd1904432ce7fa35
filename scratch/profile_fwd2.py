"""Finer int8 forward profile: entry pieces, heads, and bs128 e2e.

Cumulative-prefix differencing on the quantized serving net at 416.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.ops.postprocess import postprocess_from_raws
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, inputs, iters=20):
    sync(fn(inputs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


config = YoloConfig()
params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
rng = np.random.default_rng(0)
calib = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
qtree = Q.build_quantized(params, state, calib)

B = 64
gen = jax.jit(lambda k: jax.random.uniform(k, (B, 416, 416, 3), jnp.float32))
xs = [gen(jax.random.PRNGKey(i)) for i in range(2)]

full = jax.jit(lambda x: [r.astype(jnp.float32).mean()
                          for r in Q.apply_yolonet_quantized(qtree, x)])
ms_full = timeit(full, xs)
print(f"fwd full              : {ms_full:7.3f} ms", flush=True)

# bs128 e2e
gen128 = jax.jit(lambda k: jax.random.uniform(k, (128, 416, 416, 3), jnp.float32))
xs128 = [gen128(jax.random.PRNGKey(i)) for i in range(2)]
e2e = jax.jit(lambda x: postprocess_from_raws(
    Q.apply_yolonet_quantized(qtree, x), config, 416,
    config.conf_thr, config.nms_thr))
ms = timeit(e2e, xs128, iters=10)
print(f"e2e bs128             : {ms:7.3f} ms ({128 / ms * 1e3:7.1f} imgs/sec)",
      flush=True)
ms = timeit(e2e, xs, iters=10) if False else None

# bs96
gen96 = jax.jit(lambda k: jax.random.uniform(k, (96, 416, 416, 3), jnp.float32))
xs96 = [gen96(jax.random.PRNGKey(i)) for i in range(2)]
ms = timeit(e2e, xs96, iters=10)
print(f"e2e bs96              : {ms:7.3f} ms ({96 / ms * 1e3:7.1f} imgs/sec)",
      flush=True)
