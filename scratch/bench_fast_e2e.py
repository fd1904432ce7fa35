"""Quick e2e int8 bs64 with/without the fast display postprocess."""
import dataclasses
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

for name, cfg in (
    ("fast k128", config),
    ("fast k64 ", dataclasses.replace(config, display_per_scale_topk=64)),
    ("exact 512", dataclasses.replace(config, display_per_scale_topk=0)),
):
    f = jax.jit(lambda x, c=cfg: postprocess_from_raws(
        Q.apply_yolonet_quantized(qtree, x), c, 416, c.conf_thr, c.nms_thr))
    ms = timeit(f, xs)
    print(f"{name}: {ms:7.3f} ms  ({B / ms * 1e3:7.1f} imgs/sec)", flush=True)
