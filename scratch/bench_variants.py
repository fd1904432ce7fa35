"""Quick e2e timing of the three serving variants at bs64/416."""
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


def timeit(fn, x, iters=20, repeats=4):
    sync(fn(x))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


config = YoloConfig()
params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
folded = D.cast_params(
    D.fold_space_to_depth(D.fold_batchnorm(params, state)), jnp.bfloat16)
rng = np.random.default_rng(0)
calib = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
qtree = Q.build_quantized(params, state, calib)

B = 64
xf = jax.jit(lambda k: jax.random.uniform(k, (B, 416, 416, 3), jnp.float32))(
    jax.random.PRNGKey(0))
xb = jax.jit(lambda v: v.astype(jnp.bfloat16))(xf)
u8 = jax.jit(lambda k: jax.random.randint(
    k, (B, 416, 416, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(0))

post = lambda raws: postprocess_from_raws(raws, config, 416,
                                          config.conf_thr, config.nms_thr)
runs = [
    ("bf16    ", jax.jit(lambda x: post(D.apply_yolonet_folded(folded, x))), xb),
    ("int8 f32", jax.jit(lambda x: post(Q.apply_yolonet_quantized(qtree, x))), xf),
    ("int8 u8 ", jax.jit(lambda u: post(Q.apply_yolonet_quantized_u8(qtree, u))), u8),
]
for name, fn, x in runs:
    ms = timeit(fn, x)
    print(f"{name}: {ms:6.2f} ms/batch{B} = {B / ms * 1e3:7.1f} imgs/sec",
          flush=True)
