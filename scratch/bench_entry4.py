"""Measure the s2d4 stem entry vs the legacy s2d2 entry on the real chip.

Segments at bs64/416 (20-iter loops of >5ms workloads; see CLAUDE.md timing
methodology): entry-only (image -> down1 output, reduced), full int8 forward,
full e2e with postprocess — for legacy stem, stem4 (float feed), and
stem4_u8 (uint8 feed).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.ops.postprocess import postprocess_from_raws
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, *args, iters=20):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


config = YoloConfig()
params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
rng = np.random.default_rng(0)
calib = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
qtree = Q.build_quantized(params, state, calib)
legacy = dict(qtree)
legacy["s2d"] = {k: v for k, v in qtree["s2d"].items()
                 if not k.startswith("stem4")}

B = 64
x = jax.jit(lambda k: jax.random.uniform(k, (B, 416, 416, 3), jnp.float32))(
    jax.random.PRNGKey(0))
u8 = jax.jit(lambda k: jax.random.randint(k, (B, 416, 416, 3), 0, 256,
                                          jnp.uint8))(jax.random.PRNGKey(1))


def entry_fp(q):
    def f(x):
        xq = Q.quantize_image(x, q["scales"]["image"])
        y = Q._entry_s2d(q, xq, "stem4" if "stem4" in q["s2d"] else "stem")
        return y.astype(jnp.float32).mean()
    return jax.jit(f)


@jax.jit
def entry_u8(u):
    xq = lax.bitcast_convert_type(u ^ jnp.uint8(128), jnp.int8)
    y = Q._entry_s2d(qtree, xq, "stem4_u8")
    return y.astype(jnp.float32).mean()


def fwd(apply, q, inp):
    return jax.jit(lambda v: [r.astype(jnp.float32).mean()
                              for r in apply(q, v)])


print(f"entry legacy (fp)  : {timeit(entry_fp(legacy), x):6.2f} ms")
print(f"entry stem4  (fp)  : {timeit(entry_fp(qtree), x):6.2f} ms")
print(f"entry stem4  (u8)  : {timeit(entry_u8, u8):6.2f} ms")

print(f"fwd legacy   (fp)  : "
      f"{timeit(fwd(Q.apply_yolonet_quantized, legacy, x), x):6.2f} ms")
print(f"fwd stem4    (fp)  : "
      f"{timeit(fwd(Q.apply_yolonet_quantized, qtree, x), x):6.2f} ms")
print(f"fwd stem4    (u8)  : "
      f"{timeit(fwd(Q.apply_yolonet_quantized_u8, qtree, u8), u8):6.2f} ms")

e2e_fp = jax.jit(lambda v: postprocess_from_raws(
    Q.apply_yolonet_quantized(qtree, v), config, 416,
    config.conf_thr, config.nms_thr))
e2e_u8 = jax.jit(lambda v: postprocess_from_raws(
    Q.apply_yolonet_quantized_u8(qtree, v), config, 416,
    config.conf_thr, config.nms_thr))
ms = timeit(e2e_fp, x)
print(f"e2e stem4    (fp)  : {ms:6.2f} ms  ({B / ms * 1e3:6.0f} imgs/s)")
ms = timeit(e2e_u8, u8)
print(f"e2e stem4    (u8)  : {ms:6.2f} ms  ({B / ms * 1e3:6.0f} imgs/s)")
