"""Sub-step timing of the int8 u8-feed entry at bs64/416."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, x, iters=20, repeats=5):
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
rng = np.random.default_rng(0)
calib = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
qtree = Q.build_quantized(params, state, calib)
sp = qtree["s2d"]
sc = qtree["scales"]

B = 64
u8 = jax.jit(lambda k: jax.random.randint(
    k, (B, 416, 416, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(0))


def red(y):
    return y.astype(jnp.float32).mean()


def cut(step):
    def f(u):
        x_q = lax.bitcast_convert_type(u ^ jnp.uint8(128), jnp.int8)
        if step == 0:
            return red(x_q)
        xp = jnp.pad(x_q, ((0, 0), (1, 3), (1, 3), (0, 0)),
                     constant_values=-128)
        xb = Q._space_to_depth4(xp)
        if step == 1:
            return red(xb)
        y4 = Q._conv_i8(sp["stem4_u8"], xb, padding=((0, 0), (0, 0)))
        if step == 2:
            return red(y4)
        y = Q._repack_s2d4_to_s2d2(y4)
        if step == 3:
            return red(y)
        y = Q._conv_i8(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
        if step == 4:
            return red(y)
        r = Q._conv_i8(sp["res0_1"], y, padding=((0, 0), (0, 0)))
        if step == 5:
            return red(r)
        r = Q._conv_i8(sp["res0_2"], r, padding=((1, 1), (1, 1)),
                       residual=y,
                       res_scale=sc["s2d/down0"] / sc["s2d/res0_2"])
        if step == 6:
            return red(r)
        return red(Q._conv_i8(sp["down1"], r, padding=((1, 0), (1, 0))))

    return jax.jit(f)


names = ["bitcast/xor", "pad+s2d4", "stem4 conv", "repack4->2", "down0",
         "res0_1", "res0_2+add", "down1"]
t_prev = 0.0
for i, nm in enumerate(names):
    t = timeit(cut(i), u8)
    print(f"{nm:12s}: {t:7.2f} ms  (delta {t - t_prev:6.2f})", flush=True)
    t_prev = t
for k in ("stem4_u8", "down0", "res0_1", "res0_2", "down1"):
    print(k, sp[k]["w"].shape)
