"""Per-stage timing of the CURRENT int8 serving path (u8 feed, stem4)
at bs64/416.  Cumulative prefixes, min-of-R repeats of 20-iter pipelined
loops per prefix (tunnel dispatch jitter ~1-2 ms per loop otherwise).
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

B = 64
u8 = jax.jit(lambda k: jax.random.randint(
    k, (B, 416, 416, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(0))


def reduce_out(y):
    if isinstance(y, tuple):
        return [r.astype(jnp.float32).mean() for r in y]
    return y.astype(jnp.float32).mean()


def prefix(n_stages, with_heads=False, with_post=False):
    def f(u):
        x_q = lax.bitcast_convert_type(u ^ jnp.uint8(128), jnp.int8)
        y = Q._entry_s2d(qtree, x_q, "stem4_u8")
        if n_stages == 0:
            return reduce_out(y)
        routes = []
        qb = qtree["backbone"]
        first = min(int(k[5:]) for k in qb if k.startswith("stage"))
        for i in range(first, first + n_stages):
            qst = qb[f"stage{i}"]
            if "down" in qst:
                y = Q._conv_i8(qst["down"], y, stride=2)
            b = 0
            while f"res{b}" in qst:
                rb = qst[f"res{b}"]
                r = Q._conv_i8(rb["conv1"], y)
                y = Q._conv_i8(rb["conv2"], r, residual=y,
                               res_scale=rb["res_scale"])
                b += 1
            routes.append(y)
        if not with_heads:
            return reduce_out(y)
        raws = Q._yolonet_tail(qtree,
                               Q._entry_s2d(qtree, x_q, "stem4_u8"))
        if not with_post:
            return reduce_out(raws)
        return postprocess_from_raws(raws, config, 416, config.conf_thr,
                                     config.nms_thr)

    return jax.jit(f)


# stage numbering: backbone stages are stage2..stage5 after the s2d fold?
qb = qtree["backbone"]
stage_ids = sorted(int(k[5:]) for k in qb if k.startswith("stage"))
print("backbone stage keys:", stage_ids, flush=True)

# int8 GOP per image per segment (MACs*2)
GOP = {
    # original-conv FLOPs (the s2d remap reorganizes, not adds, math):
    # stem 3x3 3->32 @416^2, down0 3x3 s2 32->64, res0 (1x1+3x3) @208^2,
    # down1 3x3 s2 64->128
    "entry": 2 * (416 * 416 * 3 * 9 * 32 + 208 * 208 * 32 * 9 * 64
                  + 208 * 208 * (64 * 32 + 32 * 9 * 64)
                  + 104 * 104 * 64 * 9 * 128) / 1e9,
    "stage1": 2 * (104 * 104 * 2 * (128 * 64 + 64 * 9 * 128)) / 1e9,
    "stage2": 2 * (52 * 52 * 128 * 9 * 256
                   + 52 * 52 * 8 * (256 * 128 + 128 * 9 * 256)) / 1e9,
    "stage3": 2 * (26 * 26 * 256 * 9 * 512
                   + 26 * 26 * 8 * (512 * 256 + 256 * 9 * 512)) / 1e9,
    "stage4": 2 * (13 * 13 * 512 * 9 * 1024
                   + 13 * 13 * 4 * (1024 * 512 + 512 * 9 * 1024)) / 1e9,
    "heads": 2 * (13 * 13 * (3 * (1024 * 512 + 512 * 9 * 1024) + 1024 * 255)
                  + 13 * 13 * 512 * 256
                  + 26 * 26 * ((768 * 256 + 256 * 9 * 512)
                               + 2 * (512 * 256 + 256 * 9 * 512) + 512 * 255)
                  + 26 * 26 * 256 * 128
                  + 52 * 52 * ((384 * 128 + 128 * 9 * 256)
                               + 2 * (256 * 128 + 128 * 9 * 256)
                               + 256 * 255)) / 1e9,
}

times = {}
t_prev = timeit(prefix(0), u8)
times["entry"] = t_prev
print(f"entry (u8->down1)       : {t_prev:7.2f} ms", flush=True)
for n, name in zip((1, 2, 3, 4), ("stage1", "stage2", "stage3", "stage4")):
    t = timeit(prefix(n), u8)
    times[name] = t - t_prev
    print(f"+ {name:7s}             : {t:7.2f} ms  (delta {t - t_prev:6.2f})",
          flush=True)
    t_prev = t
t = timeit(prefix(4, with_heads=True), u8)
times["heads"] = t - t_prev
print(f"+ heads/ups             : {t:7.2f} ms  (delta {t - t_prev:6.2f})",
      flush=True)
t_prev = t
t = timeit(prefix(4, with_heads=True, with_post=True), u8)
times["post"] = t - t_prev
print(f"+ decode/NMS            : {t:7.2f} ms  (delta {t - t_prev:6.2f})",
      flush=True)

print(f"\ntotal e2e: {t:7.2f} ms -> {B / t * 1e3:7.1f} imgs/sec", flush=True)
print("\nper-segment int8 rates (bs64):")
for k, gop in GOP.items():
    ms = times[k]
    if ms > 0.05:
        print(f"  {k:8s}: {gop * B / ms:7.1f} TOP/s  "
              f"({gop * B:6.1f} GOP / {ms:5.2f} ms)")
