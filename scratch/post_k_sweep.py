"""Postprocess cost vs pre-NMS K, + gather lowering experiments.

Questions:
 1. How much of the 7 ms/batch64 postprocess scales with K (row gather,
    NMS K^2)?  K in {128, 256, 512}.
 2. Is the [B,N,85] row gather latency-bound (per-row dynamic slices)?
    Compare one-row gather vs 8-row-tile gather (top-K/8 tiles).
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


import dataclasses

config = YoloConfig()
params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
rng = np.random.default_rng(0)
calib = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
qtree = Q.build_quantized(params, state, calib)

B = 64
gen = jax.jit(lambda k: jax.random.uniform(k, (B, 416, 416, 3), jnp.float32))
xs = [gen(jax.random.PRNGKey(i)) for i in range(2)]
mk_raws = jax.jit(lambda x: Q.apply_yolonet_quantized(qtree, x))
raws_list = [mk_raws(x) for x in xs]

for K in (512, 256, 128):
    cfg_k = dataclasses.replace(config, pre_nms_topk=K)
    f = jax.jit(lambda r, c=cfg_k: postprocess_from_raws(
        r, c, 416, c.conf_thr, c.nms_thr))
    ms = timeit(f, raws_list)
    print(f"post full K={K:4d}          : {ms:7.3f} ms", flush=True)
    f2 = jax.jit(lambda r, c=cfg_k: postprocess_from_raws(
        r, c, 416, c.conf_thr, c.nms_thr, use_nms=False))
    ms2 = timeit(f2, raws_list)
    print(f"post noNMS K={K:4d}         : {ms2:7.3f} ms", flush=True)

# ---- isolated gather experiments on a [B, N, 128] bf16 tensor ----
N = 10647
flat = jax.jit(lambda k: jax.random.normal(k, (B, N, 128), jnp.bfloat16))(
    jax.random.PRNGKey(7))
idx = jax.jit(lambda k: jax.random.randint(k, (B, 512), 0, N))(
    jax.random.PRNGKey(8))
idx_sorted = jax.jit(lambda i: jnp.sort(i, axis=1))(idx)

for K in (512, 128):
    g1 = jax.jit(lambda a, i: jnp.take_along_axis(
        a, i[:, :K, None], axis=1).astype(jnp.float32).mean())
    print(f"row gather K={K:4d}         : {timeit(lambda p: g1(*p), [(flat, idx)]):7.3f} ms",
          flush=True)
    print(f"row gather K={K:4d} sorted  : {timeit(lambda p: g1(*p), [(flat, idx_sorted)]):7.3f} ms",
          flush=True)
    # tile gather: K/8 tiles of 8 rows
    T = K // 8
    tiles = flat.reshape(B, N // 3 // 1, -1)  # placeholder no-op guard
    g2 = jax.jit(lambda a, i: jnp.take_along_axis(
        a.reshape(B, -1, 8 * 128), (i[:, :T] // 8)[:, :, None], axis=1
    ).astype(jnp.float32).mean())
    # N=10647 not divisible by 8 -> pad
    flat_p = jax.jit(lambda a: jnp.pad(a, ((0, 0), (0, (-N) % 8), (0, 0))))(flat)
    print(f"tile gather {T:3d}x8 rows    : {timeit(lambda p: g2(*p), [(flat_p, idx)]):7.3f} ms",
          flush=True)

# one-hot matmul gather (K=512): int8 onehot x int8? use bf16
oh = jax.jit(lambda i: jax.nn.one_hot(i, N, dtype=jnp.bfloat16))(idx)
g3 = jax.jit(lambda a, o: jnp.einsum("bkn,bnc->bkc", o, a,
                                     preferred_element_type=jnp.float32).mean())
print(f"onehot matmul K=512        : {timeit(lambda p: g3(*p), [(flat, oh)]):7.3f} ms",
      flush=True)
