"""Decompose the 7.2 ms/batch64 postprocess: scores+topk vs decode vs NMS.
Also per-segment int8 forward profile.  Pipelined timeit (20 iters) is fine
at these magnitudes (~1.6 ms/call dispatch noise)."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.ops.postprocess import postprocess_from_raws, nms_fixed, _CLASS_OFFSET
from yolo_v3_tpu.utils.config import YoloConfig


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

fwd = lambda x: Q.apply_yolonet_quantized(qtree, x)

# raws inputs for postprocess-only timing (device-resident)
mk_raws = jax.jit(fwd)
raws_list = [mk_raws(x) for x in xs]

variants = {
    "full (topk+decode+NMS)": lambda r: postprocess_from_raws(
        r, config, 416, config.conf_thr, config.nms_thr),
    "no NMS": lambda r: postprocess_from_raws(
        r, config, 416, config.conf_thr, config.nms_thr, use_nms=False),
}
for name, f in variants.items():
    ms = timeit(jax.jit(f), raws_list)
    print(f"post {name:24s}: {ms:7.3f} ms", flush=True)

# scores+topk only
def scores_topk(raws):
    nA, C = config.anchors_per_scale, config.num_classes
    attrib = 5 + C
    flats = [r.reshape(r.shape[0], -1, attrib) for r in raws]
    flat = jnp.concatenate(flats, axis=1)
    obj = jax.nn.sigmoid(flat[..., 4].astype(jnp.float32))
    cls_max = jnp.max(flat[..., 5:].astype(jnp.float32), axis=-1)
    score = obj * jax.nn.sigmoid(cls_max)
    score = jnp.where(score > config.conf_thr, score, 0.0)
    return jax.lax.top_k(score, config.pre_nms_topk)

ms = timeit(jax.jit(scores_topk), raws_list)
print(f"post scores+exact topk      : {ms:7.3f} ms", flush=True)

def scores_only(raws):
    nA, C = config.anchors_per_scale, config.num_classes
    attrib = 5 + C
    flats = [r.reshape(r.shape[0], -1, attrib) for r in raws]
    flat = jnp.concatenate(flats, axis=1)
    obj = jax.nn.sigmoid(flat[..., 4].astype(jnp.float32))
    cls_max = jnp.max(flat[..., 5:].astype(jnp.float32), axis=-1)
    return (obj * jax.nn.sigmoid(cls_max)).sum()

ms = timeit(jax.jit(scores_only), raws_list)
print(f"post scores only            : {ms:7.3f} ms", flush=True)

def approx_variant(raws):
    return postprocess_from_raws(r := raws, config, 416, config.conf_thr,
                                 config.nms_thr, approx_topk=True)
ms = timeit(jax.jit(approx_variant), raws_list)
print(f"post approx topk + NMS      : {ms:7.3f} ms", flush=True)

# ---- int8 forward segments ----
p = qtree

def entry(x):
    sc = p["scales"]
    x_q = Q.quantize_image(x, sc["image"])
    sp = p["s2d"]
    xp = jnp.pad(x_q, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xb = D._space_to_depth2(xp)
    y = Q._conv_i8(sp["stem"], xb, padding=((0, 0), (0, 0)))
    y = Q._conv_i8(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
    r = Q._conv_i8(sp["res0_1"], y, padding=((0, 0), (0, 0)))
    r = Q._conv_i8(sp["res0_2"], r, padding=((1, 1), (1, 1)), residual=y,
                   res_scale=sc["s2d/down0"] / sc["s2d/res0_2"])
    return Q._conv_i8(sp["down1"], r, padding=((1, 0), (1, 0)))

def thru_stage(n):
    def f(x):
        y = entry(x)
        qb = p["backbone"]
        for i in range(1, n + 1):
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
        return y.astype(jnp.int32).sum()
    return f

ms_prev = timeit(jax.jit(lambda x: entry(x).astype(jnp.int32).sum()), xs)
print(f"fwd entry (s2d, int8)       : {ms_prev:7.3f} ms", flush=True)
for n in (1, 2, 3, 4):
    ms = timeit(jax.jit(thru_stage(n)), xs)
    print(f"fwd + stage{n}               : {ms:7.3f} ms (delta {ms - ms_prev:6.2f})", flush=True)
    ms_prev = ms
full_fwd = jax.jit(lambda x: [r.astype(jnp.float32).mean() for r in fwd(x)])
ms = timeit(full_fwd, xs)
print(f"fwd full (heads incl)       : {ms:7.3f} ms (delta {ms - ms_prev:6.2f})", flush=True)
