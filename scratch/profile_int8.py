"""Per-stage timing of the quantized int8 forward at bs64/416.

Cumulative prefixes of the quantized net (one jit each), then diffs.
Rooflines per stage printed alongside: int8 OPs and activation bytes.
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


def timeit(fn, x, iters=20):
    sync(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


config = YoloConfig()
params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
rng = np.random.default_rng(0)
calib = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
qtree = Q.build_quantized(params, state, calib)

B = 64
gen = jax.jit(lambda k: jax.random.uniform(k, (B, 416, 416, 3), jnp.float32))
x = gen(jax.random.PRNGKey(0))


def reduce_out(y):
    if isinstance(y, tuple):
        return [r.astype(jnp.float32).mean() for r in y]
    return y.astype(jnp.float32).mean()


def prefix(n_stages, with_heads=False, with_post=False):
    def f(x):
        sc = qtree["scales"]
        sp = qtree["s2d"]
        x_q = Q.quantize_image(x, sc["image"])
        xp = jnp.pad(x_q, ((0, 0), (1, 3), (1, 3), (0, 0)))
        xb = D._space_to_depth2(xp)
        y = Q._conv_i8(sp["stem"], xb, padding=((0, 0), (0, 0)))
        y = Q._conv_i8(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
        r = Q._conv_i8(sp["res0_1"], y, padding=((0, 0), (0, 0)))
        r = Q._conv_i8(sp["res0_2"], r, padding=((1, 1), (1, 1)),
                       residual=y,
                       res_scale=sc["s2d/down0"] / sc["s2d/res0_2"])
        y = Q._conv_i8(sp["down1"], r, padding=((1, 0), (1, 0)))
        if n_stages == 0:
            return reduce_out(y)
        routes = []
        qb = qtree["backbone"]
        for i in range(1, n_stages + 1):
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
            if i >= 2:
                routes.append(y)
        if not with_heads:
            return reduce_out(y)
        c3, c4, c5 = routes
        k3, k4, k5 = qtree["route_keys"]

        def head(hq, x_q):
            y = x_q
            for i in range(6):
                y = Q._conv_i8(hq[f"conv{i}"], y)
                if i == 4:
                    branch = y
            det = Q._conv_i8(hq["det"], y, leaky=False, out_float=True)
            return det, branch

        sc_ = qtree["scales"]
        det0, br0 = head(qtree["head0"], c5)
        y = Q._conv_i8(qtree["up0"]["conv"], br0)
        y = jnp.concatenate([
            Q._requant(D.upsample2x_nearest(y), sc_["up0/conv"], sc_["concat1"]),
            Q._requant(c4, sc_[k4], sc_["concat1"]),
        ], axis=-1)
        det1, br1 = head(qtree["head1"], y)
        y = Q._conv_i8(qtree["up1"]["conv"], br1)
        y = jnp.concatenate([
            Q._requant(D.upsample2x_nearest(y), sc_["up1/conv"], sc_["concat2"]),
            Q._requant(c3, sc_[k3], sc_["concat2"]),
        ], axis=-1)
        det2, _ = head(qtree["head2"], y)
        raws = (det0, det1, det2)
        if not with_post:
            return reduce_out(raws)
        return postprocess_from_raws(raws, config, 416, config.conf_thr,
                                     config.nms_thr)

    return jax.jit(f)


# int8 OP counts per segment at 416 (MACs*2), rough; bs folded in at print
GOP_PER_IMG = {
    "entry": 2 * (208 * 208 * (12 * 9 * 32 + 32 * 9 * 64)  # stem(s2d)+down0
                  + 208 * 208 * (64 * 32 + 32 * 9 * 64)    # res0
                  + 104 * 104 * 64 * 9 * 128) / 1e9,       # down1
    "stage1": 2 * (104 * 104 * 2 * (128 * 64 + 64 * 9 * 128)) / 1e9,
    "stage2": 2 * (52 * 52 * 128 * 9 * 256
                   + 52 * 52 * 8 * (256 * 128 + 128 * 9 * 256)) / 1e9,
    "stage3": 2 * (26 * 26 * 256 * 9 * 512
                   + 26 * 26 * 8 * (512 * 256 + 256 * 9 * 512)) / 1e9,
    "stage4": 2 * (13 * 13 * 512 * 9 * 1024
                   + 13 * 13 * 4 * (1024 * 512 + 512 * 9 * 1024)) / 1e9,
    "heads": 2 * (13 * 13 * (3 * (1024 * 512 + 512 * 9 * 1024) + 512 * 255)
                  + 13 * 13 * 512 * 256 * 1  # up0 (13? no: on br0 13x13)
                  + 26 * 26 * ((768 * 256 + 256 * 9 * 512)
                               + 2 * (512 * 256 + 256 * 9 * 512) + 512 * 255)
                  + 26 * 26 * 256 * 128
                  + 52 * 52 * ((384 * 128 + 128 * 9 * 256)
                               + 2 * (256 * 128 + 128 * 9 * 256)
                               + 256 * 255)) / 1e9,
}

names = ["entry", "stage1", "stage2", "stage3", "stage4", "heads", "post"]
t_prev = 0.0
times = {}
t = timeit(prefix(0), x)
times["entry"] = t
print(f"entry (s2d stem..down1) : {t:7.2f} ms", flush=True)
t_prev = t
for n in (1, 2, 3, 4):
    t = timeit(prefix(n), x)
    times[f"stage{n}"] = t - t_prev
    print(f"+ stage{n}               : {t:7.2f} ms  (delta {t - t_prev:6.2f})",
          flush=True)
    t_prev = t
t = timeit(prefix(4, with_heads=True), x)
times["heads"] = t - t_prev
print(f"+ heads/ups             : {t:7.2f} ms  (delta {t - t_prev:6.2f})",
      flush=True)
t_prev = t
t = timeit(prefix(4, with_heads=True, with_post=True), x)
times["post"] = t - t_prev
print(f"+ decode/NMS            : {t:7.2f} ms  (delta {t - t_prev:6.2f})",
      flush=True)

print("\nper-segment int8 rates (bs64):")
for k in names[:-1]:
    gop = GOP_PER_IMG[k] * B
    ms = times[k]
    if ms > 0:
        print(f"  {k:8s}: {gop / ms:7.1f} TOP/s  ({gop:6.1f} GOP / {ms:5.2f} ms)")
