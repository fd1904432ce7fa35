"""Per-stage timing of the folded bf16 forward at bs64/416.

Times cumulative prefixes of the network (one jit each, looped on device via
scan-style readback), then diffs. Sync via host readback per CLAUDE.md.
"""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.ops.decode import decode_all
from yolo_v3_tpu.ops.postprocess import postprocess_from_raws


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, x, iters=30):
    sync(fn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


config = YoloConfig()
params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
folded = D.cast_params(
    D.fold_space_to_depth(D.fold_batchnorm(params, state)), jnp.bfloat16
)

B = 64
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(0, 1, (B, 416, 416, 3)).astype(np.float32)).astype(jnp.bfloat16)

p = folded["backbone"]


def prefix(n_stages, with_heads=False, with_post=False):
    def f(x):
        y = D._apply_s2d_entry(folded, x)
        routes = []
        for i in range(1, n_stages + 1):
            sp = p[f"stage{i}"]
            if i != 1:
                y = D._conv_bias_leaky(sp["down"], y, stride=2)
            for b in range(D.DARKNET53_BLOCKS[i]):
                r = D._conv_bias_leaky(sp[f"res{b}"]["conv1"], y)
                r = D._conv_bias_leaky(sp[f"res{b}"]["conv2"], r)
                y = y + r
            if i >= 2:
                routes.append(y)
        if not with_heads:
            return y
        c3, c4, c5 = routes

        def head(hp, x):
            y = x
            for i in range(6):
                y = D._conv_bias_leaky(hp[f"conv{i}"], y)
                if i == 4:
                    branch = y
            det = D._conv_bias_leaky(hp["det"], y, leaky=False)
            return det, branch

        det0, br0 = head(folded["head0"], c5)
        y = D._conv_bias_leaky(folded["up0"]["conv"], br0)
        y = jnp.concatenate([D.upsample2x_nearest(y), c4], axis=-1)
        det1, br1 = head(folded["head1"], y)
        y = D._conv_bias_leaky(folded["up1"]["conv"], br1)
        y = jnp.concatenate([D.upsample2x_nearest(y), c3], axis=-1)
        det2, _ = head(folded["head2"], y)
        raws = (det0, det1, det2)
        if not with_post:
            return raws
        return postprocess_from_raws(raws, config, 416, config.conf_thr,
                                     config.nms_thr)

    return jax.jit(f)


t_entry = timeit(jax.jit(lambda x: D._apply_s2d_entry(folded, x)), x)
print(f"s2d entry (stem+st0+down1):   {t_entry:7.2f} ms")
prev = t_entry
for n in (1, 2, 3, 4):
    t = timeit(prefix(n), x)
    print(f"+ stage{n:<24}: {t:7.2f} ms   (delta {t - prev:6.2f})")
    prev = t
t_heads = timeit(prefix(4, with_heads=True), x)
print(f"+ heads/ups                 : {t_heads:7.2f} ms   (delta {t_heads - prev:6.2f})")
t_full = timeit(prefix(4, with_heads=True, with_post=True), x)
print(f"+ decode/NMS                : {t_full:7.2f} ms   (delta {t_full - t_heads:6.2f})")
