"""Breakdown of the fast-display postprocess cost at bs64/416 (int8-u8 net).

Times cumulative prefixes of _postprocess_fast_display's stages on top of
the forward, via min-of-repeats pipelined loops.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.ops import postprocess as P
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
q = Q.build_quantized(params, state, calib)

B = 64
u8 = jax.jit(lambda k: jax.random.randint(
    k, (B, 416, 416, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(0))

psk = config.display_per_scale_topk
print("display_per_scale_topk =", psk, " max_detections =",
      config.max_detections, flush=True)

C = config.num_classes
attrib = 5 + C
A = config.anchors_per_scale


def stage(level):
    """level: 0=fwd only, 1=+scores, 2=+topk, 3=+gather/decode, 4=+merge sort,
    5=full (nms + final)."""
    def f(u):
        raws = Q.apply_yolonet_quantized_u8(q, u)
        if level == 0:
            return [r.astype(jnp.float32).mean() for r in raws]
        outs = []
        boxes_l, score_l, cls_l, obj_l = [], [], [], []
        for raw, mask in zip(raws, config.anchor_masks):
            b, h, w, _ = raw.shape
            stride = 416 / h
            aw_c = jnp.asarray([config.anchors[i][0] for i in mask],
                               jnp.float32)
            ah_c = jnp.asarray([config.anchors[i][1] for i in mask],
                               jnp.float32)
            per_a = []
            for a in range(A):
                o = raw[..., a * attrib + 4].astype(jnp.float32)
                cmx = jnp.max(
                    raw[..., a * attrib + 5:a * attrib + attrib]
                    .astype(jnp.float32), axis=-1)
                per_a.append(jax.nn.sigmoid(o) * jax.nn.sigmoid(cmx))
            s = jnp.stack(per_a, axis=-1).reshape(b, -1)
            s = jnp.where(s > config.conf_thr, s, 0.0)
            if level == 1:
                outs.append(s.mean())
                continue
            k_s = min(psk, s.shape[1])
            top_s, top_i = jax.lax.top_k(s, k_s)
            top_i = top_i.astype(jnp.int32)
            if level == 2:
                outs.append(top_s.mean() + top_i.sum())
                continue
            cells = raw.reshape(b, h * w, A * attrib)
            g = jnp.take_along_axis(cells, (top_i // A)[..., None], axis=1)
            g = g.reshape(b, k_s, A, attrib)
            a_i = top_i % A
            row = jnp.take_along_axis(g, a_i[..., None, None],
                                      axis=2)[:, :, 0].astype(jnp.float32)
            cell = top_i // A
            gx = (cell % w).astype(jnp.float32)
            gy = (cell // w).astype(jnp.float32)
            bx = (jax.nn.sigmoid(row[..., 0]) + gx) * stride
            by = (jax.nn.sigmoid(row[..., 1]) + gy) * stride
            bw = jnp.exp(row[..., 2]) * aw_c[a_i]
            bh = jnp.exp(row[..., 3]) * ah_c[a_i]
            boxes_l.append(jnp.stack(
                [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2],
                axis=-1))
            score_l.append(top_s)
            cls_l.append(jnp.argmax(row[..., 5:], axis=-1)
                         .astype(jnp.float32))
            obj_l.append(jax.nn.sigmoid(row[..., 4]))
        if level == 1 or level == 2:
            return outs
        boxes = jnp.concatenate(boxes_l, axis=1)
        score = jnp.concatenate(score_l, axis=1)
        cls = jnp.concatenate(cls_l, axis=1)
        obj = jnp.concatenate(obj_l, axis=1)
        if level == 3:
            return boxes.mean() + score.mean() + cls.mean() + obj.mean()
        k = score.shape[1]
        score, perm = jax.lax.top_k(score, k)
        boxes = jnp.take_along_axis(boxes, perm[..., None], axis=1)
        cls = jnp.take_along_axis(cls, perm, axis=1)
        obj = jnp.take_along_axis(obj, perm, axis=1)
        if level == 4:
            return boxes.mean() + score.mean() + cls.mean() + obj.mean()
        return P.postprocess_from_raws(raws, config, 416, config.conf_thr,
                                       config.nms_thr)
    return jax.jit(f)


names = ["fwd", "+scores", "+topk", "+gather/decode", "+merge sort", "full"]
prev = 0.0
for lv, name in enumerate(names):
    t = timeit(stage(lv), u8)
    print(f"{name:16s}: {t:7.2f} ms  (delta {t - prev:6.2f})", flush=True)
    prev = t
