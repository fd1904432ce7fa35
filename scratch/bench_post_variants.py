"""A/B: two-level cell gather (current) vs single row gather in the fast
display postprocess, measured on the full int8-u8 pipeline at bs64/416."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.ops import postprocess as P
from yolo_v3_tpu.ops.postprocess import nms_fixed, _CLASS_OFFSET
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

C = config.num_classes
attrib = 5 + C
A = config.anchors_per_scale
m = config.max_detections
psk = config.display_per_scale_topk
conf_thr, nms_thr = config.conf_thr, config.nms_thr


def fast_display_rowgather(raws):
    boxes_l, score_l, cls_l, obj_l = [], [], [], []
    for raw, mask in zip(raws, config.anchor_masks):
        b, h, w, _ = raw.shape
        stride = 416 / h
        aw_c = jnp.asarray([config.anchors[i][0] for i in mask], jnp.float32)
        ah_c = jnp.asarray([config.anchors[i][1] for i in mask], jnp.float32)
        per_a = []
        for a in range(A):
            o = raw[..., a * attrib + 4].astype(jnp.float32)
            cmx = jnp.max(
                raw[..., a * attrib + 5:a * attrib + attrib]
                .astype(jnp.float32), axis=-1)
            per_a.append(jax.nn.sigmoid(o) * jax.nn.sigmoid(cmx))
        s = jnp.stack(per_a, axis=-1).reshape(b, -1)
        s = jnp.where(s > conf_thr, s, 0.0)
        k_s = min(psk, s.shape[1])
        top_s, top_i = jax.lax.top_k(s, k_s)
        top_i = top_i.astype(jnp.int32)

        # single-level row gather: [b, h*w*A, attrib] rows
        rows_all = raw.reshape(b, h * w * A, attrib)
        row = jnp.take_along_axis(rows_all, top_i[..., None], axis=1)
        row = row.astype(jnp.float32)

        a_i = top_i % A
        cell = top_i // A
        gx = (cell % w).astype(jnp.float32)
        gy = (cell // w).astype(jnp.float32)
        bx = (jax.nn.sigmoid(row[..., 0]) + gx) * stride
        by = (jax.nn.sigmoid(row[..., 1]) + gy) * stride
        bw = jnp.exp(row[..., 2]) * aw_c[a_i]
        bh = jnp.exp(row[..., 3]) * ah_c[a_i]
        boxes_l.append(jnp.stack(
            [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], axis=-1))
        score_l.append(top_s)
        cls_l.append(jnp.argmax(row[..., 5:], axis=-1).astype(jnp.float32))
        obj_l.append(jax.nn.sigmoid(row[..., 4]))

    boxes = jnp.concatenate(boxes_l, axis=1)
    score = jnp.concatenate(score_l, axis=1)
    cls = jnp.concatenate(cls_l, axis=1)
    obj = jnp.concatenate(obj_l, axis=1)

    def per_image(boxes_i, score_i, cls_i, obj_i):
        shifted = boxes_i + (cls_i * _CLASS_OFFSET)[:, None]
        sel, valid = nms_fixed(shifted, score_i, nms_thr, m, presorted=False)
        out = jnp.concatenate(
            [boxes_i[sel], obj_i[sel][:, None], score_i[sel][:, None],
             cls_i[sel][:, None], valid.astype(jnp.float32)[:, None]],
            axis=-1)
        return out * valid[:, None].astype(jnp.float32)

    return jax.vmap(per_image)(boxes, score, cls, obj)


cur = jax.jit(lambda u: P.postprocess_from_raws(
    Q.apply_yolonet_quantized_u8(q, u), config, 416, conf_thr, nms_thr))
new = jax.jit(lambda u: fast_display_rowgather(
    Q.apply_yolonet_quantized_u8(q, u)))

a = np.asarray(cur(u8))
b = np.asarray(new(u8))
print("match:", np.allclose(a, b, atol=1e-5), " maxdiff:",
      float(np.abs(a - b).max()), flush=True)

print(f"current (cell gather): {timeit(cur, u8):6.2f} ms", flush=True)
print(f"row gather           : {timeit(new, u8):6.2f} ms", flush=True)
