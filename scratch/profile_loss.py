"""Which part of yolo_loss costs 8.8 ms at bs16/416 bf16?"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import loss as L
from yolo_v3_tpu.ops.decode import raw_to_predictions
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, args, iters=10, repeats=4):
    sync(fn(*args))
    best = 1e9
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    return best


config = YoloConfig()
params, state = D.init_yolonet(jax.random.PRNGKey(0), config.num_classes)
B, DIM = 16, 416
print("max_labels:", config.max_labels)
imgs = jax.jit(lambda k: jax.random.uniform(k, (B, DIM, DIM, 3), jnp.float32))(
    jax.random.PRNGKey(0))
labels = np.zeros((B, config.max_labels, 5), np.float32)
labels[:, :3, :] = [1, 0.5, 0.5, 0.3, 0.3]
labels = jnp.asarray(labels)
cd = jnp.bfloat16
pc = jax.tree.map(lambda a: a.astype(cd), params)

fwd = jax.jit(lambda p, s, x: jax.tree.map(
    lambda r: r.astype(jnp.float32).mean(),
    D.apply_yolonet(p, s, x.astype(cd), training=True)[0]))
t_fwd = timeit(fwd, (pc, state, imgs))
print(f"fwd only                 : {t_fwd:7.2f} ms", flush=True)


def make(level):
    def f(p, s, x, y):
        raws, _ = D.apply_yolonet(p, s, x.astype(cd), training=True)
        acc = 0.0
        for raw, mask in zip(raws, config.anchor_masks):
            nA = len(mask)
            nH, nW = raw.shape[1], raw.shape[2]
            stride = DIM / nH
            C = config.num_classes
            pr = raw_to_predictions(raw.astype(jnp.float32), nA, 5 + C)
            pr = jnp.moveaxis(pr, 3, 1)
            preds_xy = jax.nn.sigmoid(pr[..., 0:2])
            preds_wh = pr[..., 2:4]
            preds_conf = jax.nn.sigmoid(pr[..., 4])
            preds_cls = jax.nn.sigmoid(pr[..., 5:])
            cx = jax.lax.broadcasted_iota(jnp.float32, (nH, nW), 1)[None, None]
            cy = jax.lax.broadcasted_iota(jnp.float32, (nH, nW), 0)[None, None]
            anchors_all = jnp.asarray(config.anchors, jnp.float32) / stride
            anchors_scale = anchors_all[jnp.asarray(mask)]
            pred_boxes = jnp.stack(
                [preds_xy[..., 0] + cx, preds_xy[..., 1] + cy,
                 jnp.exp(preds_wh[..., 0]) * anchors_scale[None, :, None, None, 0],
                 jnp.exp(preds_wh[..., 1]) * anchors_scale[None, :, None, None, 1]],
                axis=-1)
            pred_boxes = jax.lax.stop_gradient(pred_boxes)
            if level == 0:     # decode+sigmoids only
                acc = acc + preds_xy.mean() + preds_conf.mean() + \
                    preds_cls.mean() + pred_boxes.mean()
                continue
            build = functools.partial(
                L.build_targets_single, anchors_all=anchors_all,
                anchor_mask=mask, num_classes=C,
                ignore_thres=config.ignore_thres)
            tgt, noobj_mask, n_correct, n_gt = jax.vmap(build)(pred_boxes, y)
            if level == 1:     # + target build
                acc = acc + sum(v.astype(jnp.float32).mean()
                                for v in tgt.values()) + noobj_mask.mean() \
                    + preds_cls.mean()
                continue
            obj_mask = tgt["obj"]
            coord = tgt["coord"]

            def mse_half(pred, target):
                return jnp.sum((pred * coord - target * coord) ** 2) / 2.0

            lx = mse_half(preds_xy[..., 0], tgt["tx"]) + \
                mse_half(preds_xy[..., 1], tgt["ty"]) + \
                mse_half(preds_wh[..., 0], tgt["tw"]) + \
                mse_half(preds_wh[..., 1], tgt["th"])
            if level == 2:     # + coord losses
                acc = acc + lx + preds_cls.mean()
                continue
            lc = L._bce_sum(preds_conf * obj_mask, obj_mask) + \
                L._bce_sum(preds_conf * noobj_mask, jnp.zeros_like(noobj_mask))
            if level == 3:     # + conf bce
                acc = acc + lx + lc + preds_cls.mean()
                continue
            lcls = jnp.sum(obj_mask[..., None] *
                           L._bce_elem(preds_cls, tgt["tcls"]))
            acc = acc + lx + lc + lcls
        return acc
    return jax.jit(f)


names = ["decode+sig", "+build_targets", "+coord mse", "+conf bce",
         "+cls bce (full)"]
prev = t_fwd
for lv, nm in enumerate(names):
    t = timeit(make(lv), (pc, state, imgs, labels))
    print(f"{nm:18s}: {t:7.2f} ms (delta {t - prev:6.2f})", flush=True)
    prev = t
