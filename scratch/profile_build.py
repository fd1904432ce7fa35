"""Sub-profile of build_targets_single's pieces (vmapped, bs16/416)."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.ops import boxes as B
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
BSZ, DIM = 16, 416
C = config.num_classes
T = config.max_labels
labels = np.zeros((BSZ, T, 5), np.float32)
labels[:, :3, :] = [1, 0.5, 0.5, 0.3, 0.3]
labels = jnp.asarray(labels)

# fake pred_boxes for the three scales, device-generated
SC = [(52, (0, 1, 2)), (26, (3, 4, 5)), (13, (6, 7, 8))]
pbs = [jax.jit(lambda k, n=n: jax.random.uniform(
    k, (BSZ, 3, n, n, 4), jnp.float32) * n)(jax.random.PRNGKey(n))
    for n, _ in SC]


def make(level):
    def build_one(pred_boxes, labels, mask, nH):
        nA, nW = 3, nH
        anchors_all = jnp.asarray(config.anchors, jnp.float32) / (DIM / nH)
        mask_arr = jnp.asarray(mask)
        nonzero = jnp.sum(labels, axis=1) != 0
        valid = jnp.cumprod(nonzero.astype(jnp.int32)) == 1
        gcls = labels[:, 0].astype(jnp.int32)
        gx = labels[:, 1] * nW
        gy = labels[:, 2] * nH
        gw = labels[:, 3] * nW
        gh = labels[:, 4] * nH
        gi = jnp.clip(gx.astype(jnp.int32), 0, nW - 1)
        gj = jnp.clip(gy.astype(jnp.int32), 0, nH - 1)
        gt_boxes = jnp.stack([gx, gy, gw, gh], axis=-1)
        ious = B.iou_matrix(pred_boxes.reshape(-1, 4), gt_boxes, mode="cxcywh")
        ious = jnp.where(valid[None, :], ious, 0.0)
        ious = jnp.nan_to_num(ious, nan=0.0)
        ignore = jnp.any(ious > config.ignore_thres, axis=1).reshape(nA, nH, nW)
        noobj_mask = jnp.where(ignore, 0.0, 1.0)
        if level == 0:          # noobj iou mask only
            return noobj_mask.mean()
        wh = jnp.stack([gw, gh], axis=-1)
        anchor_iou = jnp.nan_to_num(B.wh_iou(wh, anchors_all), nan=0.0)
        best_anchor = jnp.argmax(anchor_iou, axis=1)
        owned = jnp.any(best_anchor[:, None] == mask_arr[None, :], axis=1)
        local_a = jnp.argmax(best_anchor[:, None] == mask_arr[None, :], axis=1)
        write = valid & owned
        anchors_scale = anchors_all[mask_arr]
        aw = anchors_scale[local_a, 0]
        ah = anchors_scale[local_a, 1]
        t_x = gx - gi
        t_y = gy - gj
        t_w = jnp.log(gw / aw + 1e-16)
        t_h = jnp.log(gh / ah + 1e-16)
        coord_w = jnp.sqrt(2.0 - labels[:, 3] * labels[:, 4])
        cell_pred = pred_boxes[local_a, gj, gi]
        cell_iou = jnp.nan_to_num(
            B.iou_pairwise(cell_pred, gt_boxes, mode="cxcywh"), nan=0.0)
        n_correct = jnp.sum((write & (cell_iou > 0.5)).astype(jnp.float32))
        if level == 1:          # + anchor assign / per-GT terms
            return noobj_mask.mean() + n_correct + t_x.sum() + t_y.sum() + \
                t_w.sum() + t_h.sum() + coord_w.sum()
        cell = local_a * (nH * nW) + gj * nW + gi
        order = (jnp.arange(T, dtype=jnp.int32) + 1) * write.astype(jnp.int32)
        flat_win = jnp.zeros((nA * nH * nW,), jnp.int32).at[cell].max(order)
        winner = flat_win.reshape(nA, nH, nW)
        has = winner > 0
        tsel = jnp.maximum(winner - 1, 0)
        if level == 2:          # + scatter-max
            return noobj_mask.mean() + n_correct + tsel.sum() + \
                has.astype(jnp.float32).mean()

        def fill(vals):
            return jnp.where(has, vals[tsel], 0.0)

        acc = noobj_mask.mean() + n_correct
        for v in (coord_w, t_x, t_y, t_w, t_h):
            acc = acc + fill(v).mean()
        if level == 3:          # + scalar fills
            return acc
        tcls = jnp.where(has[..., None],
                         jax.nn.one_hot(gcls, C)[tsel], 0.0)
        return acc + tcls.mean()

    def f(pb0, pb1, pb2, y):
        acc = 0.0
        for pb, (n, mask) in zip((pb0, pb1, pb2), SC):
            one = functools.partial(build_one, mask=mask, nH=n)
            acc = acc + jnp.sum(jax.vmap(one)(pb, y))
        return acc
    return jax.jit(f)


names = ["noobj iou mask", "+assign", "+scatter-max", "+fills", "+tcls onehot"]
prev = 0.0
for lv, nm in enumerate(names):
    t = timeit(make(lv), (*pbs, labels))
    print(f"{nm:16s}: {t:7.2f} ms (delta {t - prev:6.2f})", flush=True)
    prev = t
