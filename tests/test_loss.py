"""Loss/target-builder parity tests vs an independent numpy implementation
of the reference algorithm (reference yololayer.py:31-172 semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.models.loss import yolo_layer_loss, yolo_loss, STAT_KEYS
from yolo_v3_tpu.utils.config import YoloConfig


def sigmoid(x):
    return 1 / (1 + np.exp(-x))


def np_iou_cxcywh(b1, b2):
    b1 = np.atleast_2d(b1)
    b2 = np.atleast_2d(b2)
    x11, x12 = b1[:, 0] - b1[:, 2] / 2, b1[:, 0] + b1[:, 2] / 2
    y11, y12 = b1[:, 1] - b1[:, 3] / 2, b1[:, 1] + b1[:, 3] / 2
    x21, x22 = b2[:, 0] - b2[:, 2] / 2, b2[:, 0] + b2[:, 2] / 2
    y21, y22 = b2[:, 1] - b2[:, 3] / 2, b2[:, 1] + b2[:, 3] / 2
    ix1 = np.maximum(x11[:, None], x21)
    iy1 = np.maximum(y11[:, None], y21)
    ix2 = np.minimum(x12[:, None], x22)
    iy2 = np.minimum(y12[:, None], y22)
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    a1 = (x12 - x11) * (y12 - y11)
    a2 = (x22 - x21) * (y22 - y21)
    return inter / (a1[:, None] + a2[None, :] - inter)


def np_bce_sum(p, t):
    lp = np.maximum(np.log(p), -100)
    l1p = np.maximum(np.log(1 - p), -100)
    return -np.sum(t * lp + (1 - t) * l1p)


def np_layer_loss(raw, labels, cfg, anchor_mask, img_dim):
    """Sequential reference algorithm in numpy (golden model)."""
    nB, nH, nW, _ = raw.shape
    nA = len(anchor_mask)
    C = cfg.num_classes
    stride = img_dim / nH
    anchors_all = np.asarray(cfg.anchors, np.float64) / stride
    anchors = anchors_all[list(anchor_mask)]

    p = raw.reshape(nB, nH, nW, nA, 5 + C).transpose(0, 3, 1, 2, 4).astype(np.float64)
    pxy = sigmoid(p[..., 0:2])
    pwh = p[..., 2:4]
    pconf = sigmoid(p[..., 4])
    pcls = sigmoid(p[..., 5:])

    mesh_x = np.arange(nW)[None, None, :]
    mesh_y = np.arange(nH)[None, :, None]
    pred_boxes = np.zeros((nB, nA, nH, nW, 4))
    pred_boxes[..., 0] = pxy[..., 0] + mesh_x
    pred_boxes[..., 1] = pxy[..., 1] + mesh_y
    pred_boxes[..., 2] = np.exp(pwh[..., 0]) * anchors[:, 0][None, :, None, None]
    pred_boxes[..., 3] = np.exp(pwh[..., 1]) * anchors[:, 1][None, :, None, None]

    obj = np.zeros((nB, nA, nH, nW))
    noobj = np.ones((nB, nA, nH, nW))
    coord = np.zeros((nB, nA, nH, nW))
    tconf = np.zeros((nB, nA, nH, nW))
    tcls = np.zeros((nB, nA, nH, nW, C))
    tx = np.zeros((nB, nA, nH, nW))
    ty = np.zeros((nB, nA, nH, nW))
    tw = np.zeros((nB, nA, nH, nW))
    th = np.zeros((nB, nA, nH, nW))
    nCorrect = nGT = 0

    for b in range(nB):
        for t in range(labels.shape[1]):
            if labels[b, t].sum() == 0:
                break
            gx, gy = labels[b, t, 1] * nW, labels[b, t, 2] * nH
            gw, gh = labels[b, t, 3] * nW, labels[b, t, 4] * nH
            gi, gj = int(gx), int(gy)

            ious = np_iou_cxcywh(pred_boxes[b].reshape(-1, 4),
                                 np.array([[gx, gy, gw, gh]]))[:, 0]
            noobj[b][(ious > cfg.ignore_thres).reshape(nA, nH, nW)] = 0

            anchor_boxes = np.concatenate(
                [np.zeros((9, 2)), anchors_all], axis=1)
            a_iou = np_iou_cxcywh(anchor_boxes, np.array([[0, 0, gw, gh]]))[:, 0]
            best = int(np.argmax(a_iou))
            if best in anchor_mask:
                a = list(anchor_mask).index(best)
                iou1 = np_iou_cxcywh(np.array([[gx, gy, gw, gh]]),
                                     pred_boxes[b, a, gj, gi][None])[0, 0]
                if iou1 > 0.5:
                    nCorrect += 1
                coord[b, a, gj, gi] = np.sqrt(2 - labels[b, t, 3] * labels[b, t, 4])
                obj[b, a, gj, gi] = 1
                tconf[b, a, gj, gi] = 1
                tcls[b, a, gj, gi] = 0
                tcls[b, a, gj, gi, int(labels[b, t, 0])] = 1
                tx[b, a, gj, gi] = gx - gi
                ty[b, a, gj, gi] = gy - gj
                tw[b, a, gj, gi] = np.log(gw / anchors_all[best, 0] + 1e-16)
                th[b, a, gj, gi] = np.log(gh / anchors_all[best, 1] + 1e-16)
                nGT += 1

    lx = np.sum((pxy[..., 0] * coord - tx * coord) ** 2) / 2
    ly = np.sum((pxy[..., 1] * coord - ty * coord) ** 2) / 2
    lw = np.sum((pwh[..., 0] * coord - tw * coord) ** 2) / 2
    lh = np.sum((pwh[..., 1] * coord - th * coord) ** 2) / 2
    lconf = np_bce_sum(pconf * obj, obj) + np_bce_sum(pconf * noobj, noobj * 0)
    sel = obj == 1
    lcls = np_bce_sum(pcls[sel], tcls[sel])
    total = lx + ly + lw + lh + lconf + lcls
    return dict(loss=total, loss_x=lx, loss_y=ly, loss_w=lw, loss_h=lh,
                loss_conf=lconf, loss_cls=lcls, nCorrect=nCorrect, nGT=nGT)


def make_labels(rng, nB, T=20, n_real=(3, 8), C=4):
    labels = np.zeros((nB, T, 5), np.float32)
    for b in range(nB):
        n = rng.integers(*n_real)
        labels[b, :n, 0] = rng.integers(0, C, n)
        labels[b, :n, 1:3] = rng.uniform(0.05, 0.95, (n, 2))
        labels[b, :n, 3:5] = rng.uniform(0.02, 0.5, (n, 2))
    return labels


CFG = YoloConfig(num_classes=4)


class TestLayerLossParity:
    @pytest.mark.parametrize("mask,grid", [((6, 7, 8), 5), ((3, 4, 5), 10), ((0, 1, 2), 20)])
    def test_matches_numpy_reference(self, rng, mask, grid):
        img_dim = grid * (416 // 13) if grid == 13 else 160
        # keep stride consistent: img_dim / grid = stride
        img_dim = grid * 32 if mask == (6, 7, 8) else (grid * 16 if mask == (3, 4, 5) else grid * 8)
        nB = 2
        raw = rng.normal(size=(nB, grid, grid, 3 * 9)).astype(np.float32) * 0.5
        labels = make_labels(rng, nB)
        want = np_layer_loss(raw, labels, CFG, mask, img_dim)
        got_loss, got = yolo_layer_loss(jnp.asarray(raw), jnp.asarray(labels),
                                        CFG, mask, img_dim)
        assert float(got["nGT"]) == want["nGT"]
        assert float(got["nCorrect"]) == want["nCorrect"]
        for k in ("loss_x", "loss_y", "loss_w", "loss_h", "loss_conf", "loss_cls"):
            np.testing.assert_allclose(float(got[k]) * nB, want[k], rtol=2e-4,
                                       err_msg=k)
        np.testing.assert_allclose(float(got_loss), want["loss"], rtol=2e-4)

    def test_zero_row_prefix_semantics(self, rng):
        """A GT after an all-zero row must be ignored (reference break)."""
        raw = rng.normal(size=(1, 5, 5, 27)).astype(np.float32)
        labels = np.zeros((1, 4, 5), np.float32)
        labels[0, 0] = [1, 0.5, 0.5, 0.3, 0.3]
        # row 1 all zero; row 2 nonzero but must be ignored
        labels[0, 2] = [2, 0.2, 0.2, 0.2, 0.2]
        _, got = yolo_layer_loss(jnp.asarray(raw), jnp.asarray(labels),
                                 CFG, (6, 7, 8), 160)
        want = np_layer_loss(raw, labels, CFG, (6, 7, 8), 160)
        assert float(got["nGT"]) == want["nGT"]

    def test_later_gt_overwrites_same_cell(self):
        """Two GTs in the same cell/anchor: last wins, nGT counts both."""
        rng = np.random.default_rng(0)
        raw = rng.normal(size=(1, 5, 5, 27)).astype(np.float32)
        labels = np.zeros((1, 3, 5), np.float32)
        labels[0, 0] = [1, 0.5, 0.5, 0.8, 0.8]   # big box -> coarse anchor
        labels[0, 1] = [2, 0.52, 0.52, 0.9, 0.9]  # same cell, same best anchor
        want = np_layer_loss(raw, labels, CFG, (6, 7, 8), 160)
        got_loss, got = yolo_layer_loss(jnp.asarray(raw), jnp.asarray(labels),
                                        CFG, (6, 7, 8), 160)
        assert float(got["nGT"]) == want["nGT"]
        np.testing.assert_allclose(float(got_loss), want["loss"], rtol=2e-4)


class TestFullLoss:
    def test_three_scale_sum_and_recall(self, rng):
        cfg = CFG
        raws = [
            jnp.asarray(rng.normal(size=(2, 5, 5, 27)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(2, 10, 10, 27)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(2, 20, 20, 27)).astype(np.float32)),
        ]
        labels = jnp.asarray(make_labels(rng, 2))
        total, stats = yolo_loss(raws, labels, cfg, 160)
        assert set(STAT_KEYS) == set(stats.keys())
        assert float(stats["nGT"]) > 0  # every GT lands in exactly one scale
        per_layer = sum(
            float(yolo_layer_loss(r, labels, cfg, m, 160)[0])
            for r, m in zip(raws, cfg.anchor_masks)
        )
        np.testing.assert_allclose(float(total), per_layer, rtol=1e-5)

    def test_every_gt_assigned_exactly_once(self, rng):
        """Across the 3 scales each valid GT trains exactly one anchor."""
        cfg = CFG
        raws = [jnp.asarray(rng.normal(size=(1, g, g, 27)).astype(np.float32))
                for g in (5, 10, 20)]
        labels_np = make_labels(rng, 1, n_real=(5, 6))
        _, stats = yolo_loss(raws, jnp.asarray(labels_np), cfg, 160)
        n_valid = int((labels_np.sum(-1) != 0).sum())
        assert float(stats["nGT"]) == n_valid

    def test_gradients_flow_and_finite(self, rng):
        cfg = CFG
        raw = jnp.asarray(rng.normal(size=(1, 5, 5, 27)).astype(np.float32))
        labels = jnp.asarray(make_labels(rng, 1))

        def f(r):
            return yolo_layer_loss(r, labels, cfg, (6, 7, 8), 160)[0]

        g = jax.grad(f)(raw)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.abs(g).sum()) > 0

    def test_jit_compatible(self, rng):
        cfg = CFG
        raws = [jnp.asarray(rng.normal(size=(1, g, g, 27)).astype(np.float32))
                for g in (5, 10, 20)]
        labels = jnp.asarray(make_labels(rng, 1))
        f = jax.jit(lambda rs, lb: yolo_loss(rs, lb, cfg, 160)[0])
        assert np.isfinite(float(f(raws, labels)))
