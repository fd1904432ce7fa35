"""Train -> detect end-to-end regression test.

The guard the reference ran visually every iteration (its ~300-image
overfit "sanity test for yolo_train.ipynb", reference README.md:101,
test.py:96-108 comparison grids): train a tiny net to memorize a couple of
synthetic images, then run the REAL serving path (Detector: BN fold +
device letterbox + decode + NMS + box correction) and assert every GT box
is found at IoU > 0.5 with the right class.

This is the test that makes the round-3 label-corruption bug (size columns
destroyed by view aliasing in _corners_to_labels) impossible to
reintroduce, and catches any train/inference decode skew.
"""

import os.path as osp

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.sampler import CyclicSampler
from yolo_v3_tpu.data import transforms as T
from yolo_v3_tpu.detector import Detector
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.loop import train
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig

DIM = 32

# anchors sized for DIM-scale objects so the overfit assigns cleanly
CFG = YoloConfig(
    num_classes=2, img_dim=DIM,
    anchors=((4, 4), (6, 5), (5, 7), (10, 8), (8, 11), (12, 12),
             (16, 14), (14, 18), (20, 20)),
)
TCFG = TrainConfig(lr=1e-3, backbone_lr=1e-3, net_subdivisions=1,
                   multi_scale=False)

# (cls, x1, y1, x2, y2) rectangles in DIM x 24 images.  Image width equals
# the net dim on purpose: the letterbox is then pad-only (no resize), so the
# training feed (cv2 host path) and the serving feed (device path) are
# bit-identical and the assertion tests the PIPELINE (labels, decode, NMS,
# box un-mapping), not an overfit net's sensitivity to cv2-vs-device cubic
# resampling of razor-sharp edges — which flips with any optimizer-level
# float-trajectory change (a net memorized to loss 0.0000 on one resize can
# confidently mislocate on the other).  The y-pad still exercises the
# letterbox reverter.
IMG_H = 24
SPECS = [(0, 8, 2, 24, 18), (1, 12, 8, 28, 22)]


@pytest.fixture(scope="module")
def overfit_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("overfit")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i, (c, x1, y1, x2, y2) in enumerate(SPECS):
        img = rng.integers(0, 60, (IMG_H, DIM, 3), dtype=np.uint8)
        img[y1:y2, x1:x2] = [(255, 80, 80), (80, 255, 80)][c]
        p = root / "images" / f"img_{i:04d}.jpg"
        cv2.imwrite(str(p), cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        cx, cy = (x1 + x2) / 2 / DIM, (y1 + y2) / 2 / IMG_H
        with open(root / "labels" / f"img_{i:04d}.txt", "w") as f:
            f.write(f"{c} {cx:.6f} {cy:.6f} "
                    f"{(x2-x1)/DIM:.6f} {(y2-y1)/IMG_H:.6f}\n")
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths) + "\n")
    return str(root)


def _corner_iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])
    union = area(a) + area(b) - inter
    return inter / union if union > 0 else 0.0


class TestTrainDetectE2E:
    def test_overfit_then_detect(self, overfit_dir):
        list_path = osp.join(overfit_dir, "train.txt")
        ds = ListDataset(list_path, trans_fn=lambda d: T.eval_transform(d))
        sampler = CyclicSampler(len(ds), 2, seed=0, dim=(DIM, DIM))
        data = DataHelper(ds, sampler, max_net_batches=100,
                          net_subdivisions=1, prefetch=0)

        params, state = jax.tree.map(jnp.array, D.init_yolonet(
            jax.random.PRNGKey(0), CFG.num_classes, blocks=(1, 1, 1, 1, 1)))
        params, state, _, rec = train(data, params, state, CFG, TCFG,
                                      log_fn=lambda s: None)
        assert rec.current_stats["loss"] < 0.5
        assert rec.current_stats["recall"] == 1.0

        # a 100-step overfit leaves BN running stats lagging the still-moving
        # activations; re-estimate them on the training images (the serving
        # path folds BN from running stats)
        feed = jnp.asarray(np.stack(
            [ds.get(i, (DIM, DIM), 0)["img"] for i in range(len(ds))]))
        state = D.recalibrate_bn(params, state, feed)

        import cv2

        det = Detector(params, state, CFG, precision="fp32")
        imgs = [cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
                for p in ds.img_list]
        out = det.detect(imgs, conf_thr=0.2, nms_thr=0.4)

        for (c, x1, y1, x2, y2), rows in zip(SPECS, out):
            assert len(rows), "no detections on a memorized training image"
            matched = False
            for r in rows:
                # rows: [cls, x, y, w, h, prob, obj], xywh = top-left + size
                box = (r[1], r[2], r[1] + r[3], r[2] + r[4])
                if int(r[0]) == c and _corner_iou(box, (x1, y1, x2, y2)) > 0.5:
                    matched = True
            assert matched, (
                f"GT cls={c} box=({x1},{y1},{x2},{y2}) not matched; got "
                + "; ".join(
                    f"cls={int(r[0])} xywh=({r[1]:.0f},{r[2]:.0f},{r[3]:.0f},"
                    f"{r[4]:.0f}) p={r[5]:.2f}" for r in rows[:5])
            )

    def test_recalibrate_bn_matches_train_cascade(self, overfit_dir):
        """After re-estimation on a batch, eval-mode forward on that batch
        equals the train-mode forward (biased-variance storage makes the
        cascade exact)."""
        list_path = osp.join(overfit_dir, "train.txt")
        ds = ListDataset(list_path, trans_fn=lambda d: T.eval_transform(d))
        x = jnp.asarray(np.stack(
            [ds.get(i, (DIM, DIM), 0)["img"] for i in range(len(ds))]))
        params, state = jax.tree.map(jnp.array, D.init_yolonet(
            jax.random.PRNGKey(3), CFG.num_classes, blocks=(1, 1, 1, 1, 1)))
        raws_train, _ = D.apply_yolonet(params, state, x, training=True)
        state2 = D.recalibrate_bn(params, state, x)
        raws_eval, _ = D.apply_yolonet(params, state2, x, training=False)
        for a, b in zip(raws_train, raws_eval):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_recalibrate_bn_multibatch_averages(self, overfit_dir):
        """Multiple calibration batches average their batch statistics."""
        params, state = jax.tree.map(jnp.array, D.init_yolonet(
            jax.random.PRNGKey(3), CFG.num_classes, blocks=(1, 1, 1, 1, 1)))
        rng = np.random.default_rng(0)
        b1 = jnp.asarray(rng.uniform(0, 1, (2, DIM, DIM, 3)).astype(np.float32))
        b2 = jnp.asarray(rng.uniform(0, 1, (2, DIM, DIM, 3)).astype(np.float32))
        s1 = D.recalibrate_bn(params, state, b1)
        s2 = D.recalibrate_bn(params, state, b2)
        s12 = D.recalibrate_bn(params, state, [b1, b2])
        avg = jax.tree.map(lambda a, b: (a + b) / 2, s1, s2)
        for a, b in zip(jax.tree.leaves(s12), jax.tree.leaves(avg)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)
