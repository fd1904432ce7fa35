"""End-to-end detector pipeline tests (random weights; semantic checks on
coordinate mapping and output contract)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.detector import Detector, detect_fn
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.ops.letterbox import letterbox_device, letterbox_host
from yolo_v3_tpu.utils.config import YoloConfig


@pytest.fixture(scope="module")
def det2():
    cfg = YoloConfig(num_classes=2, img_dim=160, pre_nms_topk=128, max_detections=32)
    params, state = D.init_yolonet(jax.random.PRNGKey(0), num_classes=2, blocks=(1, 1, 1, 1, 1))
    return Detector(params, state, cfg, precision="fp32")


class TestLetterboxOps:
    def test_device_vs_host_geometry(self, rng):
        img = rng.integers(0, 255, (48, 96, 3), dtype=np.uint8)
        dev = np.asarray(letterbox_device(jnp.asarray(img), (64, 64)))
        host = letterbox_host(img, (64, 64))
        assert dev.shape == host.shape == (64, 64, 3)
        # pad rows identical gray
        np.testing.assert_allclose(dev[:16], 128 / 255.0)
        np.testing.assert_allclose(host[:16], 128 / 255.0)
        # cv2-parity cubic: differences bounded by uint8 rounding (0.5/255)
        assert np.abs(dev[16:48] - host[16:48]).max() < 0.0021

    def test_device_letterbox_under_jit_cache(self, rng):
        img = jnp.asarray(rng.integers(0, 255, (30, 40, 3), dtype=np.uint8))
        a = letterbox_device(img, (64, 64))
        b = letterbox_device(img, (64, 64))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDetectorE2E:
    def test_output_contract(self, det2, rng):
        imgs = [rng.integers(0, 255, (100, 140, 3), dtype=np.uint8) for _ in range(2)]
        res = det2.detect(imgs, conf_thr=0.3)
        assert len(res) == 2
        for r, im in zip(res, imgs):
            assert r.ndim == 2 and r.shape[1] == 7
            if len(r):
                # columns: cls x y w h prob obj — boxes within original frame
                assert np.all(r[:, 1] >= -1e-3) and np.all(r[:, 2] >= -1e-3)
                assert np.all(r[:, 1] + r[:, 3] <= im.shape[1] + 1e-2)
                assert np.all(r[:, 2] + r[:, 4] <= im.shape[0] + 1e-2)
                assert np.all((r[:, 0] >= 0) & (r[:, 0] < 2))
                assert np.all((r[:, 5] > 0) & (r[:, 5] <= 1))

    def test_multi_scale_dims(self, det2, rng):
        img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        r1 = det2.detect([img], conf_thr=0.3, dim=160)
        r2 = det2.detect([img], conf_thr=0.3, dim=192)
        assert r1[0].shape[1] == r2[0].shape[1] == 7

    def test_detect_fn_jittable_and_batched(self, det2, rng):
        cfg = det2.config
        x = jnp.asarray(rng.uniform(0, 1, (3, 160, 160, 3)).astype(np.float32))
        org = jnp.asarray(np.array([[320, 240]] * 3, np.float32))
        out = jax.jit(
            lambda p, x, o: detect_fn(p, x, o, cfg, 0.3, 0.4,
                                      compute_dtype=jnp.float32)
        )(det2.params, x, org)
        assert out.shape == (3, cfg.max_detections, 8)

    def test_int8_u8_feed(self, rng):
        """precision="int8" with host preprocessing feeds uint8 images
        straight into the quantized net (no float batch, 4x less transfer);
        the detections keep the output contract and agree with the
        float-feed int8 path on the top detection."""
        cfg = YoloConfig(num_classes=2, img_dim=160, pre_nms_topk=128,
                         max_detections=32)
        params, state = D.init_yolonet(jax.random.PRNGKey(0), num_classes=2,
                                       blocks=(1, 1, 1, 1, 1))
        det_u8 = Detector(params, state, cfg, precision="int8",
                          resize_on_device=False)
        assert det_u8._u8_feed
        imgs = [rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
                for _ in range(2)]
        x, _ = det_u8.preprocess(imgs)
        assert x.dtype == jnp.uint8
        res = det_u8.detect(imgs, conf_thr=0.3)
        assert len(res) == 2 and all(r.shape[1] == 7 for r in res)

        det_f = Detector(params, state, cfg, precision="int8",
                         resize_on_device=False)
        det_f._u8_feed = False
        from yolo_v3_tpu.models import quantized as Q

        det_f._apply_fn = Q.apply_yolonet_quantized
        res_f = det_f.detect(imgs, conf_thr=0.3)
        for a, b in zip(res, res_f):
            if len(a) and len(b):
                # same top class; positions within a few pixels (paths
                # differ only in input quantization grid)
                assert a[0][0] == b[0][0]
                np.testing.assert_allclose(a[0][1:5], b[0][1:5], atol=8.0)

    def test_viz_smoke(self, det2, rng, tmp_path):
        from yolo_v3_tpu.viz.draw import save_detections_image, show_img_grid

        img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        res = det2.detect([img], conf_thr=0.2)
        p = str(tmp_path / "det.png")
        save_detections_image(img, res[0], p, classes=["a", "b"])
        import os
        assert os.path.getsize(p) > 0
        show_img_grid([img, img], cols=2, classes=["a", "b"],
                      labels_list=[res[0], res[0]],
                      save_path=str(tmp_path / "grid.png"))
