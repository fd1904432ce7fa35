"""Quantized serving artifact persistence (models/quantized.py save/load).

The int8 tree is the deployable model: calibration runs once, the artifact
round-trips exactly through an npz, and a serving process loads it without
the float weights or calibration data.  (The reference has no serving-export
concept — its deployable is the fp32 .weights file, reference
darknet.py:236-303.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.utils.config import YoloConfig

NUM_CLASSES = 8
DIM = 96
BLOCKS = (1, 1, 1, 1, 1)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1, (2, DIM, DIM, 3)).astype(np.float32))
    params, state = D.init_yolonet(jax.random.PRNGKey(1), NUM_CLASSES,
                                   blocks=BLOCKS)
    q = Q.build_quantized(params, state, x)
    return params, state, x, q


def _leaves(q):
    names, kinds, arrays = [], [], []
    Q._flatten_q(jax.device_get(q), [], names, kinds, arrays)
    return names, kinds, arrays


class TestRoundTrip:
    def test_exact(self, setup, tmp_path):
        _, _, x, q = setup
        path = str(tmp_path / "q.npz")
        Q.save_quantized(q, path, meta={"num_classes": NUM_CLASSES})
        assert Q.is_quantized_file(path)
        q2 = Q.load_quantized(path)

        n1, k1, a1 = _leaves(q)
        n2, k2, a2 = _leaves(q2)
        assert n1 == n2 and k1 == k2
        for name, x1, x2 in zip(n1, a1, a2):
            assert x1.dtype == x2.dtype, name
            np.testing.assert_array_equal(x1, x2, err_msg=str(name))

        # python-type restoration: scale leaves are floats (not 0-d arrays),
        # route_scales is a tuple — both are jit-cache-relevant
        assert isinstance(q2["route_scales"], tuple)
        assert all(isinstance(s, float) for s in q2["route_scales"])
        assert isinstance(q2["scales"]["image"], float)
        assert q2["scales"] == q["scales"]

        # the loaded tree serves bitwise identically
        want = jax.jit(lambda v: Q.apply_yolonet_quantized(q, v))(x)
        got = jax.jit(lambda v: Q.apply_yolonet_quantized(q2, v))(x)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w, np.float32),
                                          np.asarray(g, np.float32))

    def test_rejects_plain_npz(self, setup, tmp_path):
        from yolo_v3_tpu.models import weights as W

        params, state, _, _ = setup
        path = str(tmp_path / "plain.npz")
        W.save_pytree({"params": params, "state": state}, path)
        assert not Q.is_quantized_file(path)
        with pytest.raises(ValueError, match="not a quantized"):
            Q.load_quantized(path)


class TestDetectorRoundTrip:
    def test_detector_from_quantized(self, setup, tmp_path):
        from yolo_v3_tpu.detector import Detector

        params, state, _, _ = setup
        cfg = YoloConfig(num_classes=NUM_CLASSES, img_dim=DIM)
        det = Detector(params, state, cfg, precision="int8")
        path = str(tmp_path / "det_q.npz")
        det.save_quantized(path)

        det2 = Detector.from_quantized(path, cfg)
        assert det2.precision == "int8"

        rng = np.random.default_rng(3)
        img = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
        a = det.detect([img], conf_thr=0.05)[0]
        b = det2.detect([img], conf_thr=0.05)[0]
        np.testing.assert_array_equal(a, b)

    def test_save_requires_int8(self, setup, tmp_path):
        from yolo_v3_tpu.detector import Detector

        params, state, _, _ = setup
        cfg = YoloConfig(num_classes=NUM_CLASSES, img_dim=DIM)
        det = Detector(params, state, cfg, precision="bf16")
        with pytest.raises(ValueError, match="int8"):
            det.save_quantized(str(tmp_path / "x.npz"))


class TestCLIQuantize:
    def test_quantize_then_detect(self, tmp_path, capsys):
        import cv2

        from yolo_v3_tpu.cli import main
        from yolo_v3_tpu.models import weights as W

        params, state = D.init_yolonet(jax.random.PRNGKey(2), 3,
                                       blocks=BLOCKS)
        ckpt = str(tmp_path / "model.npz")
        W.save_pytree({"params": params, "state": state}, ckpt)
        names = tmp_path / "names.txt"
        names.write_text("a\nb\nc\n")
        rng = np.random.default_rng(0)
        img = str(tmp_path / "img.jpg")
        cv2.imwrite(img, rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))

        qpath = str(tmp_path / "q.npz")
        main(["weights", "quantize", ckpt, "--out", qpath,
              "--num-classes", "3", "--dim", str(DIM),
              "--calib-images", str(tmp_path), "--calib-count", "2"])
        assert Q.is_quantized_file(qpath)
        capsys.readouterr()

        # detect auto-loads the artifact (no --precision needed)
        main(["detect", "--image", img, "--weights", qpath,
              "--names", str(names), "--dim", str(DIM),
              "--conf-thr", "0.05"])
        capsys.readouterr()
