"""Darknet .weights codec + native pytree checkpoint tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import weights as W


@pytest.fixture(scope="module")
def net():
    return D.init_yolonet(jax.random.PRNGKey(7), num_classes=2)


def trees_equal(a, b):
    flat_a = W._flatten_with_names(a)
    flat_b = W._flatten_with_names(b)
    assert flat_a.keys() == flat_b.keys()
    for k in flat_a:
        np.testing.assert_allclose(flat_a[k], flat_b[k], rtol=1e-6, atol=1e-7, err_msg=k)


class TestDarknetCodec:
    def test_roundtrip(self, net, tmp_path):
        params, state = net
        path = str(tmp_path / "model.weights")
        W.save_darknet_weights(params, state, path, seen=12345)

        fresh_p, fresh_s = D.init_yolonet(jax.random.PRNGKey(99), num_classes=2)
        loaded_p, loaded_s, consumed, header = W.load_darknet_weights(fresh_p, fresh_s, path)

        trees_equal(loaded_p, params)
        trees_equal(loaded_s, state)
        assert header[3] == 12345  # 'seen' counter (reference darknet.py:269)

    def test_blob_layout_per_block(self, tmp_path):
        """First conv+bn block serializes as bias, scale, mean, var, OIHW
        kernel (reference darknet.py:279-285)."""
        params, state = D.init_yolonet(jax.random.PRNGKey(0), num_classes=2)
        path = str(tmp_path / "m.weights")
        W.save_darknet_weights(params, state, path)
        blob = np.fromfile(path, dtype=np.float32)[5:]  # skip int32 header

        stem_p = params["backbone"]["stem"]
        stem_s = state["backbone"]["stem"]
        cout = 32
        np.testing.assert_allclose(blob[:cout], np.asarray(stem_p["bn"]["bias"]))
        np.testing.assert_allclose(blob[cout:2*cout], np.asarray(stem_p["bn"]["scale"]))
        np.testing.assert_allclose(blob[2*cout:3*cout], np.asarray(stem_s["mean"]))
        np.testing.assert_allclose(blob[3*cout:4*cout], np.asarray(stem_s["var"]))
        kernel = blob[4*cout:4*cout + 32*3*3*3].reshape(32, 3, 3, 3)
        np.testing.assert_allclose(
            kernel.transpose(2, 3, 1, 0), np.asarray(stem_p["w"]), rtol=1e-6
        )

    def test_backbone_prefix_load(self, net, tmp_path):
        """darknet53.conv.74-style partial file: only backbone convs present,
        head params stay at their init (reference darknet.py:102-104)."""
        params, state = net
        path = str(tmp_path / "backbone.weights")
        W.save_darknet_weights(params, state, path, paths=D.backbone_conv_paths())

        fresh_p, fresh_s = D.init_yolonet(jax.random.PRNGKey(123), num_classes=2)
        loaded_p, loaded_s, consumed, header = W.load_backbone_darknet_weights(
            fresh_p, fresh_s, path
        )
        trees_equal(loaded_p["backbone"], params["backbone"])
        trees_equal(loaded_s["backbone"], state["backbone"])
        # heads untouched
        trees_equal(loaded_p["head0"], fresh_p["head0"])

    def test_truncated_file_raises_without_partial(self, net, tmp_path):
        params, state = net
        path = str(tmp_path / "trunc.weights")
        W.save_darknet_weights(params, state, path, paths=D.backbone_conv_paths())
        fresh = D.init_yolonet(jax.random.PRNGKey(5), num_classes=2)
        with pytest.raises(ValueError, match="exhausted"):
            W.load_darknet_weights(fresh[0], fresh[1], path)

    def test_num_classes_80_blob_size(self, tmp_path):
        """Full 80-class model must serialize to the official yolov3.weights
        float count (62,001,757 floats)."""
        params, state = D.init_yolonet(jax.random.PRNGKey(0), num_classes=80)
        path = str(tmp_path / "full.weights")
        W.save_darknet_weights(params, state, path)
        blob = np.fromfile(path, dtype=np.float32)
        assert blob.size - 5 == 62001757


class TestPytreeCheckpoint:
    def test_roundtrip_with_meta(self, net, tmp_path):
        params, state = net
        path = str(tmp_path / "ckpt.npz")
        W.save_pytree({"params": params, "state": state}, path, meta={"step": 7})
        loaded, meta = W.load_pytree(path)
        assert meta == {"step": 7}
        trees_equal(loaded["params"], params)
        trees_equal(loaded["state"], state)
