"""Decode op tests: golden numpy math and reference ordering semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.ops.decode import decode_head, decode_all
from yolo_v3_tpu.utils.config import YoloConfig


def sigmoid(x):
    return 1 / (1 + np.exp(-x))


def np_decode(raw, anchors, stride):
    """Independent numpy implementation of the reference decode
    (yololayer.py:45-59, 98-104)."""
    B, H, W, C = raw.shape
    A = len(anchors)
    attrib = C // A
    p = raw.reshape(B, H, W, A, attrib)
    out = np.zeros_like(p)
    for h in range(H):
        for w in range(W):
            for a in range(A):
                out[:, h, w, a, 0] = (sigmoid(p[:, h, w, a, 0]) + w) * stride
                out[:, h, w, a, 1] = (sigmoid(p[:, h, w, a, 1]) + h) * stride
                out[:, h, w, a, 2] = np.exp(p[:, h, w, a, 2]) * anchors[a][0]
                out[:, h, w, a, 3] = np.exp(p[:, h, w, a, 3]) * anchors[a][1]
                out[:, h, w, a, 4:] = sigmoid(p[:, h, w, a, 4:])
    return out.reshape(B, H * W * A, attrib)


class TestDecode:
    def test_golden_small_grid(self, rng):
        anchors = [(116, 90), (156, 198), (373, 326)]
        raw = rng.normal(size=(2, 3, 3, 3 * 7)).astype(np.float32)
        got = np.asarray(decode_head(jnp.asarray(raw), anchors, stride=32.0))
        want = np_decode(raw, anchors, 32.0)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_row_ordering_is_h_w_a(self, rng):
        """Flattened row index = ((h*W)+w)*A + a (reference permute(0,2,3,1,4)
        then view, yololayer.py:104)."""
        anchors = [(10, 13), (16, 30), (33, 23)]
        raw = rng.normal(size=(1, 2, 2, 3 * 7)).astype(np.float32)
        flat = np.asarray(decode_head(jnp.asarray(raw), anchors, stride=8.0))
        grid = np.asarray(decode_head(jnp.asarray(raw), anchors, stride=8.0, flatten=False))
        for h in range(2):
            for w in range(2):
                for a in range(3):
                    np.testing.assert_array_equal(flat[0, (h * 2 + w) * 3 + a], grid[0, h, w, a])

    def test_decode_all_concat_order(self, rng):
        cfg = YoloConfig(num_classes=2)
        raws = [
            jnp.asarray(rng.normal(size=(1, 13, 13, 21)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, 26, 26, 21)).astype(np.float32)),
            jnp.asarray(rng.normal(size=(1, 52, 52, 21)).astype(np.float32)),
        ]
        out = decode_all(raws, cfg, img_dim=416)
        assert out.shape == (1, (13 * 13 + 26 * 26 + 52 * 52) * 3, 7)
        # first block must equal the stride-32 head decoded alone
        head0 = decode_head(raws[0], [cfg.anchors[i] for i in (6, 7, 8)], 32.0)
        np.testing.assert_allclose(np.asarray(out[:, : 13 * 13 * 3]), np.asarray(head0))

    def test_jit_and_grad_safe(self, rng):
        anchors = [(10, 13), (16, 30), (33, 23)]
        raw = jnp.asarray(rng.normal(size=(1, 4, 4, 21)).astype(np.float32))
        f = jax.jit(lambda r: decode_head(r, anchors, 8.0).sum())
        g = jax.grad(lambda r: decode_head(r, anchors, 8.0).sum())(raw)
        assert np.isfinite(float(f(raw)))
        assert g.shape == raw.shape and np.all(np.isfinite(np.asarray(g)))
