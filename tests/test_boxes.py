"""Geometry core tests: converters, IoU, letterbox math.

Golden values are computed with independent numpy implementations of the
reference formulas (reference boundingbox.py, utils.py:98-146), not by
importing the reference.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.ops import boxes as B


def np_iou_matrix(b1, b2):
    """Straightforward O(N*M) loop IoU on corner boxes, for golden values."""
    out = np.zeros((len(b1), len(b2)))
    for i, (ax1, ay1, ax2, ay2) in enumerate(b1):
        for j, (bx1, by1, bx2, by2) in enumerate(b2):
            ix1, iy1 = max(ax1, bx1), max(ay1, by1)
            ix2, iy2 = min(ax2, bx2), min(ay2, by2)
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            a1 = (ax2 - ax1) * (ay2 - ay1)
            a2 = (bx2 - bx1) * (by2 - by1)
            out[i, j] = inter / (a1 + a2 - inter)
    return out


class TestFormatConversions:
    def test_roundtrip_all_formats(self, rng):
        box = rng.uniform(0, 100, size=(7, 4)).astype(np.float32)
        # make x2>x1, y2>y1 corners
        corners = np.sort(box.reshape(7, 2, 2), axis=1).transpose(0, 2, 1).reshape(7, 4)
        corners = corners[:, [0, 2, 1, 3]]  # x1 y1 x2 y2

        c = jnp.asarray(corners)
        np.testing.assert_allclose(
            B.cxcywh_to_x1y1x2y2(B.x1y1x2y2_to_cxcywh(c)), corners, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            B.xywh_to_x1y1x2y2(B.x1y1x2y2_to_xywh(c)), corners, rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            B.xywh_to_cxcywh(B.cxcywh_to_xywh(B.x1y1x2y2_to_cxcywh(c))),
            B.x1y1x2y2_to_cxcywh(c),
            rtol=1e-5,
            atol=1e-5,
        )

    def test_known_values(self):
        c = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])  # x1 y1 x2 y2
        np.testing.assert_allclose(B.x1y1x2y2_to_cxcywh(c)[0], [20, 40, 20, 40])
        np.testing.assert_allclose(B.x1y1x2y2_to_xywh(c)[0], [10, 20, 20, 40])
        cc = jnp.asarray([[20.0, 40.0, 20.0, 40.0]])  # cx cy w h
        np.testing.assert_allclose(B.cxcywh_to_x1y1x2y2(cc)[0], [10, 20, 30, 60])
        np.testing.assert_allclose(B.cxcywh_to_xywh(cc)[0], [10, 20, 20, 40])

    def test_coordinate_scaling(self):
        c = jnp.asarray([[10.0, 20.0, 30.0, 60.0]])
        rel = B.absolute_to_relative(c, (100, 200))
        np.testing.assert_allclose(rel[0], [0.1, 0.1, 0.3, 0.3])
        np.testing.assert_allclose(B.relative_to_absolute(rel, (100, 200)), c)

    def test_convert_wrapper_with_label_rows(self):
        """Reference-style label rows [cls cx cy w h] with bbox_idx=(1,2,3,4)
        (reference transforms.py:56-59 usage)."""
        label = jnp.asarray([[3.0, 0.5, 0.5, 0.2, 0.4]])
        out = B.convert(
            label,
            B.CoordinateType.Relative,
            B.FormatType.cxcywh,
            B.CoordinateType.Absolute,
            B.FormatType.x1y1x2y2,
            bbox_idx=(1, 2, 3, 4),
            img_dim=(100, 100),
        )
        np.testing.assert_allclose(out[0], [3.0, 40.0, 30.0, 60.0, 70.0], atol=1e-4)
        # class column untouched, original untouched (out-of-place)
        np.testing.assert_allclose(label[0, 0], 3.0)


class TestIoU:
    def test_matrix_vs_loop(self, rng):
        a = rng.uniform(0, 50, size=(6, 2))
        b1 = np.concatenate([a, a + rng.uniform(1, 50, size=(6, 2))], axis=1)
        a = rng.uniform(0, 50, size=(9, 2))
        b2 = np.concatenate([a, a + rng.uniform(1, 50, size=(9, 2))], axis=1)
        got = np.asarray(B.iou_matrix(jnp.asarray(b1), jnp.asarray(b2)))
        want = np_iou_matrix(b1, b2)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_cxcywh_mode(self):
        # identical boxes in center format -> IoU 1, disjoint -> 0
        b = jnp.asarray([[10.0, 10.0, 4.0, 4.0], [100.0, 100.0, 4.0, 4.0]])
        m = B.iou_matrix(b, b, mode="cxcywh")
        np.testing.assert_allclose(np.diag(np.asarray(m)), [1.0, 1.0])
        assert float(m[0, 1]) == 0.0

    def test_half_overlap(self):
        b1 = jnp.asarray([[0.0, 0.0, 2.0, 2.0]])
        b2 = jnp.asarray([[1.0, 0.0, 3.0, 2.0]])
        np.testing.assert_allclose(B.iou_matrix(b1, b2)[0, 0], 2.0 / 6.0, rtol=1e-6)

    def test_pairwise_matches_matrix_diag(self, rng):
        a = rng.uniform(0, 50, size=(5, 2))
        b = np.concatenate([a, a + rng.uniform(1, 50, size=(5, 2))], axis=1)
        m = B.iou_matrix(jnp.asarray(b), jnp.asarray(b))
        p = B.iou_pairwise(jnp.asarray(b), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(p), np.diag(np.asarray(m)), rtol=1e-6)

    def test_wh_iou_equals_centered_boxes(self, rng):
        wh1 = rng.uniform(1, 50, size=(4, 2))
        wh2 = rng.uniform(1, 50, size=(9, 2))
        # as the reference does it: (0,0,w,h) cxcywh boxes (yololayer.py:146-148)
        z1 = np.concatenate([np.zeros((4, 2)), wh1], axis=1)
        z2 = np.concatenate([np.zeros((9, 2)), wh2], axis=1)
        want = np.asarray(B.iou_matrix(jnp.asarray(z1), jnp.asarray(z2), mode="cxcywh"))
        got = np.asarray(B.wh_iou(jnp.asarray(wh1), jnp.asarray(wh2)))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_batched_via_leading_dims(self, rng):
        b1 = rng.uniform(0, 10, size=(2, 3, 4)).astype(np.float32)
        b1[..., 2:] += 10
        m = B.iou_matrix(jnp.asarray(b1), jnp.asarray(b1))
        assert m.shape == (2, 3, 3)
        for i in range(2):
            np.testing.assert_allclose(
                np.asarray(m[i]), np_iou_matrix(b1[i], b1[i]), rtol=1e-5
            )


class TestLetterbox:
    @pytest.mark.parametrize(
        "org,new",
        [((640, 480), (416, 416)), ((480, 640), (416, 416)), ((500, 375), (320, 320)),
         ((100, 100), (608, 608))],
    )
    def test_params_match_reference_rounding(self, org, new):
        """int() truncation + //2 pads, per reference transforms.py:261-265."""
        rw, rh, xp, yp, ratio = B.letterbox_params(org[0], org[1], new[0], new[1])
        want_ratio = min(new[0] / org[0], new[1] / org[1])
        assert ratio == want_ratio
        assert rw == int(org[0] * want_ratio) and rh == int(org[1] * want_ratio)
        assert xp == (new[0] - rw) // 2 and yp == (new[1] - rh) // 2
        assert rw + 2 * xp <= new[0] and rh + 2 * yp <= new[1]

    def test_letterbox_reverse_roundtrip(self):
        org_w, org_h, new_w, new_h = 640, 480, 416, 416
        rw, rh, xp, yp, ratio = B.letterbox_params(org_w, org_h, new_w, new_h)
        # a box in original pixels
        orig = np.array([[100.0, 50.0, 300.0, 200.0]])
        # forward-map into letterbox space
        fwd = orig * ratio
        fwd[:, [0, 2]] += xp
        fwd[:, [1, 3]] += yp
        back = np.asarray(B.letterbox_reverse(jnp.asarray(fwd), org_w, org_h, new_w, new_h))
        np.testing.assert_allclose(back, orig, atol=1e-3)

    def test_letterbox_reverse_clips(self):
        out = np.asarray(
            B.letterbox_reverse(jnp.asarray([[-50.0, -50.0, 10000.0, 10000.0]]),
                                640, 480, 416, 416)
        )
        assert out[0, 0] == 0 and out[0, 1] == 0
        assert out[0, 2] == 640 and out[0, 3] == 480

    def test_rescale_boxes(self):
        out = np.asarray(
            B.rescale_boxes(jnp.asarray([[208.0, 208.0, 416.0, 416.0]]), 640, 480, 416, 416)
        )
        np.testing.assert_allclose(out[0], [320, 240, 640, 480], rtol=1e-5)

    def test_correct_yolo_boxes_returns_xywh(self):
        out = np.asarray(
            B.correct_yolo_boxes(jnp.asarray([[0.0, 0.0, 416.0, 416.0]]),
                                 640, 480, 416, 416, is_letterbox=True)
        )
        # full-frame box maps back to full original frame in xywh
        np.testing.assert_allclose(out[0], [0, 0, 640, 480], atol=1.5)


class TestLetterboxLabels:
    def test_roundtrip(self):
        labels = jnp.asarray([[2.0, 0.4, 0.6, 0.2, 0.3]])
        fwd = B.letterbox_labels(labels, 640, 480, 416, 416)
        back = B.letterbox_labels_reverse(fwd, 640, 480, 416, 416)
        np.testing.assert_allclose(np.asarray(back), np.asarray(labels),
                                   rtol=1e-5, atol=1e-6)
        # class column untouched
        assert float(fwd[0, 0]) == 2.0

    def test_matches_box_letterbox_math(self):
        """Label mapping must agree with letterbox_params geometry."""
        org_w, org_h, dim = 640, 480, 416
        rw, rh, xp, yp, ratio = B.letterbox_params(org_w, org_h, dim, dim)
        labels = jnp.asarray([[0.0, 0.5, 0.5, 0.4, 0.4]])
        fwd = np.asarray(B.letterbox_labels(labels, org_w, org_h, dim, dim))[0]
        np.testing.assert_allclose(fwd[1], (0.5 * rw + xp) / dim, atol=1e-6)
        np.testing.assert_allclose(fwd[2], (0.5 * rh + yp) / dim, atol=1e-6)
        np.testing.assert_allclose(fwd[3], 0.4 * rw / dim, atol=1e-6)
