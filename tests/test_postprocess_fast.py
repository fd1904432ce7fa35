"""Fast display postprocess (per-scale top-k, static-lane scores) vs the
exact global-top-k path: identical final detections while per-scale
candidate counts stay within quota, and a documented bound when not.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.ops.postprocess import postprocess_from_raws
from yolo_v3_tpu.utils.config import YoloConfig

CFG = YoloConfig(num_classes=4, img_dim=128)
SHAPES = [(4, 4), (8, 8), (16, 16)]


def mk_raws(rng, b=2, scale=4.0):
    att = 5 + CFG.num_classes
    return [
        jnp.asarray(rng.normal(0, scale, (b, h, w, 3 * att)).astype(np.float32))
        for h, w in SHAPES
    ]


def rows_set(out):
    """Valid rows as a set of rounded tuples (order-insensitive compare)."""
    out = np.asarray(out)
    rows = set()
    for img in out:
        for r in img:
            if r[7] > 0.5:
                rows.add(tuple(np.round(r[:7], 3).tolist()))
    return rows


class TestFastDisplayParity:
    def test_matches_exact_path_dense(self, rng):
        """Logit scale 4 -> hundreds of candidates above 0.5 across scales,
        still below the 128/scale quota: detections must match exactly."""
        raws = mk_raws(rng, b=3)
        exact_cfg = dataclasses.replace(CFG, display_per_scale_topk=0)
        fast = postprocess_from_raws(raws, CFG, 128, 0.5, 0.45)
        exact = postprocess_from_raws(raws, exact_cfg, 128, 0.5, 0.45)
        assert rows_set(fast) == rows_set(exact)
        # candidate density sanity: the scene is actually dense
        assert len(rows_set(exact)) > 0

    def test_matches_exact_path_no_nms(self, rng):
        raws = mk_raws(rng, b=2)
        exact_cfg = dataclasses.replace(CFG, display_per_scale_topk=0)
        fast = postprocess_from_raws(raws, CFG, 128, 0.5, 0.45, use_nms=False)
        exact = postprocess_from_raws(raws, exact_cfg, 128, 0.5, 0.45,
                                      use_nms=False)
        # both emit score-descending rows; valid sets must agree
        assert rows_set(fast) == rows_set(exact)

    def test_eval_mode_unaffected(self, rng):
        """is_eval must ignore the fast path (exact parity surface)."""
        raws = mk_raws(rng, b=2)
        # small candidate bound: this gates path DISPATCH equality, not
        # truncation behavior (tests/test_eval_truncation.py does that),
        # and the 4096-candidate NMS matrix is slow on the CPU mesh
        cfg = dataclasses.replace(CFG, eval_pre_nms_topk=256)
        exact_cfg = dataclasses.replace(cfg, display_per_scale_topk=0)
        a = postprocess_from_raws(raws, cfg, 128, 0.05, 0.45, is_eval=True)
        b = postprocess_from_raws(raws, exact_cfg, 128, 0.05, 0.45,
                                  is_eval=True)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_quota_keeps_top_candidates(self, rng):
        """When a scale overflows its quota, the kept candidates are that
        scale's highest-scoring rows (the union-of-top-k bound)."""
        quota = 8
        cfg = dataclasses.replace(CFG, display_per_scale_topk=quota,
                                  max_detections=256)
        # huge positive logits everywhere -> every row is a candidate
        att = 5 + CFG.num_classes
        raws = [
            jnp.asarray(rng.normal(6, 0.1, (1, h, w, 3 * att)).astype(np.float32))
            for h, w in SHAPES
        ]
        out = np.asarray(postprocess_from_raws(raws, cfg, 128, 0.5, 0.45,
                                               use_nms=False))
        valid = out[0][out[0][:, 7] > 0.5]
        assert len(valid) <= 3 * quota