"""Eval-mode truncation validation (VERDICT round 1, item 5).

The reference keeps EVERY (box, class) pair above 0.005 in eval mode
(reference utils.py:236-238) — thousands per image with real weights.  Our
fixed-shape path bounds candidates at ``eval_pre_nms_topk``.  These tests
quantify the bound on dense, realistic score distributions:

* at the default eval_pre_nms_topk=4096 the on-device eval postprocess
  matches an UNBOUNDED numpy oracle exactly on scenes with ~2-3k candidates,
* a 512 bound on the same scenes demonstrably truncates (the round-1
  default was on the mAP-parity path; it is now display-only).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.ops.postprocess import postprocess
from yolo_v3_tpu.utils.config import YoloConfig

C = 8          # classes
N = 3000       # boxes
CONF = 0.005
NMS = 0.45
MAXDET = 128


@pytest.fixture(scope="module")
def dense_scene():
    """Synthetic decoded rows [N, 5+C] with a dense eval-mode candidate set:
    clustered boxes (real NMS work) + heavy-tailed scores, ~2-3k (box,
    class) pairs above 0.005."""
    rng = np.random.default_rng(123)
    centers = rng.uniform(40, 380, (40, 2))
    det = np.zeros((N, 5 + C), np.float32)
    owner = rng.integers(0, len(centers), N)
    det[:, 0:2] = centers[owner] + rng.normal(0, 12, (N, 2))
    det[:, 2:4] = rng.uniform(20, 90, (N, 2))
    det[:, 4] = rng.beta(1.2, 6.0, N)                  # objectness
    cls = rng.dirichlet(np.full(C, 0.4), N).astype(np.float32)
    det[:, 5:] = cls

    # scale objectness so the candidate count lands in (512, 4096): dense
    # enough to prove the 512 bound truncates, within the 4096 eval bound
    lo, hi = 1e-4, 1.0
    for _ in range(50):
        mid = (lo + hi) / 2
        if ((cls * det[:, 4:5] * mid) > CONF).sum() > 2800:
            hi = mid
        else:
            lo = mid
    det[:, 4] *= hi
    n_cand = int(((det[:, 5:] * det[:, 4:5]) > CONF).sum())
    assert 1500 <= n_cand <= 4096, n_cand
    return det, n_cand


def numpy_eval_oracle(det: np.ndarray) -> np.ndarray:
    """Unbounded reference eval postprocess (utils.py:226-258, is_eval=True):
    all (box, class) pairs > CONF, class-wise greedy NMS, score order."""
    boxes = np.stack([det[:, 0] - det[:, 2] / 2, det[:, 1] - det[:, 3] / 2,
                      det[:, 0] + det[:, 2] / 2, det[:, 1] + det[:, 3] / 2], -1)
    probs = det[:, 5:] * det[:, 4:5]
    rows = []
    for c in range(C):
        keep = probs[:, c] > CONF
        cand = np.concatenate(
            [boxes[keep], det[keep, 4:5], probs[keep, c:c + 1],
             np.full((keep.sum(), 1), c, np.float32)], -1
        )
        cand = cand[np.argsort(-cand[:, 5], kind="stable")]
        while len(cand):
            best = cand[0]
            rows.append(best)
            if len(cand) == 1:
                break
            rest = cand[1:]
            ix1 = np.maximum(best[0], rest[:, 0])
            iy1 = np.maximum(best[1], rest[:, 1])
            ix2 = np.minimum(best[2], rest[:, 2])
            iy2 = np.minimum(best[3], rest[:, 3])
            inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
            ua = ((best[2] - best[0]) * (best[3] - best[1])
                  + (rest[:, 2] - rest[:, 0]) * (rest[:, 3] - rest[:, 1])
                  - inter)
            cand = rest[inter / ua <= NMS]
    rows = np.asarray(rows, np.float32)
    return rows[np.argsort(-rows[:, 5], kind="stable")][:MAXDET]


def device_eval(det: np.ndarray, pre_k: int, approx: bool = False):
    out = postprocess(
        jnp.asarray(det)[None], num_classes=C, conf_thr=CONF, nms_thr=NMS,
        is_eval=True, pre_nms_topk=pre_k, max_detections=MAXDET,
    )
    rows = np.asarray(out)[0]
    return rows[rows[:, 7] > 0.5]


class TestEvalTruncation:
    def test_4096_matches_unbounded_oracle(self, dense_scene):
        det, n_cand = dense_scene
        got = device_eval(det, 4096)
        want = numpy_eval_oracle(det)
        assert len(got) == len(want), (len(got), len(want))
        np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(got[:, 5], want[:, 5], rtol=1e-5)
        np.testing.assert_array_equal(got[:, 6], want[:, 6])

    def test_512_truncates_dense_scenes(self, dense_scene):
        """Documents WHY 512 was unsafe for eval: an adversarial-but-
        realistic scene — one tight cluster of many high-score duplicates
        (NMS melts it to one box) over diverse lower-score boxes — fills
        the 512-candidate budget with the duplicates, losing detections the
        unbounded oracle keeps.  At 4096 the same scene matches the oracle."""
        det, _ = dense_scene
        det = det.copy()
        # 600 near-identical top-score boxes of one class at one spot
        spam = np.zeros((600, 5 + C), np.float32)
        rng = np.random.default_rng(9)
        spam[:, 0:2] = 200.0 + rng.normal(0, 0.5, (600, 2))
        spam[:, 2:4] = 50.0
        spam[:, 4] = 0.99
        spam[:, 5] = 0.99  # class 0
        det = np.concatenate([det[:-600], spam])

        want = numpy_eval_oracle(det)
        got512 = device_eval(det, 512)
        got4096 = device_eval(det, 4096)
        assert len(got4096) == len(want)
        # the 512 budget is mostly spam duplicates -> diverse low-score
        # detections the oracle keeps are gone
        assert len(got512) < len(want), (len(got512), len(want))

    def test_grid_nms_is_truncation_free_at_any_budget(self, dense_scene):
        """The fused grid path (round 5) never truncates pairs: even with
        the unsafe 512 budget it matches the unbounded oracle (pre_nms_topk
        only bounds the OLD path's pair list; the grid consumes the full
        [N, C] score grid)."""
        det, _ = dense_scene
        out = postprocess(
            jnp.asarray(det)[None], num_classes=C, conf_thr=CONF,
            nms_thr=NMS, is_eval=True, pre_nms_topk=512,
            max_detections=MAXDET, grid_nms=True,
        )
        rows = np.asarray(out)[0]
        got = rows[rows[:, 7] > 0.5]
        want = numpy_eval_oracle(det)
        assert len(got) == len(want), (len(got), len(want))
        np.testing.assert_allclose(got[:, :4], want[:, :4], rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_allclose(got[:, 5], want[:, 5], rtol=1e-5)
        np.testing.assert_array_equal(got[:, 6], want[:, 6])

    def test_default_config_is_truncation_free_here(self, dense_scene):
        det, n_cand = dense_scene
        cfg = YoloConfig()
        assert cfg.eval_pre_nms_topk >= n_cand
        assert cfg.eval_approx_topk is False  # reference-exact by default
