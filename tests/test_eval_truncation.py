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
        """Documents WHY 512 was unsafe for eval: with >512 candidates the
        lowest-scoring survivors differ from the unbounded oracle."""
        det, n_cand = dense_scene
        assert n_cand > 512
        got = device_eval(det, 512)
        want = numpy_eval_oracle(det)
        # truncation drops low-score candidates that the oracle keeps
        assert len(got) < len(want) or not np.allclose(
            got[:, 5], want[:len(got), 5]
        )

    def test_default_config_is_truncation_free_here(self, dense_scene):
        det, n_cand = dense_scene
        cfg = YoloConfig()
        assert cfg.eval_pre_nms_topk >= n_cand
        assert cfg.eval_approx_topk is False  # reference-exact by default
