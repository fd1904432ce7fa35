"""On-device detection postprocessing: thresholding + class-wise greedy NMS.

TPU-native replacement for the reference's host-side Python postprocessing
(reference utils.py:148-258): the reference moves detections to CPU, builds
per-image/per-class candidate lists with data-dependent shapes, and runs a
Python greedy-suppression loop over an IoU matrix.  Here the whole thing is
fixed-shape, mask-based, and batched under ``vmap`` inside the same ``jit``
as the network — zero host round-trips, which is also why "p50 NMS ms" is a
headline metric for this framework.

Semantics parity:

* detection probability = class prob * objectness (utils.py:233),
* display mode: a box proposes only its argmax class, threshold 0.5
  (utils.py:240-246); eval mode: every (box, class) pair above 0.005
  (utils.py:236-238),
* NMS is greedy in score order *within each class* (utils.py:148-202).
  Cross-class independence is achieved with the standard class-offset trick:
  boxes are shifted by ``class_id * OFFSET`` so boxes of different classes
  never overlap, collapsing per-class NMS into one pass.
* Greedy selection is exact (not an approximation): each of the
  ``max_detections`` steps picks the highest-scoring live candidate and
  kills its overlaps, reproducing the reference's sequential algorithm.

Fixed-shape output: [B, M, 8] rows (x1, y1, x2, y2, obj, prob, cls, valid),
matching the reference's 7-column rows (utils.py:195-197) plus a validity
flag instead of ragged shapes.
"""

from __future__ import annotations

import functools
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolo_v3_tpu.ops import boxes as B

__all__ = ["postprocess", "nms_fixed", "detections_to_lists"]

# Larger than any supported input dimension (608) so class-offset boxes of
# distinct classes can never intersect.
_CLASS_OFFSET = 8192.0


def _candidates_display(probs: jnp.ndarray, conf_thr: float):
    """One candidate per box: its argmax class (reference utils.py:240-246)."""
    score = jnp.max(probs, axis=-1)
    cls = jnp.argmax(probs, axis=-1)
    score = jnp.where(score > conf_thr, score, 0.0)
    return score, cls


def _candidates_eval(probs: jnp.ndarray, conf_thr: float):
    """Every (box, class) pair (reference utils.py:236-238).

    Returns flattened [N*C] scores and the class of each flat slot.
    """
    n, c = probs.shape
    score = jnp.where(probs > conf_thr, probs, 0.0).reshape(n * c)
    cls = jnp.tile(jnp.arange(c, dtype=jnp.int32), (n,)).reshape(n * c)
    return score, cls


def nms_fixed(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    nms_thr: float,
    max_detections: int,
) -> tuple:
    """Exact greedy NMS over K fixed candidates.

    ``boxes_xyxy`` [K, 4] (already class-offset if class-wise), ``scores``
    [K] with invalid candidates at 0.  Returns (indices [M], valid [M]) in
    descending score order.
    """
    k = scores.shape[0]

    def body(i, carry):
        live, out_idx, out_valid = carry
        j = jnp.argmax(live)
        s = live[j]
        valid = s > 0.0
        out_idx = out_idx.at[i].set(j)
        out_valid = out_valid.at[i].set(valid)
        iou = B.iou_pairwise(boxes_xyxy, boxes_xyxy[j])
        kill = (iou > nms_thr) | (jnp.arange(k) == j)
        live = jnp.where(valid & kill, 0.0, live)
        return live, out_idx, out_valid

    live0 = scores
    out_idx = jnp.zeros((max_detections,), jnp.int32)
    out_valid = jnp.zeros((max_detections,), bool)
    _, out_idx, out_valid = jax.lax.fori_loop(
        0, max_detections, body, (live0, out_idx, out_valid)
    )
    return out_idx, out_valid


def _postprocess_single(
    det: jnp.ndarray,
    num_classes: int,
    conf_thr: float,
    nms_thr: float,
    is_eval: bool,
    use_nms: bool,
    pre_nms_topk: int,
    max_detections: int,
) -> jnp.ndarray:
    """One image: [N, 5+C] decoded rows -> [M, 8] results."""
    det = det.astype(jnp.float32)
    xyxy = B.cxcywh_to_x1y1x2y2(det[:, :4])
    obj = det[:, 4]
    probs = det[:, 5:5 + num_classes] * obj[:, None]

    if is_eval:
        score, cls = _candidates_eval(probs, conf_thr)
        n = det.shape[0]
        box_of = jnp.repeat(jnp.arange(n, dtype=jnp.int32), num_classes)
    else:
        score, cls = _candidates_display(probs, conf_thr)
        box_of = jnp.arange(det.shape[0], dtype=jnp.int32)

    k = min(pre_nms_topk, score.shape[0])
    top_score, top_i = jax.lax.top_k(score, k)
    top_box_idx = box_of[top_i]
    top_cls = cls[top_i]
    top_boxes = xyxy[top_box_idx]
    top_obj = obj[top_box_idx]

    if use_nms:
        shifted = top_boxes + (top_cls.astype(jnp.float32) * _CLASS_OFFSET)[:, None]
        sel, valid = nms_fixed(shifted, top_score, nms_thr, max_detections)
    else:
        m = min(max_detections, k)
        sel = jnp.arange(m, dtype=jnp.int32)
        valid = top_score[sel] > 0.0
        if m < max_detections:
            pad = max_detections - m
            sel = jnp.concatenate([sel, jnp.zeros((pad,), jnp.int32)])
            valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])

    out = jnp.concatenate(
        [
            top_boxes[sel],
            top_obj[sel][:, None],
            top_score[sel][:, None],
            top_cls[sel].astype(jnp.float32)[:, None],
            valid.astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )
    # zero out invalid rows so padded slots are inert downstream
    return out * valid[:, None].astype(jnp.float32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_classes", "conf_thr", "nms_thr", "is_eval", "use_nms",
        "pre_nms_topk", "max_detections",
    ),
)
def postprocess(
    detections: jnp.ndarray,
    num_classes: int,
    conf_thr: float = 0.5,
    nms_thr: float = 0.4,
    is_eval: bool = False,
    use_nms: bool = True,
    pre_nms_topk: int = 512,
    max_detections: int = 128,
) -> jnp.ndarray:
    """Batched postprocess: [B, N, 5+C] decoded detections -> [B, M, 8]
    (x1, y1, x2, y2, obj, prob, cls, valid), device-resident.

    Drop-in for the reference ``postprocessing`` (utils.py:226-258) with
    fixed shapes.
    """
    fn = functools.partial(
        _postprocess_single,
        num_classes=num_classes,
        conf_thr=conf_thr,
        nms_thr=nms_thr,
        is_eval=is_eval,
        use_nms=use_nms,
        pre_nms_topk=pre_nms_topk,
        max_detections=max_detections,
    )
    return jax.vmap(fn)(detections)


def detections_to_lists(results) -> List[np.ndarray]:
    """[B, M, 8] -> per-image [n_i, 7] numpy arrays
    (x1, y1, x2, y2, obj, prob, cls) — the reference's ragged output format
    (utils.py:195-201)."""
    results = np.asarray(results)
    out = []
    for row in results:
        valid = row[:, 7] > 0.5
        out.append(row[valid, :7])
    return out
