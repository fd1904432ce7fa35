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

__all__ = ["postprocess", "nms_fixed", "nms_sequential",
           "nms_blocked", "nms_pairs_grid", "detections_to_lists"]

# Larger than any supported input dimension (608) so class-offset boxes of
# distinct classes can never intersect.
_CLASS_OFFSET = 8192.0

# Below this many (box, class) score lanes a single flat sort beats the
# 2-stage selection's staging overhead; shared by _topk_pairs_eval and the
# fused eval branch of postprocess_from_raws so they cannot diverge.
_FLAT_TOPK_MAX = 16384


def _candidates_display(probs: jnp.ndarray, conf_thr: float):
    """One candidate per box: its argmax class (reference utils.py:240-246)."""
    score = jnp.max(probs, axis=-1)
    cls = jnp.argmax(probs, axis=-1)
    score = jnp.where(score > conf_thr, score, 0.0)
    return score, cls


def _topk_pairs_eval(probs: jnp.ndarray, k: int) -> tuple:
    """Top-k over the [..., N, C] (box, class) score grid — the eval-mode
    candidate selection (every pair, reference utils.py:236-238) without
    sorting all N*C lanes.

    Stage 1 keeps the k boxes with the highest per-box max score; stage 2
    ranks their k*C pairs.  Unconditionally exact as a set: were a global
    top-k pair's box dropped by stage 1, then >= k boxes would each hold a
    pair scoring above it — contradicting its rank.  Both stages use
    ``lax.approx_max_k(recall_target=1.0)``, the TPU PartialReduce-based
    EXACT top-k, ~2x faster than ``lax.top_k`` at these shapes.  Measured
    on-chip ([64, 10647, 80] masked scores, k=4096,
    scratch/probe_topk_methods.py): lax.top_k 104.8 ms, 2-stage 38.9 ms
    with top_k stages, ~20 ms with approx(1.0) stages.

    This is the decoded-tensor entry point (``postprocess``);
    ``postprocess_from_raws``'s eval branch implements the same two-stage
    selection fused with its row gathers/arithmetic decode (and carries
    the ``eval_approx_topk`` opt-in, which relaxes stage 2 to
    recall<1) — keep the two in sync, incl. the shared ``_FLAT_TOPK_MAX``
    cutoff.

    Tie-breaking at equal scores may differ from flattened ``lax.top_k``
    (both orders are valid greedy-NMS priorities; zero-score slots are
    inert downstream).  Returns (score [..., k], box [..., k] int32,
    cls [..., k] int32).
    """
    n, c = probs.shape[-2], probs.shape[-1]
    if n * c <= _FLAT_TOPK_MAX or k > n:
        # k >= n means stage 1 would keep every box (no reduction), and
        # tiny domains (tests, low-res nets) don't pay for staging: rank
        # the flat grid directly — but still on the PartialReduce exact
        # top-k when the domain is big (2x lax.top_k, e.g. the dense
        # decoded-tensor eval path where n=3000 < k=4096, n*c=240k)
        flat = probs.reshape(probs.shape[:-2] + (n * c,))
        if n * c <= _FLAT_TOPK_MAX:
            score, pair = jax.lax.top_k(flat, k)
        else:
            score, pair = jax.lax.approx_max_k(flat, k, recall_target=1.0)
        pair = pair.astype(jnp.int32)
        return score, pair // c, pair % c
    box_key = jnp.max(probs, axis=-1)                      # [..., N]
    _, bi = jax.lax.approx_max_k(box_key, k, recall_target=1.0)
    bi = bi.astype(jnp.int32)
    sub = jnp.take_along_axis(probs, bi[..., :, None], axis=-2)
    sub_flat = sub.reshape(sub.shape[:-2] + (k * c,))      # [..., k*C]
    score, pi = jax.lax.approx_max_k(sub_flat, k, recall_target=1.0)
    pi = pi.astype(jnp.int32)
    box = jnp.take_along_axis(bi, pi // c, axis=-1)
    return score, box, pi % c


def nms_fixed(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    nms_thr: float,
    max_detections: int,
    presorted: bool = True,
) -> tuple:
    """Exact greedy NMS over K fixed candidates, TPU-style.

    ``boxes_xyxy`` [K, 4] (already class-offset if class-wise), ``scores``
    [K] with invalid candidates at 0.  With ``presorted=False`` the scores
    need not be sorted: the suppression mask uses the priority relation
    (higher score wins; ties break to the lower index) directly, which is
    exactly greedy NMS over the stable score-descending order — callers
    can skip a global sort, and the returned selection is still in
    descending score order.  Returns (indices [M], valid [M]).

    Instead of an M-step sequential selection loop (slow on TPU: argmax +
    gather per step), this runs fixpoint iteration on the greedy recurrence

        keep[i] = valid[i] and no j < i with keep[j] and IoU(j, i) > thr

    over the precomputed upper-triangular overlap matrix.  Iterating from
    all-kept converges to the exact greedy solution in O(longest
    suppression chain) rounds — each round one [K, K] masked reduction on
    the VPU — and the ``while_loop`` exits as soon as the vector stops
    changing (typically 2-6 rounds; bounded by K).
    """
    k = scores.shape[0]
    valid = scores > 0.0

    iou = B.iou_matrix(boxes_xyxy, boxes_xyxy)
    idx = jnp.arange(k)
    lower_idx = idx[:, None] < idx[None, :]        # j < i pairs (j rows)
    if presorted:
        upper = lower_idx
    else:
        # priority(j) > priority(i): score desc, ties to the lower index —
        # the same relation a stable descending sort would induce
        s_j, s_i = scores[:, None], scores[None, :]
        upper = (s_j > s_i) | ((s_j == s_i) & lower_idx)
    overlap = upper & (iou > nms_thr)              # j suppresses i candidates

    def cond(carry):
        keep, prev, it = carry
        return (it < k) & jnp.any(keep != prev)

    def body(carry):
        keep, _, it = carry
        suppressed = jnp.any(overlap & keep[:, None], axis=0)
        new_keep = valid & ~suppressed
        return new_keep, keep, it + 1

    keep0 = valid
    keep, _, _ = jax.lax.while_loop(
        cond, body, (keep0, jnp.zeros_like(keep0), jnp.int32(0))
    )

    # scores are already sorted desc, so kept candidates in index order are
    # in score order; select the first M kept via top_k on masked scores.
    masked = jnp.where(keep, scores, 0.0)
    m_eff = min(max_detections, k)
    top_scores, out_idx = jax.lax.top_k(masked, m_eff)
    if m_eff < max_detections:
        pad = max_detections - m_eff
        top_scores = jnp.concatenate([top_scores, jnp.zeros((pad,), top_scores.dtype)])
        out_idx = jnp.concatenate([out_idx, jnp.zeros((pad,), out_idx.dtype)])
    return out_idx.astype(jnp.int32), top_scores > 0.0


def nms_blocked(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    nms_thr: float,
    max_detections: int,
    block: int = 32,
) -> tuple:
    """Exact greedy NMS by blocked selection rounds — the dense-eval
    default (K>=1024).

    ``nms_sequential`` is exact in O(M*K) work but runs M=128 serialized
    tiny steps (~0.2 ms each on-chip: latency-bound, 25.7 ms/batch64).
    This resolves up to ``block`` picks per round: the top-T live
    candidates outrank every other candidate, so greedy restricted to
    them — a [T, T] fixpoint — yields only TRUE global picks, every
    non-picked member of the T-set is suppressed by one of those picks,
    and the whole set can be retired in one round.  Each round costs one
    [K] top-k, a [T, T] fixpoint, and one [T, K] IoU sweep; rounds ~=
    M/picks-per-round (typically 4-10, worst-case M).  Identical output
    to ``nms_sequential``/``nms_fixed`` + top-M (ties break to the lower
    index throughout).  Input need not be score-sorted.  Returns
    (indices [M], valid [M]) in score order.
    """
    k = scores.shape[0]
    t = min(block, k)
    m = max_detections

    def cond(carry):
        live, sel, valid, count = carry
        return (count < m) & jnp.any(live > 0.0)

    def body(carry):
        live, sel, valid, count = carry
        ts, ti = jax.lax.top_k(live, t)                  # top-T live
        tb = boxes_xyxy[ti]                              # [T, 4]
        tvalid = ts > 0.0

        iou_tt = B.iou_matrix(tb, tb)
        idx = jnp.arange(t)
        overlap = (idx[:, None] < idx[None, :]) & (iou_tt > nms_thr)

        def fcond(c):
            keep, prev, it = c
            return (it < t) & jnp.any(keep != prev)

        def fbody(c):
            keep, _, it = c
            suppressed = jnp.any(overlap & keep[:, None], axis=0)
            return tvalid & ~suppressed, keep, it + 1

        keep, _, _ = jax.lax.while_loop(
            fcond, fbody,
            (tvalid, jnp.zeros_like(tvalid), jnp.int32(0)))

        pos = count + jnp.cumsum(keep.astype(jnp.int32)) - 1
        wpos = jnp.where(keep, pos, m)                   # m = drop slot
        sel = sel.at[wpos].set(ti.astype(jnp.int32), mode="drop")
        valid = valid.at[wpos].set(True, mode="drop")
        count = count + keep.sum(dtype=jnp.int32)

        # suppress outsiders overlapping any pick; the T-set itself is
        # fully resolved this round (picked or suppressed by a pick), so
        # clear it wholesale
        iou_pk = B.iou_matrix(tb, boxes_xyxy)            # [T, K]
        kill = jnp.any(keep[:, None] & (iou_pk > nms_thr), axis=0)
        live = jnp.where(kill, 0.0, live)
        live = live.at[ti].set(0.0)
        return live, sel, valid, count

    _, sel, valid, _ = jax.lax.while_loop(
        cond, body,
        (scores, jnp.zeros((m,), jnp.int32), jnp.zeros((m,), bool),
         jnp.int32(0)))
    return sel, valid


def nms_pairs_grid(
    live: jnp.ndarray,
    boxes: jnp.ndarray,
    nms_thr: float,
    max_detections: int,
    block: int = 128,
) -> tuple:
    """Exact greedy class-wise NMS fused with candidate selection, straight
    over the [B, K, C] masked (box, class) pair-score grid — the dense-eval
    selection + NMS in one loop, with NO pair compaction and NO sort of the
    K*C lanes.

    Motivation (round-5, closing the parked eval-selection floor): the
    2-stage exact top-k's stage-2 cost IS its aggregation sort —
    ``approx_max_k(recall=1.0, aggregate_to_topk=False)`` does no domain
    reduction at all (l == n; measured 0.46 ms vs ~16 ms aggregated at
    [64, 327k] k=4096) — so ANY path that materializes a sorted/compacted
    top-4096 pair list pays the ~16 ms sort.  But greedy NMS only ever
    emits ``max_detections`` (128) winners, and its suppression step
    doesn't need sorted input: selection can ride the blocked-NMS rounds
    directly on the grid.

    Per round (all images batched):

    1. top-``block`` live pairs, exactly, via the two-stage lemma: the
       top-T pairs' boxes are contained in the top-T boxes by per-box max
       (were box b of the i<=T-best pair outside, >= T boxes would each
       hold a strictly better pair).  One [B, K] row-max + two small
       ``top_k``s — never a K*C-lane sort.
    2. greedy-resolve the T-set with the [T, T] class-offset IoU fixpoint
       (exactly :func:`nms_blocked`'s argument: every T-set member is
       picked or suppressed by a pick, and all picks are true global
       picks).
    3. sweep: kill every grid pair in a pick's class overlapping it —
       computed as one [B,T,K] IoU mask einsum'd with the picks' class
       one-hots into a [B, K, C] kill mask (MXU, ~3 GMAC at eval shapes).
       Picks kill themselves (IoU 1.0) and suppressed T-set members are
       killed by their suppressor, so the sweep alone retires the round's
       whole resolved set.

    Rounds ~= max_detections/block + suppression slack (2-4 at eval
    shapes); each round costs ~2 full passes over the [B, K, C] grid —
    versus the old path's 16 ms stage-2 sort PLUS 26 ms compacted-NMS.

    Equivalent to stage-2 top-(K*C) selection + exact greedy NMS (i.e. to
    greedy over EVERY pair above threshold — the reference's
    utils.py:148-202 semantics with no pre-NMS truncation).  Matches the
    truncated (top-4096-pair) path bit-for-bit whenever fewer than that
    many pairs are live; beyond it, this path is the MORE faithful one
    (the truncated path can only drop suppressors/survivors).

    ``live``: [B, K, C] f32 pair scores, 0 = dead / below threshold.
    ``boxes``: [B, K, 4] xyxy, shared across classes (class separation is
    handled by the picks' class one-hots, not box offsetting).
    Returns (sel_box [B, M] int32 into K, sel_cls [B, M] int32,
    sel_score [B, M] f32, valid [B, M] bool), picks in descending score
    order (the round-r+1 ceiling is round r's floor, as in nms_blocked).
    """
    bsz, k, c = live.shape
    t = min(block, k * c)
    m = max_detections

    def cond(carry):
        live, *_ = carry
        return jnp.any(live > 0.0)

    def body(carry):
        live, sel_box, sel_cls, sel_score, valid, count = carry
        box_max = jnp.max(live, axis=-1)                    # [B, K]
        t_box = min(t, k)
        _, bi = jax.lax.top_k(box_max, t_box)               # [B, Tb]
        bi = bi.astype(jnp.int32)
        sub = jnp.take_along_axis(live, bi[..., None], axis=1)  # [B, Tb, C]
        ts, pi = jax.lax.top_k(sub.reshape(bsz, t_box * c), t)
        pi = pi.astype(jnp.int32)
        p_cls = pi % c                                      # [B, T]
        p_box = jnp.take_along_axis(bi, pi // c, axis=1)    # [B, T] into K
        tvalid = ts > 0.0

        tb = jnp.take_along_axis(boxes, p_box[..., None], axis=1)  # [B,T,4]
        shifted = tb + (p_cls.astype(jnp.float32) * _CLASS_OFFSET)[..., None]
        iou_tt = B.iou_matrix(shifted, shifted)             # [B, T, T]
        idx = jnp.arange(t)
        overlap = (idx[:, None] < idx[None, :]) & (iou_tt > nms_thr)

        def fcond(fc):
            keep, prev, it = fc
            return (it < t) & jnp.any(keep != prev)

        def fbody(fc):
            keep, _, it = fc
            suppressed = jnp.any(overlap & keep[..., :, None], axis=-2)
            return tvalid & ~suppressed, keep, it + 1

        keep, _, _ = jax.lax.while_loop(
            fcond, fbody,
            (tvalid, jnp.zeros_like(tvalid), jnp.int32(0)))

        # emit picks at their global positions (scores descend across
        # rounds: remaining live <= the T-th score <= every pick's score)
        pos = count[:, None] + jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1
        wpos = jnp.where(keep, pos, m)                      # m = drop slot
        emit = jax.vmap(lambda s, w, v: s.at[w].set(v, mode="drop"))
        sel_box = emit(sel_box, wpos, p_box)
        sel_cls = emit(sel_cls, wpos, p_cls)
        sel_score = emit(sel_score, wpos, ts)
        valid = emit(valid, wpos, keep)
        count = count + keep.sum(axis=1, dtype=jnp.int32)

        # sweep: one [B, T, K] IoU mask x [B, T, C] class one-hot -> kill
        iou_pk = B.iou_matrix(tb, boxes)                    # [B, T, K]
        m1 = (keep[..., :, None] & (iou_pk > nms_thr)).astype(jnp.float32)
        m2 = jax.nn.one_hot(p_cls, c, dtype=jnp.float32) \
            * keep[..., :, None].astype(jnp.float32)
        kill = jnp.einsum("btk,btc->bkc", m1, m2)
        live = jnp.where(kill > 0.0, 0.0, live)
        # retire the resolved T-set explicitly as well: guarantees >= T
        # lanes of progress per round even when degenerate (zero-area)
        # boxes yield NaN IoUs (NaN > thr is False, so such picks don't
        # self-kill via the sweep — matching the reference's "degenerate
        # boxes suppress nothing" semantics without looping forever).
        # Dead sub-lanes point at grid cells that are already <= 0.
        live = jax.vmap(lambda l, pb, pc: l.at[pb, pc].set(0.0))(
            live, p_box, p_cls)
        # freeze finished images so the loop ends with the slowest one
        live = jnp.where((count >= m)[:, None, None], 0.0, live)
        return live, sel_box, sel_cls, sel_score, valid, count

    carry = (
        live.astype(jnp.float32),
        jnp.zeros((bsz, m), jnp.int32),
        jnp.zeros((bsz, m), jnp.int32),
        jnp.zeros((bsz, m), jnp.float32),
        jnp.zeros((bsz, m), bool),
        jnp.zeros((bsz,), jnp.int32),
    )
    _, sel_box, sel_cls, sel_score, valid, _ = jax.lax.while_loop(
        cond, body, carry)
    return sel_box, sel_cls, sel_score, valid


def nms_sequential(
    boxes_xyxy: jnp.ndarray,
    scores: jnp.ndarray,
    nms_thr: float,
    max_detections: int,
) -> tuple:
    """Exact greedy NMS by M-step sequential selection — the dense-eval
    variant of :func:`nms_fixed`.

    Greedy NMS only ever emits the first ``max_detections`` survivors, so
    for large K the fixpoint formulation wastes a [K, K] IoU matrix (at the
    eval path's K=4096 that is 67 MB/image — measured 67 ms/batch64 p50 on
    chip) on suppression relations among candidates that can never be
    output.  This picks the best live candidate and kills its overlaps,
    M times: O(M*K) work, no K x K materialization.  Identical output to
    ``nms_fixed`` + top-M (ties break to the lower index, like argmax and
    the stable sort): the m-th pick IS the m-th survivor of full greedy
    suppression (reference utils.py:175-193 semantics).  Input need not be
    score-sorted.  Returns (indices [M], valid [M]) in score order.
    """
    k = scores.shape[0]
    m = min(max_detections, k)

    def body(i, carry):
        live, sel, valid = carry
        j = jnp.argmax(live)
        ok = live[j] > 0.0
        iou_j = B.iou_matrix(boxes_xyxy[j][None, :], boxes_xyxy)[0]  # [K]
        kill = (iou_j > nms_thr) | (jnp.arange(k) == j)
        live = jnp.where(ok & kill, 0.0, live)
        sel = sel.at[i].set(jnp.where(ok, j, 0).astype(jnp.int32))
        valid = valid.at[i].set(ok)
        return live, sel, valid

    _, sel, valid = jax.lax.fori_loop(
        0, m, body,
        (scores, jnp.zeros((m,), jnp.int32), jnp.zeros((m,), bool)),
    )
    if m < max_detections:
        pad = max_detections - m
        sel = jnp.concatenate([sel, jnp.zeros((pad,), jnp.int32)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    return sel, valid


# Candidate counts at or above this use the blocked-selection NMS: the
# fixpoint path's [K, K] IoU matrix dominates HBM time there, while at
# display-path sizes (<=512) the matrix fits comfortably and converges in
# fewer dispatch rounds than the selection rounds.
_SEQ_NMS_MIN_K = 1024


def _nms_auto(shifted, scores, nms_thr, max_detections, presorted=True):
    if scores.shape[0] >= _SEQ_NMS_MIN_K:
        return nms_blocked(shifted, scores, nms_thr, max_detections)
    return nms_fixed(shifted, scores, nms_thr, max_detections,
                     presorted=presorted)


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
        masked = jnp.where(probs > conf_thr, probs, 0.0)
        k = min(pre_nms_topk, masked.size)
        top_score, top_box_idx, top_cls = _topk_pairs_eval(masked, k)
    else:
        score, cls = _candidates_display(probs, conf_thr)
        k = min(pre_nms_topk, score.shape[0])
        top_score, top_i = jax.lax.top_k(score, k)
        top_box_idx = top_i.astype(jnp.int32)
        top_cls = cls[top_i]
    top_boxes = xyxy[top_box_idx]
    top_obj = obj[top_box_idx]

    if use_nms:
        shifted = top_boxes + (top_cls.astype(jnp.float32) * _CLASS_OFFSET)[:, None]
        sel, valid = _nms_auto(shifted, top_score, nms_thr, max_detections)
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
        "pre_nms_topk", "max_detections", "grid_nms",
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
    grid_nms: bool = False,
) -> jnp.ndarray:
    """Batched postprocess: [B, N, 5+C] decoded detections -> [B, M, 8]
    (x1, y1, x2, y2, obj, prob, cls, valid), device-resident.

    Drop-in for the reference ``postprocessing`` (utils.py:226-258) with
    fixed shapes.

    ``grid_nms=True`` (eval + NMS only) fuses candidate selection into the
    NMS rounds over the full [B, N, C] pair grid (:func:`nms_pairs_grid`):
    no ``pre_nms_topk`` pair truncation at all — exact greedy over every
    pair above threshold, the reference's unbounded semantics.  This is the
    same algorithm the fused raw-head path uses when
    ``config.eval_grid_nms`` is set.
    """
    if is_eval and use_nms and grid_nms:
        det = detections.astype(jnp.float32)
        xyxy = B.cxcywh_to_x1y1x2y2(det[..., :4])          # [B, N, 4]
        obj = det[..., 4]
        probs = det[..., 5:5 + num_classes] * obj[..., None]
        live = jnp.where(probs > conf_thr, probs, 0.0)
        sel_box, sel_cls, sel_score, valid = nms_pairs_grid(
            live, xyxy, nms_thr, max_detections)
        out = jnp.concatenate(
            [
                jnp.take_along_axis(xyxy, sel_box[..., None], axis=1),
                jnp.take_along_axis(obj, sel_box, axis=1)[..., None],
                sel_score[..., None],
                sel_cls.astype(jnp.float32)[..., None],
                valid.astype(jnp.float32)[..., None],
            ],
            axis=-1,
        )
        return out * valid[..., None].astype(jnp.float32)
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


def _scale_constants(shapes, anchor_masks, anchors, img_dim):
    """Per-candidate flattened decode constants across all scales:
    (cx, cy, aw_grid*stride, ah_grid*stride, stride) each [N_total] float32.

    Row order matches ``decode_all``: scales in order, rows (h, w, a).
    Computed with numpy at trace time -> compile-time constants (~40KB).
    """
    cxs, cys, aws, ahs, strides = [], [], [], [], []
    for (h, w), mask in zip(shapes, anchor_masks):
        stride = img_dim / h
        a = len(mask)
        cx = np.tile(np.arange(w, dtype=np.float32)[None, :, None], (h, 1, a))
        cy = np.tile(np.arange(h, dtype=np.float32)[:, None, None], (1, w, a))
        aw = np.tile(
            np.asarray([anchors[i][0] for i in mask], np.float32)[None, None, :],
            (h, w, 1),
        )
        ah = np.tile(
            np.asarray([anchors[i][1] for i in mask], np.float32)[None, None, :],
            (h, w, 1),
        )
        cxs.append(cx.ravel())
        cys.append(cy.ravel())
        aws.append(aw.ravel())
        ahs.append(ah.ravel())
        strides.append(np.full(h * w * a, stride, np.float32))
    return tuple(
        jnp.asarray(np.concatenate(v)) for v in (cxs, cys, aws, ahs, strides)
    )


def _constants_from_index(gi, shapes, anchor_masks, anchors, img_dim, nA):
    """Decode constants for flattened candidate indices, arithmetically.

    ``gi`` [..., K] int32 indexes the (scale-major, then h, w, a) flattened
    candidate domain that ``_scale_constants`` tabulates; this computes the
    same (cx, cy, aw, ah, stride) per index with vectorized arithmetic and
    compile-time scale boundaries — no [N]-table gathers, which cost
    2-3 ms/batch64 EACH on-chip at K=4096.
    """
    cx = jnp.zeros(gi.shape, jnp.float32)
    cy = jnp.zeros(gi.shape, jnp.float32)
    aw = jnp.zeros(gi.shape, jnp.float32)
    ah = jnp.zeros(gi.shape, jnp.float32)
    st = jnp.zeros(gi.shape, jnp.float32)
    base = 0
    for (h, w), mask in zip(shapes, anchor_masks):
        n_s = h * w * nA
        in_s = (gi >= base) & (gi < base + n_s)
        local = gi - base
        a_i = local % nA
        cell = local // nA
        gx = (cell % w).astype(jnp.float32)
        gy = (cell // w).astype(jnp.float32)
        stride = img_dim / h
        # anchor lookup as a static select chain (nA is 2-3; a table
        # gather would reintroduce the per-element cost this avoids)
        aw_s = jnp.full(gi.shape, float(anchors[mask[0]][0]), jnp.float32)
        ah_s = jnp.full(gi.shape, float(anchors[mask[0]][1]), jnp.float32)
        for j in range(1, len(mask)):
            aw_s = jnp.where(a_i == j, float(anchors[mask[j]][0]), aw_s)
            ah_s = jnp.where(a_i == j, float(anchors[mask[j]][1]), ah_s)
        cx = jnp.where(in_s, gx, cx)
        cy = jnp.where(in_s, gy, cy)
        aw = jnp.where(in_s, aw_s, aw)
        ah = jnp.where(in_s, ah_s, ah)
        st = jnp.where(in_s, stride, st)
        base += n_s
    return cx, cy, aw, ah, st


def _postprocess_fast_display(raws, config, img_dim, conf_thr, nms_thr,
                              use_nms: bool, per_scale_k: int) -> jnp.ndarray:
    """Display-mode postprocess with per-scale candidate selection.

    Identical math and output contract to the global-top-k display path,
    but (a) per-anchor scores come from *static lane slices* of the raw
    [B, H, W, A*attrib] head outputs — no [B, N, attrib] reshape/concat of
    the full candidate tensor is ever materialized — and (b) the expensive
    [B, N, attrib] row gather is replaced by per-scale gathers of whole
    cells ([B, k, A*attrib], tiny), with decode constants computed
    arithmetically from the candidate index instead of gathered.  Measured
    8.4 -> ~4 ms/batch64 at 416 on-chip.

    Selection-policy deviation (the ONLY one): candidates are the union of
    each scale's top ``per_scale_k`` rows rather than the global top
    ``pre_nms_topk``.  Final detections match the exact path whenever no
    scale has more than ``per_scale_k`` rows above ``conf_thr``
    (tests/test_postprocess_fast.py).
    """
    C = config.num_classes
    attrib = 5 + C
    A = config.anchors_per_scale
    m = config.max_detections

    boxes_l, score_l, cls_l, obj_l = [], [], [], []
    for raw, mask in zip(raws, config.anchor_masks):
        b, h, w, _ = raw.shape
        stride = img_dim / h
        aw_c = jnp.asarray([config.anchors[i][0] for i in mask], jnp.float32)
        ah_c = jnp.asarray([config.anchors[i][1] for i in mask], jnp.float32)

        per_a = []
        for a in range(A):
            o = raw[..., a * attrib + 4].astype(jnp.float32)
            cmx = jnp.max(
                raw[..., a * attrib + 5:a * attrib + attrib].astype(jnp.float32),
                axis=-1,
            )
            per_a.append(jax.nn.sigmoid(o) * jax.nn.sigmoid(cmx))
        s = jnp.stack(per_a, axis=-1).reshape(b, -1)   # [B, H*W*A], (h,w,a)
        s = jnp.where(s > conf_thr, s, 0.0)

        k_s = min(per_scale_k, s.shape[1])
        top_s, top_i = jax.lax.top_k(s, k_s)
        top_i = top_i.astype(jnp.int32)

        cells = raw.reshape(b, h * w, A * attrib)      # layout-free view
        g = jnp.take_along_axis(cells, (top_i // A)[..., None], axis=1)
        g = g.reshape(b, k_s, A, attrib)
        a_i = top_i % A
        row = jnp.take_along_axis(g, a_i[..., None, None], axis=2)[:, :, 0]
        row = row.astype(jnp.float32)                  # [B, k_s, attrib]

        cell = top_i // A
        gx = (cell % w).astype(jnp.float32)
        gy = (cell // w).astype(jnp.float32)
        bx = (jax.nn.sigmoid(row[..., 0]) + gx) * stride
        by = (jax.nn.sigmoid(row[..., 1]) + gy) * stride
        bw = jnp.exp(row[..., 2]) * aw_c[a_i]
        bh = jnp.exp(row[..., 3]) * ah_c[a_i]
        boxes_l.append(jnp.stack(
            [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], axis=-1))
        score_l.append(top_s)
        cls_l.append(jnp.argmax(row[..., 5:], axis=-1).astype(jnp.float32))
        obj_l.append(jax.nn.sigmoid(row[..., 4]))

    boxes = jnp.concatenate(boxes_l, axis=1)           # [B, K, 4]
    score = jnp.concatenate(score_l, axis=1)
    cls = jnp.concatenate(cls_l, axis=1)
    obj = jnp.concatenate(obj_l, axis=1)

    k = score.shape[1]
    if not use_nms:
        # the no-NMS branch takes the first M rows, which must be the
        # best M — sort the (small) merged set
        score, perm = jax.lax.top_k(score, k)
        boxes = jnp.take_along_axis(boxes, perm[..., None], axis=1)
        cls = jnp.take_along_axis(cls, perm, axis=1)
        obj = jnp.take_along_axis(obj, perm, axis=1)

    def per_image(boxes_i, score_i, cls_i, obj_i):
        if use_nms:
            # order-free NMS: the priority mask replaces the global sort
            shifted = boxes_i + (cls_i * _CLASS_OFFSET)[:, None]
            sel, valid = nms_fixed(shifted, score_i, nms_thr, m,
                                   presorted=False)
        else:
            m_eff = min(m, k)
            sel = jnp.arange(m_eff, dtype=jnp.int32)
            valid = score_i[sel] > 0.0
            if m_eff < m:
                pad = m - m_eff
                sel = jnp.concatenate([sel, jnp.zeros((pad,), jnp.int32)])
                valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        out = jnp.concatenate(
            [
                boxes_i[sel],
                obj_i[sel][:, None],
                score_i[sel][:, None],
                cls_i[sel][:, None],
                valid.astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )
        return out * valid[:, None].astype(jnp.float32)

    return jax.vmap(per_image)(boxes, score, cls, obj)


def postprocess_from_raws(
    raws,
    config,
    img_dim: int,
    conf_thr: float,
    nms_thr: float,
    is_eval: bool = False,
    use_nms: bool = True,
    approx_topk: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused postprocess consuming raw head outputs directly.

    Numerically identical to ``decode_all`` + ``postprocess`` but avoids
    materializing the [B, N, 5+C] decoded tensor: scores are computed from
    logits (max of sigmoids == sigmoid of max), only the top-K candidate
    rows are gathered, and boxes are decoded for those K rows alone.  Cuts
    postprocess HBM traffic by ~100x on the serving path.

    Returns [B, M, 8] rows (x1, y1, x2, y2, obj, prob, cls, valid) in
    input-image pixels, like ``postprocess``.
    """
    if (not is_eval) and getattr(config, "display_per_scale_topk", 0) > 0:
        return _postprocess_fast_display(
            raws, config, img_dim, conf_thr, nms_thr, use_nms,
            config.display_per_scale_topk,
        )

    C = config.num_classes
    attrib = 5 + C
    nA = config.anchors_per_scale

    # [B, N, attrib] per scale via contiguous reshape (channel order is
    # (a, attrib), row order (h, w, a) — matches decode_all)
    flats = []
    shapes = []
    for raw in raws:
        b, h, w, _ = raw.shape
        flats.append(raw.reshape(b, h * w * nA, attrib))
        shapes.append((h, w))
    flat = jnp.concatenate(flats, axis=1)            # [B, N, attrib] (bf16 ok)
    n_total = flat.shape[1]

    obj_l = flat[..., 4].astype(jnp.float32)          # [B, N] logits
    cls_l = flat[..., 5:].astype(jnp.float32)         # [B, N, C] logits
    obj = jax.nn.sigmoid(obj_l)

    cx, cy, aw, ah, stride = _scale_constants(
        shapes, config.anchor_masks, config.anchors, img_dim
    )

    pre_k = config.eval_pre_nms_topk if is_eval else config.pre_nms_topk
    k = min(pre_k, n_total * (C if is_eval else 1))
    m = config.max_detections
    if approx_topk is None:
        approx_topk = bool(is_eval and config.eval_approx_topk)

    def top_k(x, kk):
        """Exact by default; TPU-optimized approx_max_k (recall 0.99) when
        requested."""
        if approx_topk:
            return jax.lax.approx_max_k(x, kk, recall_target=0.99)
        return jax.lax.top_k(x, kk)

    if is_eval:
        # Two-stage pair selection straight from the bf16 logits (same
        # exact-set argument as _topk_pairs_eval).  Gather discipline is
        # the whole game on TPU (measured on-chip, bs64/416/80c): narrow
        # gathers ([B,K,4] boxes, [B,K] scalar constants) cost 2-20 ms
        # each while a full-width bf16 row gather is ~4 ms — so the only
        # gathers here are two wide bf16 row gathers plus one int row of
        # global indices, and every decode constant is computed
        # arithmetically from the candidate index (same trick as
        # _postprocess_fast_display).  Casting to f32 after the gather is
        # bit-identical to before it.
        n_box = min(k, n_total)
        box_key = jax.nn.sigmoid(
            jnp.max(cls_l, axis=-1)) * obj                      # [B, N]
        box_key = jnp.where(box_key > conf_thr, box_key, 0.0)
        if n_box < n_total:
            _, bi = jax.lax.approx_max_k(box_key, n_box, recall_target=1.0)
            bi = bi.astype(jnp.int32)
            rows16 = jnp.take_along_axis(flat, bi[..., None], axis=1)
        else:
            bi = jnp.broadcast_to(
                jnp.arange(n_total, dtype=jnp.int32), box_key.shape)
            rows16 = flat

        sub_obj_l = rows16[..., 4].astype(jnp.float32)
        sub_probs = jax.nn.sigmoid(rows16[..., 5:].astype(jnp.float32)) \
            * jax.nn.sigmoid(sub_obj_l)[..., None]
        sub_masked = jnp.where(sub_probs > conf_thr, sub_probs, 0.0)

        if use_nms and not approx_topk and getattr(
                config, "eval_grid_nms", False):
            # Fused selection+NMS over the pair grid (see nms_pairs_grid):
            # decode boxes for ALL n_box stage-1 rows (they feed the IoU
            # sweeps), run the grid loop, then gather the M=128 winners —
            # the only narrow gathers are at K=M (cheap; the 2-20 ms
            # gather trap is at K=4096).
            a_cx, a_cy, a_aw, a_ah, a_st = _constants_from_index(
                bi, shapes, config.anchor_masks, config.anchors,
                img_dim, nA)
            rows32 = rows16[..., :4].astype(jnp.float32)
            abx = (jax.nn.sigmoid(rows32[..., 0]) + a_cx) * a_st
            aby = (jax.nn.sigmoid(rows32[..., 1]) + a_cy) * a_st
            abw = jnp.exp(rows32[..., 2]) * a_aw
            abh = jnp.exp(rows32[..., 3]) * a_ah
            boxes_all = jnp.stack(
                [abx - abw / 2, aby - abh / 2,
                 abx + abw / 2, aby + abh / 2], -1)          # [B, n_box, 4]
            sel_box, sel_cls, sel_score, valid = nms_pairs_grid(
                sub_masked, boxes_all, nms_thr, m)
            obj_all = jax.nn.sigmoid(sub_obj_l)              # [B, n_box]
            out = jnp.concatenate(
                [
                    jnp.take_along_axis(
                        boxes_all, sel_box[..., None], axis=1),
                    jnp.take_along_axis(obj_all, sel_box, axis=1)[..., None],
                    sel_score[..., None],
                    sel_cls.astype(jnp.float32)[..., None],
                    valid.astype(jnp.float32)[..., None],
                ],
                axis=-1,
            )
            return out * valid[..., None].astype(jnp.float32)

        pair_scores = sub_masked.reshape(sub_masked.shape[0], n_box * C)
        if approx_topk:
            top_score, pi = jax.lax.approx_max_k(
                pair_scores, k, recall_target=0.99)
        elif n_box * C > _FLAT_TOPK_MAX:
            top_score, pi = jax.lax.approx_max_k(
                pair_scores, k, recall_target=1.0)
        else:
            top_score, pi = jax.lax.top_k(pair_scores, k)
        pi = pi.astype(jnp.int32)
        sub_i = pi // C
        top_cls = (pi % C).astype(jnp.float32)

        picked = jnp.take_along_axis(
            rows16, sub_i[..., None], axis=1).astype(jnp.float32)
        gi = jnp.take_along_axis(bi, sub_i, axis=1)             # global idx
        g_cx, g_cy, g_aw, g_ah, g_st = _constants_from_index(
            gi, shapes, config.anchor_masks, config.anchors, img_dim, nA)
        bx = (jax.nn.sigmoid(picked[..., 0]) + g_cx) * g_st
        by = (jax.nn.sigmoid(picked[..., 1]) + g_cy) * g_st
        bw = jnp.exp(picked[..., 2]) * g_aw
        bh = jnp.exp(picked[..., 3]) * g_ah
        boxes = jnp.stack(
            [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], -1)
        g_obj = jax.nn.sigmoid(picked[..., 4])
    else:
        cls_max_l = jnp.max(cls_l, axis=-1)                     # [B, N]
        score = obj * jax.nn.sigmoid(cls_max_l)
        score = jnp.where(score > conf_thr, score, 0.0)
        top_score, top_i = top_k(score, k)                      # [B, K]
        top_i = top_i.astype(jnp.int32)
        top_cls = jnp.take_along_axis(
            jnp.argmax(cls_l, axis=-1), top_i, axis=1
        ).astype(jnp.float32)

        # gather the K candidate rows + their decode constants
        rows = jnp.take_along_axis(
            flat, top_i[..., None], axis=1).astype(jnp.float32)
        g_cx, g_cy = cx[top_i], cy[top_i]
        g_aw, g_ah, g_st = aw[top_i], ah[top_i], stride[top_i]

        bx = (jax.nn.sigmoid(rows[..., 0]) + g_cx) * g_st
        by = (jax.nn.sigmoid(rows[..., 1]) + g_cy) * g_st
        bw = jnp.exp(rows[..., 2]) * g_aw
        bh = jnp.exp(rows[..., 3]) * g_ah
        g_obj = jnp.take_along_axis(obj, top_i, axis=1)

        boxes = jnp.stack(
            [bx - bw / 2, by - bh / 2, bx + bw / 2, by + bh / 2], -1)

    def per_image(boxes_i, score_i, cls_i, obj_i):
        if use_nms:
            shifted = boxes_i + (cls_i * _CLASS_OFFSET)[:, None]
            sel, valid = _nms_auto(shifted, score_i, nms_thr, m)
        else:
            m_eff = min(m, k)
            sel = jnp.arange(m_eff, dtype=jnp.int32)
            valid = score_i[sel] > 0.0
            if m_eff < m:
                pad = m - m_eff
                sel = jnp.concatenate([sel, jnp.zeros((pad,), jnp.int32)])
                valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
        out = jnp.concatenate(
            [
                boxes_i[sel],
                obj_i[sel][:, None],
                score_i[sel][:, None],
                cls_i[sel][:, None],
                valid.astype(jnp.float32)[:, None],
            ],
            axis=-1,
        )
        return out * valid[:, None].astype(jnp.float32)

    return jax.vmap(per_image)(boxes, top_score, top_cls, g_obj)


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
