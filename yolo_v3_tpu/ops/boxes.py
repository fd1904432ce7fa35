"""Bounding-box geometry: format/coordinate conversion, IoU, letterbox math.

Functional (pure, out-of-place) equivalents of the reference converters and
IoU kernels (reference boundingbox.py:11-149, utils.py:98-146).  Everything is
plain ``jax.numpy`` on static shapes, so every function works under
``jit``/``vmap``/``grad`` and fuses into surrounding computation on TPU.

Unlike the reference's 2-D dispatch-table ``BoundingBoxConverter``
(boundingbox.py:52-80) we expose direct named conversions plus a small
``convert`` wrapper for API parity.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

__all__ = [
    "CoordinateType",
    "FormatType",
    "convert",
    "x1y1x2y2_to_cxcywh",
    "x1y1x2y2_to_xywh",
    "cxcywh_to_x1y1x2y2",
    "cxcywh_to_xywh",
    "xywh_to_x1y1x2y2",
    "xywh_to_cxcywh",
    "absolute_to_relative",
    "relative_to_absolute",
    "iou_pairwise",
    "iou_matrix",
    "wh_iou",
    "letterbox_params",
    "letterbox_labels",
    "letterbox_labels_reverse",
    "letterbox_reverse",
    "rescale_boxes",
    "correct_yolo_boxes",
]


class CoordinateType:
    """Pixel-space vs. normalized coordinates (reference boundingbox.py:85-87)."""

    Absolute = 0
    Relative = 1


class FormatType:
    """Box layouts (reference boundingbox.py:90-93)."""

    x1y1x2y2 = 0  # corners
    cxcywh = 1    # center + size
    xywh = 2      # top-left + size (COCO)


# ---------------------------------------------------------------------------
# Format conversions.  All take [..., 4] and return [..., 4].
# ---------------------------------------------------------------------------

def x1y1x2y2_to_cxcywh(box: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    w, h = x2 - x1, y2 - y1
    return jnp.stack([x1 + w / 2, y1 + h / 2, w, h], axis=-1)


def x1y1x2y2_to_xywh(box: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)


def cxcywh_to_x1y1x2y2(box: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def cxcywh_to_xywh(box: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, w, h], axis=-1)


def xywh_to_x1y1x2y2(box: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([x, y, x + w, y + h], axis=-1)


def xywh_to_cxcywh(box: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    return jnp.stack([x + w / 2, y + h / 2, w, h], axis=-1)


_FORMAT_TABLE = {
    (FormatType.x1y1x2y2, FormatType.cxcywh): x1y1x2y2_to_cxcywh,
    (FormatType.x1y1x2y2, FormatType.xywh): x1y1x2y2_to_xywh,
    (FormatType.cxcywh, FormatType.x1y1x2y2): cxcywh_to_x1y1x2y2,
    (FormatType.cxcywh, FormatType.xywh): cxcywh_to_xywh,
    (FormatType.xywh, FormatType.x1y1x2y2): xywh_to_x1y1x2y2,
    (FormatType.xywh, FormatType.cxcywh): xywh_to_cxcywh,
}


def absolute_to_relative(box: jnp.ndarray, img_dim: Tuple[int, int]) -> jnp.ndarray:
    """Divide x-like coords by image width, y-like by height.

    ``img_dim`` is (width, height), matching reference boundingbox.py:42-45.
    Assumes a size-carrying format (any of the three: x/w columns are 0,2 and
    y/h columns are 1,3).
    """
    w, h = img_dim
    scale = jnp.asarray([w, h, w, h], dtype=jnp.result_type(box, jnp.float32))
    return box / scale


def relative_to_absolute(box: jnp.ndarray, img_dim: Tuple[int, int]) -> jnp.ndarray:
    w, h = img_dim
    scale = jnp.asarray([w, h, w, h], dtype=jnp.result_type(box, jnp.float32))
    return box * scale


def convert(
    labels: jnp.ndarray,
    src_coord: int,
    src_format: int,
    dst_coord: int,
    dst_format: int,
    bbox_idx: Tuple[int, int, int, int] = (0, 1, 2, 3),
    img_dim: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Out-of-place equivalent of BoundingBoxConverter.convert
    (reference boundingbox.py:59-80): convert the 4 box columns at
    ``bbox_idx`` of ``labels`` between formats and coordinate types.
    """
    labels = jnp.asarray(labels)
    box = labels[..., jnp.asarray(bbox_idx)]
    if src_format != dst_format:
        box = _FORMAT_TABLE[(src_format, dst_format)](box)
    if src_coord != dst_coord:
        if src_coord == CoordinateType.Absolute:
            box = absolute_to_relative(box, img_dim)
        else:
            box = relative_to_absolute(box, img_dim)
    for out_col, col in enumerate(bbox_idx):
        labels = labels.at[..., col].set(box[..., out_col])
    return labels


# ---------------------------------------------------------------------------
# IoU
# ---------------------------------------------------------------------------

def _corners(box: jnp.ndarray, mode: str):
    if mode == "x1y1x2y2":
        return box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    if mode == "cxcywh":
        cx, cy, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
        return cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2
    raise ValueError(f"unknown box mode {mode!r}")


def iou_matrix(b1: jnp.ndarray, b2: jnp.ndarray, mode: str = "x1y1x2y2") -> jnp.ndarray:
    """All-pairs IoU between ``b1`` [..., N, 4] and ``b2`` [..., M, 4]
    -> [..., N, M].

    Same math as the reference's ``bbox_iou`` (utils.py:122-146), including
    its division semantics: no epsilon, so degenerate (zero-area) pairs give
    0/0 = NaN exactly as the reference does.
    """
    b1_x1, b1_y1, b1_x2, b1_y2 = _corners(b1[..., :, None, :], mode)
    b2_x1, b2_y1, b2_x2, b2_y2 = _corners(b2[..., None, :, :], mode)

    ix1 = jnp.maximum(b1_x1, b2_x1)
    iy1 = jnp.maximum(b1_y1, b2_y1)
    ix2 = jnp.minimum(b1_x2, b2_x2)
    iy2 = jnp.minimum(b1_y2, b2_y2)

    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area1 = (b1_x2 - b1_x1) * (b1_y2 - b1_y1)
    area2 = (b2_x2 - b2_x1) * (b2_y2 - b2_y1)
    return inter / (area1 + area2 - inter)


def iou_pairwise(b1: jnp.ndarray, b2: jnp.ndarray, mode: str = "x1y1x2y2") -> jnp.ndarray:
    """Element-wise IoU of aligned boxes [..., 4] x [..., 4] -> [...]."""
    b1_x1, b1_y1, b1_x2, b1_y2 = _corners(b1, mode)
    b2_x1, b2_y1, b2_x2, b2_y2 = _corners(b2, mode)

    ix1 = jnp.maximum(b1_x1, b2_x1)
    iy1 = jnp.maximum(b1_y1, b2_y1)
    ix2 = jnp.minimum(b1_x2, b2_x2)
    iy2 = jnp.minimum(b1_y2, b2_y2)

    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    area1 = (b1_x2 - b1_x1) * (b1_y2 - b1_y1)
    area2 = (b2_x2 - b2_x1) * (b2_y2 - b2_y1)
    return inter / (area1 + area2 - inter)


def wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """IoU of co-centered boxes given sizes only: [..., N, 2] x [..., M, 2]
    -> [..., N, M].

    Used for best-anchor assignment, where the reference builds explicit
    (0, 0, w, h) boxes and calls bbox_iou (yololayer.py:146-148).  For
    co-centered boxes IoU reduces to overlap of sizes.
    """
    w1, h1 = wh1[..., :, None, 0], wh1[..., :, None, 1]
    w2, h2 = wh2[..., None, :, 0], wh2[..., None, :, 1]
    inter = jnp.minimum(w1, w2) * jnp.minimum(h1, h2)
    return inter / (w1 * h1 + w2 * h2 - inter)


# ---------------------------------------------------------------------------
# Letterbox geometry
# ---------------------------------------------------------------------------

def letterbox_params(org_w: int, org_h: int, new_w: int, new_h: int):
    """Aspect-preserving resize-and-pad geometry.

    Returns (resize_w, resize_h, x_pad, y_pad, ratio) with the reference's
    exact int truncation / floor-div rounding (transforms.py:261-265):
    ``resize = int(org * ratio)``, ``pad = (new - resize) // 2``.
    Python-int math: call at trace time with static dims.
    """
    ratio = min(new_w / org_w, new_h / org_h)
    resize_w, resize_h = int(org_w * ratio), int(org_h * ratio)
    x_pad, y_pad = (new_w - resize_w) // 2, (new_h - resize_h) // 2
    return resize_w, resize_h, x_pad, y_pad, ratio


def letterbox_reverse(
    boxes: jnp.ndarray, org_w, org_h, new_w, new_h
) -> jnp.ndarray:
    """Map corner boxes from letterboxed-image pixels back to original-image
    pixels, clipping to the original frame (reference boundingbox.py:95-116).

    Unlike the reference this applies to all rows (the reference skips
    all-zero rows, which stay zero here anyway because pads only shift
    nonzero coords; callers mask invalid rows themselves).
    """
    ratio = jnp.minimum(new_w / org_w, new_h / org_h)
    resize_w = jnp.floor(org_w * ratio)
    resize_h = jnp.floor(org_h * ratio)
    x_pad = jnp.floor((new_w - resize_w) / 2)
    y_pad = jnp.floor((new_h - resize_h) / 2)

    x1 = jnp.clip((boxes[..., 0] - x_pad) / ratio, 0, org_w)
    y1 = jnp.clip((boxes[..., 1] - y_pad) / ratio, 0, org_h)
    x2 = jnp.clip((boxes[..., 2] - x_pad) / ratio, 0, org_w)
    y2 = jnp.clip((boxes[..., 3] - y_pad) / ratio, 0, org_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def rescale_boxes(boxes: jnp.ndarray, org_w, org_h, new_w, new_h) -> jnp.ndarray:
    """Undo a plain (non-aspect-preserving) resize (reference
    boundingbox.py:119-137)."""
    rx, ry = new_w / org_w, new_h / org_h
    x1 = jnp.clip(boxes[..., 0] / rx, 0, org_w)
    y1 = jnp.clip(boxes[..., 1] / ry, 0, org_h)
    x2 = jnp.clip(boxes[..., 2] / rx, 0, org_w)
    y2 = jnp.clip(boxes[..., 3] / ry, 0, org_h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def letterbox_labels(labels: jnp.ndarray, org_w, org_h, new_w, new_h) -> jnp.ndarray:
    """Map relative-cxcywh label rows [..., >=5] (cls, cx, cy, w, h) from
    original-image space into letterboxed space (reference letterbox_label,
    utils.py:12-21)."""
    labels = jnp.asarray(labels)
    rw = jnp.floor(org_w * jnp.minimum(new_w / org_w, new_h / org_h))
    rh = jnp.floor(org_h * jnp.minimum(new_w / org_w, new_h / org_h))
    xp = jnp.floor((new_w - rw) / 2)
    yp = jnp.floor((new_h - rh) / 2)
    cx = labels[..., 1] * (rw / new_w) + xp / new_w
    cy = labels[..., 2] * (rh / new_h) + yp / new_h
    w = labels[..., 3] * (rw / new_w)
    h = labels[..., 4] * (rh / new_h)
    out = labels.at[..., 1].set(cx).at[..., 2].set(cy)
    return out.at[..., 3].set(w).at[..., 4].set(h)


def letterbox_labels_reverse(labels: jnp.ndarray, org_w, org_h, new_w, new_h) -> jnp.ndarray:
    """Inverse of :func:`letterbox_labels`, clipped to [0, 1] (reference
    letterbox_label_reverse, utils.py:23-32)."""
    labels = jnp.asarray(labels)
    ratio = jnp.minimum(new_w / org_w, new_h / org_h)
    rw = jnp.floor(org_w * ratio)
    rh = jnp.floor(org_h * ratio)
    xp = jnp.floor((new_w - rw) / 2)
    yp = jnp.floor((new_h - rh) / 2)
    cx = jnp.clip((labels[..., 1] - xp / new_w) / (rw / new_w), 0, 1)
    cy = jnp.clip((labels[..., 2] - yp / new_h) / (rh / new_h), 0, 1)
    w = jnp.clip(labels[..., 3] / (rw / new_w), 0, 1)
    h = jnp.clip(labels[..., 4] / (rh / new_h), 0, 1)
    out = labels.at[..., 1].set(cx).at[..., 2].set(cy)
    return out.at[..., 3].set(w).at[..., 4].set(h)


def correct_yolo_boxes(
    boxes: jnp.ndarray, org_w, org_h, img_w, img_h, is_letterbox: bool = False
) -> jnp.ndarray:
    """Network-input-space corners -> original-image xywh for COCO json
    (reference boundingbox.py:139-149)."""
    if is_letterbox:
        boxes = letterbox_reverse(boxes, org_w, org_h, img_w, img_h)
    else:
        boxes = rescale_boxes(boxes, org_w, org_h, img_w, img_h)
    return x1y1x2y2_to_xywh(boxes)
