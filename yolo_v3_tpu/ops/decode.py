"""YOLO head decode: raw conv output -> boxes/conf/class probabilities.

TPU-native replacement for the reference YoloLayer inference path
(reference yololayer.py:31-105).  The reference builds its cell-offset mesh
on the **host CPU** every forward call and round-trips device->host->device
(yololayer.py:51-59) — here everything is a single fused on-device
computation: the grid comes from ``broadcasted_iota`` and anchors are
compile-time constants, so XLA folds the whole decode into the head conv's
epilogue.

Decode math (yololayer.py:45-59, 98-104):
    bx = sigmoid(tx) + cx          bw = exp(tw) * anchor_w / stride
    by = sigmoid(ty) + cy          bh = exp(th) * anchor_h / stride
    conf = sigmoid(to)             cls = sigmoid(tc)
    output boxes scaled by stride -> input-image pixels.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yolo_v3_tpu.utils.config import YoloConfig

__all__ = ["decode_head", "decode_all", "raw_to_predictions"]


def raw_to_predictions(raw: jnp.ndarray, num_anchors: int, bbox_attrib: int):
    """[B,H,W,A*attrib] -> [B,H,W,A,attrib].

    NHWC channel index = a * attrib + j, matching the reference reshape
    [B, A*(5+C), H, W] -> [B, A, H, W, 5+C] (yololayer.py:42) so imported
    torch-layout weights line up with no channel shuffling.
    """
    b, h, w, _ = raw.shape
    return raw.reshape(b, h, w, num_anchors, bbox_attrib)


def decode_head(
    raw: jnp.ndarray,
    anchors: Sequence[Tuple[float, float]],
    stride: float,
    flatten: bool = True,
) -> jnp.ndarray:
    """Decode one scale.  ``anchors`` are this scale's anchors in input-image
    pixels; ``stride`` is input_dim / grid_dim.

    Returns [B, H*W*A, 5+C] (flatten=True; row order (h, w, a) matching the
    reference permute+view, yololayer.py:104) or [B, H, W, A, 5+C].
    Box coords are cxcywh in input-image pixels.
    """
    nA = len(anchors)
    b, h, w, c = raw.shape
    attrib = c // nA
    p = raw_to_predictions(raw.astype(jnp.float32), nA, attrib)

    cx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None, :, :, None]
    cy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None, :, :, None]

    # anchors in grid units (reference divides by stride, yololayer.py:37)
    aw = jnp.asarray([a[0] for a in anchors], jnp.float32) / stride
    ah = jnp.asarray([a[1] for a in anchors], jnp.float32) / stride

    bx = (jax.nn.sigmoid(p[..., 0]) + cx) * stride
    by = (jax.nn.sigmoid(p[..., 1]) + cy) * stride
    bw = jnp.exp(p[..., 2]) * aw * stride
    bh = jnp.exp(p[..., 3]) * ah * stride
    conf = jax.nn.sigmoid(p[..., 4])
    cls = jax.nn.sigmoid(p[..., 5:])

    out = jnp.concatenate(
        [jnp.stack([bx, by, bw, bh, conf], axis=-1), cls], axis=-1
    )
    if flatten:
        out = out.reshape(b, h * w * nA, attrib)
    return out


def decode_all(
    raws: Sequence[jnp.ndarray],
    config: YoloConfig,
    img_dim: int,
) -> jnp.ndarray:
    """Decode all scales and concatenate -> [B, sum(H*W*A), 5+C]
    (the reference concatenates det1..det3 at postprocess time,
    test.py:36)."""
    outs = []
    for raw, mask in zip(raws, config.anchor_masks):
        stride = img_dim / raw.shape[1]
        anchors = [config.anchors[i] for i in mask]
        outs.append(decode_head(raw, anchors, stride))
    return jnp.concatenate(outs, axis=1)
