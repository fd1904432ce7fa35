"""Letterbox preprocessing: aspect-preserving resize + gray padding.

Two implementations with identical geometry (shared
:func:`yolo_v3_tpu.ops.boxes.letterbox_params` rounding):

* :func:`letterbox_device` — on-device ``jax.image.resize`` path, jit/vmap
  friendly, used by the high-throughput inference pipeline so preprocessing
  fuses with the network (the reference resizes on host with OpenCV,
  utils.py:44-56 / transforms.py:153-178).
* :func:`letterbox_host` — host OpenCV INTER_CUBIC path for exact pixel
  parity with the reference's evaluation harness.

Both normalize uint8 [0,255] -> float [0,1] (reference transforms.py:34) and
pad with 128/255 gray (reference utils.py:46, transforms.py:145).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_v3_tpu.ops.boxes import letterbox_params

PAD_VALUE = 128.0 / 255.0


@functools.lru_cache(maxsize=256)
def _cubic_weight_matrix(src_len: int, dst_len: int, a: float = -0.75) -> np.ndarray:
    """Dense [dst, src] interpolation matrix for 1-D cubic resize with
    OpenCV INTER_CUBIC conventions: Keys kernel a=-0.75, half-pixel centers
    (src = (dst+0.5)*scale - 0.5), border-replicate clamping, no antialias.

    Expressing the resize as two dense matmuls keeps it on the MXU and gives
    numerical parity with the reference's cv2 resize (utils.py:50) up to
    uint8 rounding — ``jax.image.resize`` uses a different kernel (a=-0.5)
    and antialiases on downsample, which breaks detection parity.
    """

    def keys(t: np.ndarray) -> np.ndarray:
        t = np.abs(t)
        return np.where(
            t <= 1,
            (a + 2) * t**3 - (a + 3) * t**2 + 1,
            np.where(t < 2, a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a, 0.0),
        )

    scale = src_len / dst_len
    mat = np.zeros((dst_len, src_len), np.float32)
    for i in range(dst_len):
        src = (i + 0.5) * scale - 0.5
        base = int(np.floor(src))
        frac = src - base
        taps = np.arange(base - 1, base + 3)
        w = keys(taps - src)
        # cv2 renormalizes the 4-tap window (sums to 1 for the Keys kernel
        # already; keep the guard for degenerate edges)
        w = w / w.sum()
        for tap, wt in zip(taps, w):
            mat[i, min(max(tap, 0), src_len - 1)] += wt
        del frac
    return mat


def resize_cubic_device(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """HWC float image resize as two MXU matmuls with cv2-parity weights."""
    wh = jnp.asarray(_cubic_weight_matrix(x.shape[0], out_h))
    ww = jnp.asarray(_cubic_weight_matrix(x.shape[1], out_w))
    y = jnp.tensordot(wh, x, axes=[[1], [0]])          # [out_h, w, c]
    y = jnp.einsum("ws,hsc->hwc", ww, y,
                   preferred_element_type=jnp.float32)  # [out_h, out_w, c]
    return y


@functools.partial(jax.jit, static_argnames=("out_dim",))
def letterbox_device(img: jnp.ndarray, out_dim: Tuple[int, int]) -> jnp.ndarray:
    """Letterbox one HWC image (uint8 or float) to (out_w, out_h) on device.

    Static input shape -> static resize geometry; XLA compiles one program
    per (input-shape, output-dim) pair.
    """
    out_w, out_h = out_dim
    h, w = img.shape[0], img.shape[1]
    rw, rh, xp, yp, _ = letterbox_params(w, h, out_w, out_h)

    x = img.astype(jnp.float32)
    if img.dtype == jnp.uint8:
        x = x / 255.0
    resized = resize_cubic_device(x, rh, rw)
    # cubic overshoot -> clip to gamut, like the reference's uint8 saturation
    resized = jnp.clip(resized, 0.0, 1.0)
    canvas = jnp.full((out_h, out_w, img.shape[2]), PAD_VALUE, jnp.float32)
    return jax.lax.dynamic_update_slice(canvas, resized, (yp, xp, 0))


def letterbox_host_u8(img: np.ndarray, out_dim: Tuple[int, int]) -> np.ndarray:
    """Host letterbox with OpenCV INTER_CUBIC, kept in uint8 (reference
    utils.py:44-56 pixel semantics: resize uint8, paste onto gray-128
    canvas).  This IS the reference's pre-normalization image — the int8
    serving path feeds it directly (models/quantized.py u8 entry) without
    ever materializing floats."""
    import cv2

    out_w, out_h = out_dim
    h, w = img.shape[:2]
    rw, rh, xp, yp, _ = letterbox_params(w, h, out_w, out_h)
    canvas = np.full((out_h, out_w, img.shape[2]), 128, dtype=np.uint8)
    canvas[yp:yp + rh, xp:xp + rw] = cv2.resize(
        img, (rw, rh), interpolation=cv2.INTER_CUBIC
    )
    return canvas


def letterbox_host(img: np.ndarray, out_dim: Tuple[int, int]) -> np.ndarray:
    """Host letterbox, normalized float32 (reference's ToTensor semantics)."""
    return letterbox_host_u8(img, out_dim).astype(np.float32) / 255.0
