"""Fused conv kernels on a padded-2D activation layout (Pallas TPU).

A Pallas alternative to XLA's conv stack (reference conv_bn_relu /
res_layer, reference darknet.py:27-53).  **Measured status (docs/STATUS.md,
round 2, dispatch-differenced): OFF the serving path.**  The early-round
numbers that motivated this design ("XLA convs only reach ~37-55 TF/s")
were dispatch-RTT artifacts; with correct differencing, XLA int8
convolutions sustain ~190-307 TOP/s at YOLOv3's residual-block shapes and
these Pallas kernels measure *slower* (91 vs 304 TOP/s at stage 2).  The
kernels are kept as exact-parity-tested infrastructure for shapes/fusions
XLA handles badly, not as the default path.

The design: make convolutions *be* matmuls.  Activations live in a **padded-2D
layout**: a [B, H, W, C] tensor is stored as ``x2d`` of shape
``[B*(H+2)*(W+2), C]`` — each image zero-padded by one pixel on every side
and the (batch, row, col) dims flattened.  In this layout the 9 taps of a
3x3/stride-1 'SAME' convolution are **constant row offsets**::

    out[g] = sum_{dy,dx} x2d[g + (dy-1)*(W+2) + (dx-1)] @ w[dy, dx]

so one VMEM-resident row window of the input feeds 9 MXU matmuls, the
3x3+bias+leaky(+residual)(+requantize) block becomes a single kernel with
one HBM read and one HBM write, and both the bf16 and int8 MXU modes apply.
Border rows (the zero padding of the *output*) are re-zeroed in the
epilogue, keeping the layout closed under composition — a whole backbone
stage runs without ever leaving it.

Epilogue math (positively-homogeneous leaky makes requantization foldable)::

    y      = leaky( acc * scale + bias )        # scale = s_x*s_w/s_y [N]
    out    = clip(round(y + residual * res_scale), -127, 127)   # int8 out
    out    = y + residual * res_scale                           # bf16 out

Kernels:
* :func:`conv1x1_p2d` — pointwise conv: blocked matmul, auto-pipelined
  BlockSpecs.
* :func:`conv3x3_p2d` — 3x3/stride-1 conv: manual double-buffered DMA of
  overlapping row windows (halos are not expressible as BlockSpec blocks),
  9 accumulated tap matmuls.
* :func:`res_block_p2d` — reference res_layer (darknet.py:46-53): 1x1 ->
  3x3 with the identity add fused into the 3x3 epilogue.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY = 0.1


def _leaky(x):
    return jnp.where(x > 0, x, LEAKY * x)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# Layout helpers
# ---------------------------------------------------------------------------

def pack_p2d(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B*(H+2)*(W+2), C] with one zero-pixel border."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xp.reshape(b * (h + 2) * (w + 2), c)


def unpack_p2d(x2d: jnp.ndarray, b: int, h: int, w: int) -> jnp.ndarray:
    """[B*(H+2)*(W+2), C] -> [B, H, W, C] (borders dropped)."""
    c = x2d.shape[-1]
    xp = x2d.reshape(b, h + 2, w + 2, c)
    return xp[:, 1:h + 1, 1:w + 1, :]


def _border_mask(g0, tile_m: int, hp: int, wp: int):
    """[tile_m, 1] bool: True for VALID (non-border) padded positions.

    ``g0`` is the global padded-row index of the block's first row.
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (tile_m, 1), 0) + g0
    p = i % (hp * wp)
    row = p // wp
    col = p % wp
    return (row >= 1) & (row <= hp - 2) & (col >= 1) & (col <= wp - 2)


def _epilogue(acc, scale_ref, bias_ref, valid, residual, res_scale,
              leaky: bool, out_dtype):
    """acc [TM, TN] (f32/i32) -> out block, borders zeroed."""
    y = acc.astype(jnp.float32) * scale_ref[:].astype(jnp.float32)
    y = y + bias_ref[:].astype(jnp.float32)
    if leaky:
        y = _leaky(y)
    if residual is not None:
        y = y + residual.astype(jnp.float32) * res_scale
    y = jnp.where(valid, y, 0.0)
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# 1x1 conv (pointwise): plain blocked matmul with fused epilogue
# ---------------------------------------------------------------------------

def _conv1x1_kernel(x_ref, w_ref, s_ref, b_ref, *rest,
                    tile_m: int, hp: int, wp: int, leaky: bool,
                    res_scale: float, out_dtype, acc_dtype):
    if len(rest) == 2:
        r_ref, o_ref = rest
    else:
        (o_ref,) = rest
        r_ref = None
    m = pl.program_id(0)
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=acc_dtype)
    valid = _border_mask(m * tile_m, tile_m, hp, wp)
    res = r_ref[:] if r_ref is not None else None
    o_ref[:] = _epilogue(acc, s_ref, b_ref, valid, res, res_scale,
                         leaky, out_dtype)


def conv1x1_p2d(
    x2d: jnp.ndarray,            # [R, C] int8 or bf16, padded-2D layout
    w: jnp.ndarray,              # [C, N] same dtype
    scale: jnp.ndarray,          # [N] f32  (s_x*s_w/s_y; 1.0 chain for bf16)
    bias: jnp.ndarray,           # [N] f32  (already divided by s_y)
    hp: int,
    wp: int,
    *,
    leaky: bool = True,
    out_dtype=jnp.int8,
    residual: Optional[jnp.ndarray] = None,   # [R, N] same dtype as out
    res_scale: float = 1.0,
    tile_m: int = 1024,
    tile_n: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    r, c = x2d.shape
    n = w.shape[1]
    tile_m = min(tile_m, _round_up(r, 8))
    tile_n = tile_n or min(n, 512)
    assert r % tile_m == 0 and n % tile_n == 0, (r, tile_m, n, tile_n)
    acc_dtype = jnp.int32 if x2d.dtype == jnp.int8 else jnp.float32

    kernel = functools.partial(
        _conv1x1_kernel, tile_m=tile_m, hp=hp, wp=wp, leaky=leaky,
        res_scale=res_scale, out_dtype=out_dtype, acc_dtype=acc_dtype,
    )
    in_specs = [
        pl.BlockSpec((tile_m, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x2d, w, scale.reshape(1, n), bias.reshape(1, n)]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(residual)
    return pl.pallas_call(
        kernel,
        grid=(r // tile_m, n // tile_n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# 3x3 stride-1 conv: double-buffered window DMA + 9 tap matmuls
# ---------------------------------------------------------------------------

def _conv3x3_kernel(x_hbm, w_ref, s_ref, b_ref, *rest,
                    tile_m: int, halo: int, win_rows: int, hp: int, wp: int,
                    n_m: int, leaky: bool, res_scale: float, out_dtype,
                    acc_dtype):
    if len(rest) == 5:
        r_ref, o_ref, win, acc_ref, sem = rest
    else:
        o_ref, win, acc_ref, sem = rest
        r_ref = None
    m = pl.program_id(0)
    nj = pl.num_programs(1)
    j = pl.program_id(1)

    def start(slot, mi):
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(mi * tile_m, win_rows)], win.at[slot], sem.at[slot]
        )

    # double buffering across m: window m was prefetched at m-1; prefetch m+1
    @pl.when((m == 0) & (j == 0))
    def _():
        start(0, 0).start()

    @pl.when(j == 0)
    def _():
        start(m % 2, m).wait()

        @pl.when(m + 1 < n_m)
        def _():
            start((m + 1) % 2, m + 1).start()

    slot = m % 2
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for dy in range(3):
        for dx in range(3):
            s = dy * wp + dx
            tap = win[slot, pl.ds(s, tile_m), :]
            acc_ref[:] += jnp.dot(tap, w_ref[dy * 3 + dx],
                                  preferred_element_type=acc_dtype)

    valid = _border_mask(m * tile_m, tile_m, hp, wp)
    res = r_ref[:] if r_ref is not None else None
    o_ref[:] = _epilogue(acc_ref[:], s_ref, b_ref, valid, res, res_scale,
                         leaky, out_dtype)
    del j, nj


def conv3x3_p2d(
    x2d: jnp.ndarray,            # [R, C] int8/bf16, padded-2D layout
    w: jnp.ndarray,              # [3, 3, C, N] (or [9, C, N] / [9*C, N])
    scale: jnp.ndarray,          # [N] f32
    bias: jnp.ndarray,           # [N] f32
    hp: int,
    wp: int,
    *,
    leaky: bool = True,
    out_dtype=jnp.int8,
    residual: Optional[jnp.ndarray] = None,
    res_scale: float = 1.0,
    tile_m: int = 1024,
    tile_n: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    r, c = x2d.shape
    w = w.reshape(9, c, -1)
    n = w.shape[-1]
    tile_m = min(tile_m, _round_up(r, 8))
    tile_n = tile_n or min(n, 512)
    assert r % tile_m == 0 and n % tile_n == 0, (r, tile_m, n, tile_n)
    acc_dtype = jnp.int32 if x2d.dtype == jnp.int8 else jnp.float32
    n_m = r // tile_m

    # halo: taps reach +-(wp+1) rows; pad globally so windows stay in-bounds.
    # Mosaic requires DMA slice shapes (and offsets) aligned to the sublane
    # tiling, so the window is rounded up to 32 rows and the source padded
    # to cover the last window.
    halo = wp + 1
    win_rows = _round_up(tile_m + 2 * halo, 32)
    bot_pad = (n_m - 1) * tile_m + win_rows - (r + halo)
    xh = jnp.pad(x2d, ((halo, max(bot_pad, 0)), (0, 0)))

    kernel = functools.partial(
        _conv3x3_kernel, tile_m=tile_m, halo=halo, win_rows=win_rows,
        hp=hp, wp=wp, n_m=n_m,
        leaky=leaky, res_scale=res_scale, out_dtype=out_dtype,
        acc_dtype=acc_dtype,
    )
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),                      # x stays HBM
        pl.BlockSpec((9, c, tile_n), lambda i, j: (0, 0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_n), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [xh, w, scale.reshape(1, n), bias.reshape(1, n)]
    if residual is not None:
        in_specs.append(
            pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(residual)
    return pl.pallas_call(
        kernel,
        grid=(n_m, n // tile_n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, win_rows, c), x2d.dtype),
            pltpu.VMEM((tile_m, tile_n), acc_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Residual block (reference res_layer, darknet.py:46-53)
# ---------------------------------------------------------------------------

def res_block_p2d(
    x2d: jnp.ndarray,
    w1: jnp.ndarray, s1: jnp.ndarray, b1: jnp.ndarray,
    w2: jnp.ndarray, s2: jnp.ndarray, b2: jnp.ndarray,
    hp: int, wp: int,
    *,
    out_dtype=jnp.int8,
    res_scale: float = 1.0,     # s_x / s_y: input scale over output scale
    tile_m: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + leaky(conv3x3(leaky(conv1x1(x)))) with the add fused into the
    3x3's epilogue.  For int8, ``res_scale`` rescales the identity branch
    into the output's quantization domain."""
    mid = conv1x1_p2d(x2d, w1, s1, b1, hp, wp, leaky=True,
                      out_dtype=x2d.dtype, tile_m=tile_m, interpret=interpret)
    return conv3x3_p2d(mid, w2, s2, b2, hp, wp, leaky=True,
                       out_dtype=out_dtype, residual=x2d,
                       res_scale=res_scale, tile_m=tile_m,
                       interpret=interpret)


# ---------------------------------------------------------------------------
# Reference (XLA) compositions for testing
# ---------------------------------------------------------------------------

def conv3x3_ref(x: jnp.ndarray, w: jnp.ndarray, scale, bias, *,
                leaky=True, out_dtype=jnp.int8, residual=None,
                res_scale: float = 1.0) -> jnp.ndarray:
    """NHWC XLA reference of the 3x3 kernel's math (int32/f32 accumulate,
    same epilogue), for parity tests."""
    acc_t = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    acc = jax.lax.conv_general_dilated(
        x, w.reshape(3, 3, x.shape[-1], -1), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_t,
    )
    y = acc.astype(jnp.float32) * scale + bias
    if leaky:
        y = _leaky(y)
    if residual is not None:
        y = y + residual.astype(jnp.float32) * res_scale
    if out_dtype == jnp.int8:
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return y.astype(out_dtype)


def p2d_geometry(b: int, h: int, w: int) -> Tuple[int, int, int]:
    """(R, hp, wp) of the padded-2D layout for a [b, h, w, *] tensor."""
    return b * (h + 2) * (w + 2), h + 2, w + 2


def pick_tile_m(r: int, target: int = 1024) -> int:
    """Largest divisor of R that is <= target, preferring multiples of 32
    (the int8 sublane tile — DMA offsets must be tiling-aligned), then 8,
    then any divisor, then R itself (single tile)."""
    for step in (32, 8):
        best = None
        for t in range(step, target + 1, step):
            if r % t == 0:
                best = t
        if best is not None:
            return best
    for t in range(min(target, r), 0, -1):
        if r % t == 0:
            return t
    return r


__all__ = [
    "pack_p2d", "unpack_p2d", "conv1x1_p2d", "conv3x3_p2d", "res_block_p2d",
    "conv3x3_ref", "p2d_geometry", "pick_tile_m",
]
