"""Pallas TPU kernels for bandwidth-bound hot ops.

**Measured status (docs/STATUS.md, round 2): OFF the serving path.**  With
dispatch-differenced timing, Pallas shows no headroom over XLA at identical
int8 matmul recipes on this chip (132 vs 140 TOP/s steady-state), and the
serving path is XLA int8 convs (models/quantized.py); the round-1 claim
that this fused block beat XLA came from dispatch-RTT-polluted timings.

The design idea stands on its own terms: XLA materializes every conv
output, so a residual block (1x1 conv -> 3x3 conv -> add, reference
darknet.py:46-53) moves ~5 tensors' worth of HBM traffic, while
:func:`fused_res_block` computes the whole block per VMEM tile — the input
row-window is DMA'd in once (with a one-row halo for the 3x3), both convs
run as MXU matmuls on VMEM-resident data, and only the final sum is written
back.  Kept as exact-parity-tested infrastructure.

Numerics match the BN-folded XLA path (`darknet._conv_bias_leaky` chain):
bf16 inputs/weights, fp32 accumulation, leaky-ReLU(0.1) epilogues.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY = 0.1


def _leaky(x):
    return jnp.where(x > 0, x, LEAKY * x)


def _res_block_kernel(y_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
                      win, sem,
                      *, tile_h: int, width: int, cin: int, cmid: int):
    """One (batch, row-tile) program: out = y + leaky(conv3x3(leaky(
    conv1x1(y)))) on a (tile_h+2)-row window of y (1-row halo for the 3x3).

    ``y_hbm`` is the full padded input [B, H+2, W, C] left in HBM; the
    window is DMA'd into the ``win`` VMEM scratch.  ``out_ref`` is the
    non-overlapping [1, tile_h, W, C] output block.
    """
    bi = pl.program_id(0)
    t = pl.program_id(1)
    th2 = tile_h + 2

    # rows [t*tile_h, t*tile_h + th2) of the padded input = original rows
    # [t*tile_h - 1, ...): the halo. Padded rows are zero (conv padding).
    copy = pltpu.make_async_copy(
        y_hbm.at[bi, pl.ds(t * tile_h, th2)], win, sem
    )
    copy.start()
    copy.wait()

    y = win[:]                                      # [th+2, W, C] bf16

    # 1x1 conv + leaky on the full window (halo rows included)
    r = jnp.dot(
        y.reshape(th2 * width, cin),
        w1_ref[:],
        preferred_element_type=jnp.float32,
    ) + b1_ref[:].astype(jnp.float32)
    r = _leaky(r).astype(y.dtype).reshape(th2, width, cmid)

    # the 3x3's zero padding applies to conv1's OUTPUT: halo rows that fall
    # outside the image must be zero r, not conv1(zero-pixels) = leaky(b1)
    n_t = pl.num_programs(1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (th2, 1, 1), 0)
    oob = ((t == 0) & (row_ids == 0)) | ((t == n_t - 1) & (row_ids == th2 - 1))
    r = jnp.where(oob, jnp.zeros_like(r), r)

    # horizontal zero pad for the 3x3's dx taps
    rp = jnp.pad(r, ((0, 0), (1, 1), (0, 0)))       # [th+2, W+2, Cmid]

    acc = jnp.zeros((tile_h * width, cin), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            window = rp[dy:dy + tile_h, dx:dx + width, :]
            acc = acc + jnp.dot(
                window.reshape(tile_h * width, cmid),
                w2_ref[dy, dx],
                preferred_element_type=jnp.float32,
            )
    acc = acc + b2_ref[:].astype(jnp.float32)
    out = _leaky(acc).astype(y.dtype).reshape(tile_h, width, cin)
    out_ref[0] = y[1:1 + tile_h] + out


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def fused_res_block(
    y: jnp.ndarray,
    w1: jnp.ndarray,   # [1, 1, C, C/2] or [C, C/2]
    b1: jnp.ndarray,
    w2: jnp.ndarray,   # [3, 3, C/2, C]
    b2: jnp.ndarray,
    tile_h: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused residual block on [B, H, W, C] (H divisible by tile_h).

    Channel dims below the 128-lane tile are zero-padded up to 128 (Mosaic
    requires lane-aligned HBM slices, and XLA stores such tensors
    lane-padded anyway, so the DMA moves the same bytes).  Zero weight/bias
    padding keeps numerics exact; the output is sliced back to C.
    """
    b, h, w, c = y.shape
    cmid = w2.shape[2]
    if w1.ndim == 4:
        w1 = w1.reshape(c, cmid)
    assert h % tile_h == 0, (h, tile_h)
    n_tiles = h // tile_h

    c_pad = _round_up(c, 128)
    m_pad = _round_up(cmid, 128)
    orig_c = c
    if c_pad != c or m_pad != cmid:
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 0), (0, c_pad - c)))
        w1 = jnp.pad(w1, ((0, c_pad - c), (0, m_pad - cmid)))
        b1 = jnp.pad(b1, (0, m_pad - cmid))
        w2 = jnp.pad(w2, ((0, 0), (0, 0), (0, m_pad - cmid), (0, c_pad - c)))
        b2 = jnp.pad(b2, (0, c_pad - c))
        c, cmid = c_pad, m_pad

    # one zero row top/bottom = the 3x3's vertical zero padding; windows of
    # the padded array are then always in-bounds
    y_padded = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))

    kernel = functools.partial(
        _res_block_kernel, tile_h=tile_h, width=w, cin=c, cmid=cmid
    )

    out = pl.pallas_call(
        kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # y stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_h, w, c),
            lambda bi, ti: (bi, ti, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w, c), y.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(y_padded, w1, b1, w2, b2)
    return out[..., :orig_c] if orig_c != c else out
