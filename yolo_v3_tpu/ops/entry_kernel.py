"""Fused entry megakernel: stem..stage1-downsample in ONE Pallas kernel.

The network entry (stem 3->32 @416, down0 32->64 @208, res block, down1
64->128 @104 — reference darknet.py:68-104 stages 0-1) is purely
HBM-bandwidth-bound on this chip: XLA materializes ~1.6 GB of intermediates
per bs64 batch (the 354 MB stem output alone is written then re-read), which
at the measured ~172 GB/s floor costs ~8 of the 21 ms int8 forward.  XLA
never fuses across convolutions, so this kernel computes a full horizontal
band of the whole entry chain per grid step with every intermediate in
VMEM: the input is read once and only the final [104, 104, 128] tensor is
written — ~40x less HBM traffic.

Numerics: identical to the quantized s2d entry (models/quantized.py): the
same space-to-depth-remapped int8 weights (qtree["s2d"]), the same
scale/bias/leaky/requant epilogues, the same residual domain.  Out-of-image
halo rows are explicitly zero-masked to reproduce each conv's zero padding.

Band geometry, in global row coordinates (out band = [T, T+R), T = t*R):

    down1 2x2 p(1,0):  needs res rows  [T-1, T+R)            R+1 rows
    res0_2 3x3 p1:     needs r1 rows   [T-2, T+R+1)          R+3 rows
    res0_1 1x1 / d0:   same rows                             R+3 rows
    down0 3x3 s2 p1:   needs stem rows [2(T-2)-1, 2(T+R)+2)  2R+7 rows
    stem 3x3 VALID:    needs xb rows   [2T-5, 2T+2R+4)       2R+9 rows

The wrapper pre-pads xb with 5 zero rows on top so every window start is
the non-negative ``2*T``; leading-dim slices of a rank-3 block are untiled,
so the overlapping halo windows are legal DMAs.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY = 0.1


def _epi(acc, m, b, *, leaky=True, residual=None, res_scale=None):
    """acc [rows, cols, N] int32 -> int8; m/b broadcast over the last dim."""
    y = acc.astype(jnp.float32) * m.reshape(1, 1, -1) + b.reshape(1, 1, -1)
    if leaky:
        y = jnp.where(y > 0, y, LEAKY * y)
    if residual is not None:
        y = y + residual.astype(jnp.float32) * res_scale
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _dot3(x, w):
    """[rows, cols, K] @ [K, N] -> [rows, cols, N] int32 (no value merges —
    3D dot_general is Mosaic-supported, reshape merges are relayouts)."""
    return jax.lax.dot_general(
        x, w, (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def _phase2(x, axis: int):
    """Split ``axis`` into (even, odd) polyphase components (one relayout
    each, shared by every stride-2 tap)."""
    n = x.shape[axis] // 2
    sl = [slice(None)] * x.ndim
    sl[axis] = slice(0, 2 * n)
    x = x[tuple(sl)]
    shape = list(x.shape)
    shape[axis:axis + 1] = [n, 2]
    x = x.reshape(shape)
    se = [slice(None)] * x.ndim
    so = [slice(None)] * x.ndim
    se[axis + 1], so[axis + 1] = 0, 1
    return x[tuple(se)], x[tuple(so)]


def _conv_band(x, w, m, b, *, stride=1, leaky=True, residual=None,
               res_scale=None, out_rows: int, out_cols: int):
    """kxk conv over a VMEM band value x [rows, cols, cin] that already
    contains all halo rows/cols.  int32 accumulation, int8 out."""
    kh, kw, cin, cout = w.shape
    acc = jnp.zeros((out_rows, out_cols, cout), jnp.int32)
    if stride == 1:
        for dy in range(kh):
            for dx in range(kw):
                acc = acc + _dot3(x[dy:dy + out_rows, dx:dx + out_cols, :],
                                  w[dy, dx])
    else:
        # polyphase: tap (dy, dx) reads rows 2j+dy / cols 2c+dx — i.e. the
        # (dy%2, dx%2) phase at offset (dy//2, dx//2)
        pad_r = max(0, (kh - 1) + 2 * out_rows - x.shape[0])
        pad_c = max(0, (kw - 1) + 2 * out_cols - x.shape[1])
        if pad_r or pad_c:
            x = jnp.pad(x, ((0, pad_r), (0, pad_c), (0, 0)))
        ev, od = _phase2(x, 0)
        phases = {}
        phases[(0, 0)], phases[(0, 1)] = _phase2(ev, 1)
        phases[(1, 0)], phases[(1, 1)] = _phase2(od, 1)
        for dy in range(kh):
            for dx in range(kw):
                ph = phases[(dy % 2, dx % 2)]
                oy, ox = dy // 2, dx // 2
                acc = acc + _dot3(
                    ph[oy:oy + out_rows, ox:ox + out_cols, :], w[dy, dx]
                )
    out = _epi(acc, m, b, leaky=leaky, residual=residual,
               res_scale=res_scale)
    return out


def _mask_rows(x, start_global, valid_lo: int, valid_hi: int):
    """Zero rows of band x [rows, cols, c] whose global index is outside
    [valid_lo, valid_hi) — reproduces conv zero padding for halo rows."""
    g = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], 1, 1), 0) + start_global
    ok = (g >= valid_lo) & (g < valid_hi)
    return jnp.where(ok, x, jnp.zeros_like(x))


def _entry_kernel(xb_hbm, w_stem, m_stem, b_stem, w_d0, m_d0, b_d0,
                  w_r1, m_r1, b_r1, w_r2, m_r2, b_r2, w_d1, m_d1, b_d1,
                  o_ref, win, sem, *, band: int, n_bands: int,
                  res_scale: float, w104: int, xb_cols: int, cin: int):
    bi = pl.program_id(0)
    t = pl.program_id(1)
    n_total = pl.num_programs(0) * pl.num_programs(1)
    step = bi * n_bands + t
    w208 = 2 * w104
    win_rows = 2 * band + 9

    def start(slot, bi_, ti_):
        return pltpu.make_async_copy(
            xb_hbm.at[bi_, pl.ds(2 * band * ti_, win_rows)], win.at[slot],
            sem.at[slot],
        )

    @pl.when(step == 0)
    def _():
        start(0, 0, 0).start()

    start(step % 2, bi, t).wait()

    @pl.when(step + 1 < n_total)
    def _():
        nstep = step + 1
        start((nstep) % 2, nstep // n_bands, nstep % n_bands).start()

    T = t * band                                   # global out-row base
    packed = win[step % 2]                         # [2band+9, 16, cols_p]
    xb = jnp.transpose(packed, (0, 2, 1))          # [2band+9, cols_p, 16]
    # xb window covers global xb rows [2T-5, 2T+2band+4); xb's own borders
    # (rows 0 and 209 of the s2d-padded image) are real data, rows beyond
    # [0, 210) are the wrapper's zero pad — nothing to mask here.

    # stem' VALID 3x3, out = stem global rows [2T-5, 2T+2band+2), 2band+7
    stem_rows = 2 * band + 7
    y = _conv_band(xb, w_stem[:], m_stem[:], b_stem[:],
                   out_rows=stem_rows, out_cols=w208)
    y = _mask_rows(y, 2 * T - 5, 0, 2 * w104)      # stem valid rows [0,208)

    # down0' 3x3 s2 p1: out = d0 global rows [T-2, T+band+1), band+3 rows.
    # d0 global r taps stem global [2r-1, 2r+2) = stem local [2j, 2j+3)
    # for j = r-(T-2); horizontal pad 1.
    yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0)))
    d0_rows = band + 3
    d0 = _conv_band(yp, w_d0[:], m_d0[:], b_d0[:], stride=2,
                    out_rows=d0_rows, out_cols=w104)
    d0 = _mask_rows(d0, T - 2, 0, w104)

    # res0_1 1x1 on the same rows
    r1 = _conv_band(d0, w_r1[:], m_r1[:], b_r1[:],
                    out_rows=d0_rows, out_cols=w104)
    r1 = _mask_rows(r1, T - 2, 0, w104)

    # res0_2 3x3 p1 + residual: out = res global rows [T-1, T+band), band+1.
    # res global r taps r1 local [j, j+3) for j = r-(T-1)... r1 band starts
    # at T-2, so local tap start = (r-1)-(T-2) = j, j = r-(T-1).  ✓
    r1p = jnp.pad(r1, ((0, 0), (1, 1), (0, 0)))
    res = _conv_band(r1p, w_r2[:], m_r2[:], b_r2[:],
                     residual=d0[1:band + 2, :, :],
                     res_scale=res_scale,
                     out_rows=band + 1, out_cols=w104)
    res = _mask_rows(res, T - 1, 0, w104)

    # down1' 2x2 p(1,0): out global o in [T, T+band) taps res global
    # [o-1, o+1) = res local [j, j+2), j = o-T.  Horizontal left pad 1.
    resp = jnp.pad(res, ((0, 0), (1, 0), (0, 0)))
    out = _conv_band(resp, w_d1[:], m_d1[:], b_d1[:],
                     out_rows=band, out_cols=w104)
    o_ref[0] = out


def fused_entry(
    xb: jnp.ndarray,         # [B, 210, 210, 12] int8 (s2d of the image)
    qs2d: Dict,              # qtree["s2d"] quantized conv params
    res_scale: float,
    band: int = 26,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the fused entry; returns [B, 104, 104, 128] int8."""
    bsz, xb_rows, xb_cols, cin = xb.shape
    h104 = (xb_rows - 2) // 2
    w104 = (xb_cols - 2) // 2
    assert h104 % band == 0, (h104, band)
    n_bands = h104 // band

    win_rows = 2 * band + 9
    # top pad 5 (window start 2T maps to global 2T-5); bottom pad so the
    # last window [2(h104-band), +win_rows) stays in-bounds.
    need = 2 * band * (n_bands - 1) + win_rows
    xb = jnp.pad(xb, ((0, 0), (5, max(0, need - xb_rows - 5)),
                      (0, 0), (0, 0)))
    # Mosaic constraints: DMA'd block dims must align to the (8, 128)
    # tiling, and value merges/splits need 8-aligned middle dims — (210,
    # 12) fails both.  Pack as [B, rows, ch->16, cols->128k]: the window
    # DMA is tile-aligned, and the kernel transposes back (transpose IS
    # supported) to [rows, cols, 16] whose slices/merges are all 8-aligned.
    cin_p = 16
    cols_p = -xb_cols % 128 + xb_cols
    xbf = jnp.pad(xb, ((0, 0), (0, 0), (0, cols_p - xb_cols),
                       (0, cin_p - cin)))
    xbf = jnp.transpose(xbf, (0, 1, 3, 2))   # [B, rows, 16, cols_p]

    args = []
    specs = [pl.BlockSpec(memory_space=pltpu.ANY)]
    for name in ("stem", "down0", "res0_1", "res0_2", "down1"):
        p = qs2d[name]
        w = p["w"]
        if w.ndim == 2:
            w = w.reshape(1, 1, *w.shape)
        if name == "stem":
            w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_p - cin), (0, 0)))
        args += [w, p["m"].reshape(1, -1), p["b"].reshape(1, -1)]
        specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

    kernel = functools.partial(
        _entry_kernel, band=band, n_bands=n_bands, res_scale=res_scale,
        w104=w104, xb_cols=xb_cols, cin=cin,
    )
    cout = qs2d["down1"]["w"].shape[-1]
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_bands),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, band, w104, cout),
                               lambda bi, t: (bi, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h104, w104, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((2, win_rows, cin_p, cols_p), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xbf, *args)
