"""int8 serving path: calibration, quantization, and quantized forward.

Measured on this chip (scratch/measure_lib differencing, bs64): XLA int8
convolutions sustain ~190-307 TOP/s at YOLOv3's residual-block shapes —
1.5-2x the bf16 conv rates (97-200 TF/s) — once per-dispatch tunnel noise is
cancelled.  (Round 1 concluded the opposite from dispatch-polluted timings;
see CLAUDE.md "TIMING METHODOLOGY".)  So the int8 path is built directly on
``lax.conv_general_dilated`` with int32 accumulation; XLA fuses the
dequant+bias+leaky+requant epilogues and the residual adds.

Scheme (standard post-training quantization, reference capability is the
fp32 net of reference darknet.py:167-231 — this is a TPU serving variant):

* weights: per-output-channel symmetric int8 (exact absmax scaling),
* activations: per-tensor static scales from a calibration pass (absmax of
  every conv's *output* tensor, recorded post-residual-add for res blocks),
* every interior conv consumes and produces int8; the epilogue does
  ``q_out = clip(round(leaky(acc * m + b)))`` with the requant folded into
  ``m = s_in * s_w / s_out`` and ``b = bias / s_out`` (leaky(0.1) is
  positively homogeneous, so folding through it is exact),
* residual adds happen in the fp32 epilogue domain: ``+ q_res * s_res/s_out``
  before rounding,
* route concats requantize both branches to a common scale,
* the three detection convs keep fp32 epilogues and bf16 outputs (logits
  feed decode; last-layer quantization error would hit box geometry
  directly).

Typical accuracy: detections match the bf16 path on dense scenes (see
tests/test_quantized_net.py); mAP parity is gated with the oracle tests.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from yolo_v3_tpu.models import darknet as D

_DN = ("NHWC", "HWIO", "NHWC")
LEAKY = D.LEAKY_SLOPE


# ---------------------------------------------------------------------------
# Calibration: absmax of every conv output (and the input image), keyed by
# the producing conv's path "backbone/stage2/res3/conv2" (post residual-add
# for res-block conv2s, i.e. the tensor as consumed downstream).
# ---------------------------------------------------------------------------

# Calibration quantile: 99.97% of activation mass inside the int8 range.
# Pure absmax wastes the 8-bit budget on a handful of outliers (activation
# absmax/mean ~ 10 here), costing ~2x the accumulated error; the epilogues
# clip, so saturating the tail is safe.
CALIB_Q = 0.9997


def _amax(x) -> jnp.ndarray:
    a = jnp.abs(x.astype(jnp.float32)).ravel()
    # quantile = sort: strided-subsample big tensors to <=2M elements (the
    # tail estimate is statistical anyway; full sorts of 300M-element
    # activations dominate calibration time otherwise)
    stride = max(a.shape[0] // (2 << 20), 1)
    if stride > 1:
        a = a[::stride]
    return jnp.quantile(a, CALIB_Q)


def calibrate_yolonet(folded: Dict, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Run the folded fp network on a calibration batch, recording per-tensor
    absmax.  Returns {path: absmax} (device scalars; np-ify to store)."""
    stats: Dict[str, jnp.ndarray] = {"image": _amax(x)}
    p = folded["backbone"]
    use_s2d = "s2d" in folded

    def cb(pp, path, x, stride=1, leaky=True):
        y = D._conv_bias_leaky(pp, x, stride=stride, leaky=leaky)
        stats[path] = _amax(y)
        return y

    if use_s2d:
        sp = folded["s2d"]
        xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
        xb = D._space_to_depth2(xp)
        stats["s2d/input"] = stats["image"]
        y = D._conv_s2d(sp["stem"], xb)
        stats["s2d/stem"] = _amax(y)
        y = D._conv_s2d(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
        stats["s2d/down0"] = _amax(y)
        r = D._conv_s2d(sp["res0_1"], y)
        stats["s2d/res0_1"] = _amax(r)
        r = D._conv_s2d(sp["res0_2"], r, padding=((1, 1), (1, 1)))
        y = y + r
        stats["s2d/res0_2"] = _amax(y)       # post-add, as consumed
        y = D._conv_s2d(sp["down1"], y, padding=((1, 0), (1, 0)))
        stats["s2d/down1"] = _amax(y)
        start_stage = 1
    else:
        y = cb(p["stem"], "backbone/stem", x)
        start_stage = 0

    routes = []
    for i in range(D._num_stages(p)):
        if i < start_stage:
            continue
        spp = p[f"stage{i}"]
        if not (use_s2d and i == 1):
            y = cb(spp["down"], f"backbone/stage{i}/down", y, stride=2)
        for b in range(D._stage_blocks(spp)):
            r = cb(spp[f"res{b}"]["conv1"], f"backbone/stage{i}/res{b}/conv1", y)
            r = D._conv_bias_leaky(spp[f"res{b}"]["conv2"], r)
            y = y + r
            stats[f"backbone/stage{i}/res{b}/conv2"] = _amax(y)  # post-add
        if i >= 2:
            routes.append(y)
    c3, c4, c5 = routes

    def head(hname, x):
        hp = folded[hname]
        y = x
        for i in range(6):
            y = cb(hp[f"conv{i}"], f"{hname}/conv{i}", y)
            if i == 4:
                branch = y
        det = D._conv_bias_leaky(hp["det"], y, leaky=False)
        return det, branch

    _, br0 = head("head0", c5)
    y = cb(folded["up0"]["conv"], "up0/conv", br0)
    y = jnp.concatenate([D.upsample2x_nearest(y), c4], axis=-1)
    stats["concat1"] = _amax(y)
    _, br1 = head("head1", y)
    y = cb(folded["up1"]["conv"], "up1/conv", br1)
    y = jnp.concatenate([D.upsample2x_nearest(y), c3], axis=-1)
    stats["concat2"] = _amax(y)
    head("head2", y)
    return stats


# ---------------------------------------------------------------------------
# Quantization
# ---------------------------------------------------------------------------

def _scale_of(stats, key) -> float:
    return float(max(np.asarray(stats[key], np.float32) / 127.0, 1e-8))


def _quant_w(w) -> Tuple[jnp.ndarray, np.ndarray]:
    w = np.asarray(w, np.float32)
    absmax = np.max(np.abs(w), axis=tuple(range(w.ndim - 1)))
    s = np.maximum(absmax / 127.0, 1e-12)
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return jnp.asarray(q), s.astype(np.float32)


def _qconv(p, s_in: float, s_out, leaky_unused=None) -> Dict:
    """Folded float conv {w, b} -> quantized {w int8, m f32[N], b f32[N]}.

    ``s_out=None`` keeps a float output: m = s_in*s_w, b = bias.
    """
    wq, sw = _quant_w(p["w"])
    b = np.asarray(p["b"], np.float32)
    if s_out is None:
        return {"w": wq, "m": jnp.asarray(s_in * sw), "b": jnp.asarray(b)}
    return {
        "w": wq,
        "m": jnp.asarray(s_in * sw / s_out),
        "b": jnp.asarray(b / s_out),
    }


# layout/gather primitives shared with the bf16 folded path
_stem4_weights = D._stem4_weights
_down0_4_weights = D._down0_4_weights
_space_to_depth4 = D._space_to_depth4


def _repack_s2d4_to_s2d2(y4: jnp.ndarray) -> jnp.ndarray:
    """Stem output [B, H/4, W/4, 16*c] (4x4 blocks, (dy,dx,c) order) ->
    [B, H/2, W/2, 4*c] (2x2 blocks) — the layout the s2d-domain down0
    expects.  A single int8 transpose (~88 MB round-trip at bs64/416)."""
    b, h, w, c16 = y4.shape
    c = c16 // 16
    # channel = ((2*ih+by)*4 + (2*jh+bx))*c + cc -> dims (ih, by, jh, bx, cc)
    x = y4.reshape(b, h, w, 2, 2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 5, 4, 6, 7)            # (B,I,ih,J,jh,by,bx,c)
    return x.reshape(b, 2 * h, 2 * w, 4 * c)


def quantize_yolonet(folded: Dict, stats: Dict[str, np.ndarray]) -> Dict:
    """Build the int8 serving tree from BN-folded float params + calibration
    stats.  The tree carries per-conv int8 weights/multipliers and the
    per-tensor activation scales the apply function needs."""
    q: Dict = {"scales": {}}
    sc = q["scales"]
    p = folded["backbone"]
    use_s2d = "s2d" in folded
    for k in stats:
        sc[k] = _scale_of(stats, k)
    sc["image"] = _scale_of(stats, "image")

    qb: Dict = {}
    if use_s2d:
        sp = folded["s2d"]
        qs: Dict = {}
        qs["stem"] = _qconv(sp["stem"], sc["image"], sc["s2d/stem"])
        # 4x4-domain stem (the fast entry) + its uint8-input variant.  Same
        # filters/scales as the 2x2 stem, so outputs are bit-identical.
        w4, b4 = _stem4_weights(p["stem"]["w"], p["stem"]["b"])
        w4q, s4w = _quant_w(w4)
        s_out = sc["s2d/stem"]
        qs["stem4"] = {
            "w": w4q,
            "m": jnp.asarray(sc["image"] * s4w / s_out),
            "b": jnp.asarray(b4 / s_out),
        }
        # uint8 images: feed (u8 - 128) as int8 with exact scale 1/255 and
        # fold the +128 zero-point through the conv into the bias:
        # x = (q+128)/255 everywhere incl. the -128 pad (= real 0), so
        # acc_x = (acc_q + 128 * sum(w_q)) / 255 per output channel.
        m_u8 = (1.0 / 255.0) * s4w / s_out
        zp = 128.0 * m_u8 * np.asarray(w4q, np.int32).sum((0, 1, 2))
        qs["stem4_u8"] = {
            "w": w4q,
            "m": jnp.asarray(m_u8),
            "b": jnp.asarray(b4 / s_out + zp),
        }
        qs["down0"] = _qconv(sp["down0"], sc["s2d/stem"], sc["s2d/down0"])
        # down0 gathered to consume the 4x4-block stem output directly
        # (skips the repack transpose); same original weights -> same
        # per-channel scales -> bit-identical to repack+down0.
        w0q, s0w = _quant_w(_down0_4_weights(p["stage0"]["down"]["w"]))
        qs["down0_4"] = {
            "w": w0q,
            "m": jnp.asarray(sc["s2d/stem"] * s0w / sc["s2d/down0"]),
            "b": jnp.asarray(
                np.tile(np.asarray(p["stage0"]["down"]["b"], np.float32), 4)
                / sc["s2d/down0"]),
        }
        qs["res0_1"] = _qconv(sp["res0_1"], sc["s2d/down0"], sc["s2d/res0_1"])
        qs["res0_2"] = _qconv(sp["res0_2"], sc["s2d/res0_1"], sc["s2d/res0_2"])
        qs["down1"] = _qconv(sp["down1"], sc["s2d/res0_2"], sc["s2d/down1"])
        q["s2d"] = qs
        prev = "s2d/down1"
        start_stage = 1
    else:
        qb["stem"] = _qconv(p["stem"], sc["image"], sc["backbone/stem"])
        prev = "backbone/stem"
        start_stage = 0

    route_keys = []
    for i in range(D._num_stages(p)):
        if i < start_stage:
            continue
        spp = p[f"stage{i}"]
        qst: Dict = {}
        if not (use_s2d and i == 1):
            key = f"backbone/stage{i}/down"
            qst["down"] = _qconv(spp["down"], sc[prev], sc[key])
            prev = key
        for b in range(D._stage_blocks(spp)):
            k1 = f"backbone/stage{i}/res{b}/conv1"
            k2 = f"backbone/stage{i}/res{b}/conv2"
            qst[f"res{b}"] = {
                "conv1": _qconv(spp[f"res{b}"]["conv1"], sc[prev], sc[k1]),
                "conv2": _qconv(spp[f"res{b}"]["conv2"], sc[k1], sc[k2]),
                # identity branch rescale into conv2's output domain
                "res_scale": sc[prev] / sc[k2],
            }
            prev = k2
        qb[f"stage{i}"] = qst
        if i >= 2:
            route_keys.append(prev)
    q["backbone"] = qb
    # scales of the three route tensors (c3, c4, c5), as float leaves — the
    # tree must stay jittable as a traced argument (no string leaves)
    q["route_scales"] = tuple(sc[k] for k in route_keys)

    def qhead(hname, in_key):
        hp = folded[hname]
        out: Dict = {}
        prev = in_key
        for i in range(6):
            key = f"{hname}/conv{i}"
            out[f"conv{i}"] = _qconv(hp[f"conv{i}"], sc[prev], sc[key])
            prev = key
        out["det"] = _qconv(hp["det"], sc[prev], None)   # float logits out
        return out

    k3, k4, k5 = route_keys
    q["head0"] = qhead("head0", k5)
    q["up0"] = {"conv": _qconv(folded["up0"]["conv"], sc["head0/conv4"],
                               sc["up0/conv"])}
    q["head1"] = qhead("head1", "concat1")
    q["up1"] = {"conv": _qconv(folded["up1"]["conv"], sc["head1/conv4"],
                               sc["up1/conv"])}
    q["head2"] = qhead("head2", "concat2")
    return q


# ---------------------------------------------------------------------------
# Quantized apply
# ---------------------------------------------------------------------------

def _conv_i8(qp, x_q, stride=1, padding=None, leaky=True,
             residual=None, res_scale=None, out_float=False):
    """int8 conv + fp32 epilogue.  Returns int8 (requantized) or bf16."""
    ks = qp["w"].shape[0]
    if padding is None:
        pad = (ks - 1) // 2
        padding = ((pad, pad), (pad, pad))
    acc = lax.conv_general_dilated(
        x_q, qp["w"], (stride, stride), padding,
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * qp["m"] + qp["b"]
    if leaky:
        y = jnp.where(y > 0, y, LEAKY * y)
    if residual is not None:
        y = y + residual.astype(jnp.float32) * res_scale
    if out_float:
        return y.astype(jnp.bfloat16)
    return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)


def _requant(x_q: jnp.ndarray, s_from: float, s_to: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(x_q.astype(jnp.float32) * (s_from / s_to)),
                    -127, 127).astype(jnp.int8)


def quantize_image(x: jnp.ndarray, s_image: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(x.astype(jnp.float32) / s_image),
                    -127, 127).astype(jnp.int8)


def _entry_s2d(q: Dict, x_q: jnp.ndarray, stem_key: str) -> jnp.ndarray:
    """int8 image -> stage1 input, all in the space-to-depth domain.

    ``stem4``/``stem4_u8`` run the stem as one [2,2,48,512] conv over 4x4
    blocks (full MXU lanes) and repack to the 2x2 layout; ``stem`` is the
    legacy 2x2-domain stem.  ``stem4_u8`` pads with -128 (= real 0 under the
    u8 zero-point-folded scheme)."""
    sc = q["scales"]
    sp = q["s2d"]
    pad_val = -128 if stem_key == "stem4_u8" else 0
    xp = jnp.pad(x_q, ((0, 0), (1, 3), (1, 3), (0, 0)),
                 constant_values=pad_val)
    if stem_key == "stem":
        xb = D._space_to_depth2(xp)
        y = _conv_i8(sp["stem"], xb, padding=((0, 0), (0, 0)))
        y = _conv_i8(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
    else:
        xb = _space_to_depth4(xp)
        y4 = _conv_i8(sp[stem_key], xb, padding=((0, 0), (0, 0)))
        if "down0_4" in sp:
            # down0 reads the 4x4-block stem output directly — no repack
            y = _conv_i8(sp["down0_4"], y4, padding=((1, 0), (1, 0)))
        else:
            y = _repack_s2d4_to_s2d2(y4)
            y = _conv_i8(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
    r = _conv_i8(sp["res0_1"], y, padding=((0, 0), (0, 0)))
    # the s2d res add: y and r are in different int8 domains; do the add
    # in conv's fp epilogue via residual
    r = _conv_i8(sp["res0_2"], r, padding=((1, 1), (1, 1)),
                 residual=y,
                 res_scale=sc["s2d/down0"] / sc["s2d/res0_2"])
    return _conv_i8(sp["down1"], r, padding=((1, 0), (1, 0)))


def apply_yolonet_quantized_u8(q: Dict, u8: jnp.ndarray):
    """int8 forward from a uint8 image (the serving-native feed): no float
    normalization, no quantize pass — ``u8 ^ 0x80`` reinterpreted as int8 IS
    the quantized image (scale 1/255, zero point folded into the stem bias).
    Reads 4x less HBM than the float entry and quantizes exactly on the u8
    grid.  Requires an s2d tree built by :func:`quantize_yolonet`."""
    x_q = lax.bitcast_convert_type(u8 ^ jnp.uint8(128), jnp.int8)
    y = _entry_s2d(q, x_q, "stem4_u8")
    return _yolonet_tail(q, y)


def apply_yolonet_quantized(q: Dict, x: jnp.ndarray):
    """int8 forward: float image in, 3 bf16 raw head outputs (same contract
    as :func:`darknet.apply_yolonet_folded`)."""
    sc = q["scales"]
    x_q = quantize_image(x, sc["image"])
    if "s2d" in q:
        stem_key = "stem4" if "stem4" in q["s2d"] else "stem"
        y = _entry_s2d(q, x_q, stem_key)
    else:
        y = _conv_i8(q["backbone"]["stem"], x_q)
    return _yolonet_tail(q, y)


def _yolonet_tail(q: Dict, y: jnp.ndarray):
    routes = []
    qb = q["backbone"]
    n_stages = sum(1 for k in qb if k.startswith("stage"))
    first = min(int(k[5:]) for k in qb if k.startswith("stage"))
    for i in range(first, first + n_stages):
        qst = qb[f"stage{i}"]
        if "down" in qst:
            y = _conv_i8(qst["down"], y, stride=2)
        b = 0
        while f"res{b}" in qst:
            rb = qst[f"res{b}"]
            r = _conv_i8(rb["conv1"], y)
            y = _conv_i8(rb["conv2"], r, residual=y, res_scale=rb["res_scale"])
            b += 1
        if i >= 2:
            routes.append(y)
    c3, c4, c5 = routes
    s_c3, s_c4, _ = q["route_scales"]

    def head(hq, x_q):
        y = x_q
        for i in range(6):
            y = _conv_i8(hq[f"conv{i}"], y)
            if i == 4:
                branch = y
        det = _conv_i8(hq["det"], y, leaky=False, out_float=True)
        return det, branch

    sc_ = q["scales"]
    det0, br0 = head(q["head0"], c5)
    y = _conv_i8(q["up0"]["conv"], br0)
    y = jnp.concatenate([
        _requant(D.upsample2x_nearest(y), sc_["up0/conv"], sc_["concat1"]),
        _requant(c4, s_c4, sc_["concat1"]),
    ], axis=-1)
    det1, br1 = head(q["head1"], y)
    y = _conv_i8(q["up1"]["conv"], br1)
    y = jnp.concatenate([
        _requant(D.upsample2x_nearest(y), sc_["up1/conv"], sc_["concat2"]),
        _requant(c3, s_c3, sc_["concat2"]),
    ], axis=-1)
    det2, _ = head(q["head2"], y)
    return det0, det1, det2


# ---------------------------------------------------------------------------
# Persistence: the quantized tree is the deployable serving artifact.  The
# reference ships fp32 .weights only and re-derives everything at load time;
# here calibration is a one-time step whose result (int8 weights + static
# activation scales) round-trips exactly through an npz, so a serving process
# needs neither the float net nor the calibration data.
# ---------------------------------------------------------------------------

QUANTIZED_FORMAT = "yolo_v3_tpu/quantized-v1"


def _flatten_q(node, parts, names, kinds, arrays):
    if isinstance(node, dict):
        for k in sorted(node):
            _flatten_q(node[k], parts + [k], names, kinds, arrays)
        return
    # leaf kinds: jnp/np array, python float (res_scale, scales/*), or a
    # tuple of floats (route_scales) — record the kind so load restores the
    # exact python type (float leaves must NOT come back as 0-d arrays: they
    # are jit-static in some callers and hash into the compile cache key)
    if isinstance(node, tuple):
        kind, arr = "tuple", np.asarray(node, np.float32)
    elif isinstance(node, (float, int)):
        kind, arr = "float", np.asarray(node, np.float32)
    else:
        kind, arr = "array", np.asarray(node)
    names.append(parts)
    kinds.append(kind)
    arrays.append(arr)


def save_quantized(q: Dict, path: str, meta: Dict = None) -> None:
    """Persist a quantized serving tree (:func:`build_quantized` output).

    Arrays are stored under positional keys with a JSON name table — the
    ``scales`` sub-dict's keys contain '/' so a path-joined flat layout would
    be ambiguous.  Round-trip is exact: int8 weights, f32 multipliers, and
    the float scale leaves are stored verbatim.
    """
    import json

    names, kinds, arrays = [], [], []
    _flatten_q(jax.device_get(q), [], names, kinds, arrays)
    header = {"format": QUANTIZED_FORMAT, "names": names, "kinds": kinds,
              "meta": meta or {}}
    flat = {f"a{i}": a for i, a in enumerate(arrays)}
    flat["__quantized__"] = np.frombuffer(
        json.dumps(header).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def is_quantized_file(path: str) -> bool:
    """True if ``path`` is an npz written by :func:`save_quantized`."""
    npz = path if path.endswith(".npz") else path + ".npz"
    try:
        with np.load(npz, allow_pickle=False) as z:
            return "__quantized__" in z.files
    except (OSError, ValueError):
        return False


def load_quantized(path: str) -> Dict:
    """Load a quantized serving tree saved by :func:`save_quantized`."""
    import json

    npz = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz, allow_pickle=False) as z:
        if "__quantized__" not in z.files:
            raise ValueError(f"{path}: not a quantized serving artifact")
        header = json.loads(bytes(z["__quantized__"].tolist()).decode())
        if header.get("format") != QUANTIZED_FORMAT:
            raise ValueError(
                f"{path}: unknown quantized format {header.get('format')!r}")
        arrays = [z[f"a{i}"] for i in range(len(header["names"]))]
    q: Dict = {}
    for parts, kind, arr in zip(header["names"], header["kinds"], arrays):
        node = q
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        if kind == "tuple":
            node[parts[-1]] = tuple(float(v) for v in arr)
        elif kind == "float":
            node[parts[-1]] = float(arr)
        else:
            node[parts[-1]] = jnp.asarray(arr)
    return q


def build_quantized(params, state, calib_x: jnp.ndarray,
                    space_to_depth: bool = True) -> Dict:
    """fold BN (+ s2d remap) -> calibrate -> quantize, in one call."""
    folded = D.fold_batchnorm(params, state)
    if space_to_depth:
        folded = D.fold_space_to_depth(folded)
    # params as traced args (NOT closure constants: baking ~60 MB of weights
    # into the program as literals slows XLA compilation dramatically)
    stats = jax.jit(calibrate_yolonet)(folded, calib_x)
    stats = {k: np.asarray(v) for k, v in stats.items()}
    # one bulk device->host transfer: per-weight np.asarray readbacks in
    # quantize_yolonet would otherwise each pay a blocking tunnel RTT
    folded = jax.device_get(folded)
    return quantize_yolonet(folded, stats)


# ---------------------------------------------------------------------------
# Standalone building blocks: the minimal per-layer quantization API.
#
# The serving path above pre-quantizes everything at load time; these are the
# same primitives exposed one layer at a time for experiments and tests
# (e.g. quantizing a single conv against its float twin).  Formerly
# `yolo_v3_tpu.ops.quantize` — folded here so ONE module owns the int8
# scheme (round-4 advisor: the split left a stale "integration is planned"
# docstring and a duplicated conv helper).
# ---------------------------------------------------------------------------

def quantize_weights_per_channel(w) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[kh, kw, cin, cout] float -> (int8 weights, fp32 scale[cout]).
    Device-array variant of the load-time `_quant_w` (same math)."""
    w = jnp.asarray(w, jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -127, 127)
    return q.astype(jnp.int8), scale


def activation_scale(x_absmax) -> jnp.ndarray:
    """Per-tensor activation scale from a calibrated abs-max."""
    return jnp.maximum(jnp.asarray(x_absmax, jnp.float32) / 127.0, 1e-12)


def quantize_activation(x: jnp.ndarray, scale) -> jnp.ndarray:
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8)


def conv_int8_bias_leaky(
    x_q: jnp.ndarray,        # int8 [B, H, W, Cin]
    w_q: jnp.ndarray,        # int8 [kh, kw, Cin, Cout]
    x_scale,                 # fp32 scalar
    w_scale: jnp.ndarray,    # fp32 [Cout]
    b: jnp.ndarray,          # fp32 [Cout]
    stride: int = 1,
    leaky: bool = True,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """int8 conv, int32 MXU accumulation, fp32 dequant/bias/leaky epilogue —
    the float-out single-layer form of `_conv_i8` (which requantizes to int8
    for the serving cascade)."""
    ks = w_q.shape[0]
    pad = (ks - 1) // 2
    acc = lax.conv_general_dilated(
        x_q, w_q,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (x_scale * w_scale) + b.astype(jnp.float32)
    if leaky:
        y = jnp.where(y > 0, y, LEAKY * y)
    return y.astype(out_dtype)


def quantized_block(
    x: jnp.ndarray,
    p: Dict[str, jnp.ndarray],   # folded conv {"w", "b"} in float
    x_absmax,
    stride: int = 1,
    leaky: bool = True,
) -> jnp.ndarray:
    """Quantize activation + weights, run the int8 conv: a drop-in int8 twin
    of one `darknet._conv_bias_leaky` block."""
    w_q, w_s = quantize_weights_per_channel(p["w"])
    x_s = activation_scale(x_absmax)
    x_q = quantize_activation(x, x_s)
    return conv_int8_bias_leaky(x_q, w_q, x_s, w_s, p["b"], stride, leaky,
                                out_dtype=x.dtype)


def calibrate_absmax(samples: jnp.ndarray) -> jnp.ndarray:
    """abs-max over a calibration batch (per tensor)."""
    return jnp.max(jnp.abs(samples))
