"""YOLOv3 model core: Darknet-53 backbone + 3-scale detection heads.

TPU-native re-design of the reference modules (reference darknet.py:27-231):

* **Functional**: parameters and BatchNorm running statistics are explicit
  pytrees threaded through pure ``apply`` functions — no mutable modules, no
  ``cachedOutDict`` (the reference caches route tensors in a dict because it
  iterates an ``nn.ModuleList``, darknet.py:83-100; here routing is just
  returning the skip tensors).
* **NHWC + HWIO**: the natural TPU layout; convolutions lower straight onto
  the MXU.
* **Static shapes, no Python control flow on traced values**: the whole
  forward is one XLA computation.
* Exact convolution geometry parity with the reference: explicit symmetric
  padding ``(ks-1)//2`` (torch 'SAME', darknet.py:34-37), stride-2 downsample
  convs, LeakyReLU(0.1), BatchNorm eps 1e-5 / momentum 0.1 (torch defaults).

For inference, ``fold_batchnorm`` folds BN into conv weights + bias so each
block becomes conv+bias+leaky — one MXU op and one fused VPU epilogue.
"""

from __future__ import annotations

import math
import threading
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]
State = Dict[str, Any]

# Residual-block counts of the 5 darknet-53 stages (reference darknet.py:179).
DARKNET53_BLOCKS: Tuple[int, ...] = (1, 2, 8, 8, 4)

LEAKY_SLOPE = 0.1
BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch BatchNorm2d default: new = (1-m)*old + m*batch
# Trace-time override used by recalibrate_bn (BN re-estimation); None = use
# BN_MOMENTUM.  A module global rather than a threaded argument because it
# would have to pass through every apply_* signature for one maintenance-
# time utility.
_BN_MOMENTUM_OVERRIDE = None
# Serializes the override window (see recalibrate_bn); held only across the
# single AOT trace, never across execution.
_BN_OVERRIDE_LOCK = threading.Lock()


def _bn_momentum() -> float:
    return BN_MOMENTUM if _BN_MOMENTUM_OVERRIDE is None else _BN_MOMENTUM_OVERRIDE

_DN = ("NHWC", "HWIO", "NHWC")


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------

def _init_conv(key, ks: int, cin: int, cout: int, dtype=jnp.float32):
    """Kaiming-uniform fan-in init, matching torch Conv2d's default scale."""
    fan_in = cin * ks * ks
    bound = math.sqrt(1.0 / fan_in)
    return jax.random.uniform(key, (ks, ks, cin, cout), dtype, -bound, bound)


def _init_cb(key, ks: int, cin: int, cout: int, dtype=jnp.float32):
    """conv + batchnorm block params/state (reference conv_bn_relu,
    darknet.py:27-44: conv bias off when BN on)."""
    p = {
        "w": _init_conv(key, ks, cin, cout, dtype),
        "bn": {
            "scale": jnp.ones((cout,), dtype),
            "bias": jnp.zeros((cout,), dtype),
        },
    }
    s = {
        "mean": jnp.zeros((cout,), dtype),
        "var": jnp.ones((cout,), dtype),
    }
    return p, s


def _init_bias_conv(key, ks: int, cin: int, cout: int, dtype=jnp.float32):
    """Final detection conv: bias on, no BN (reference darknet.py:118)."""
    kw, kb = jax.random.split(key)
    fan_in = cin * ks * ks
    bound = math.sqrt(1.0 / fan_in)
    return {
        "w": _init_conv(kw, ks, cin, cout, dtype),
        "b": jax.random.uniform(kb, (cout,), dtype, -bound, bound),
    }


def init_backbone(
    key, dtype=jnp.float32, blocks: Tuple[int, ...] = DARKNET53_BLOCKS
) -> Tuple[Params, State]:
    """Darknet-53: stem conv + 5 stages of [stride-2 conv, N residual blocks]
    (reference Darknet/make_res_stack, darknet.py:68-104).  ``blocks``
    overrides the per-stage residual counts (e.g. (1,1,1,1,1) for a tiny
    test fixture); stage/channel structure is unchanged."""
    params: Params = {}
    state: State = {}
    keys = jax.random.split(key, 2 + len(blocks))

    params["stem"], state["stem"] = _init_cb(keys[0], 3, 3, 32, dtype)
    nin = 32
    for i, nblk in enumerate(blocks):
        skey = jax.random.split(keys[i + 1], 1 + 2 * nblk)
        stage_p: Params = {}
        stage_s: State = {}
        stage_p["down"], stage_s["down"] = _init_cb(skey[0], 3, nin, nin * 2, dtype)
        nout = nin * 2
        for b in range(nblk):
            # 1x1 bottleneck to nout//2 then 3x3 back to nout, identity add
            # (reference res_layer, darknet.py:46-53).
            c1, s1 = _init_cb(skey[1 + 2 * b], 1, nout, nout // 2, dtype)
            c2, s2 = _init_cb(skey[2 + 2 * b], 3, nout // 2, nout, dtype)
            stage_p[f"res{b}"] = {"conv1": c1, "conv2": c2}
            stage_s[f"res{b}"] = {"conv1": s1, "conv2": s2}
        params[f"stage{i}"] = stage_p
        state[f"stage{i}"] = stage_s
        nin = nout
    return params, state


def init_head(key, cin: int, nfilter: int, num_classes: int, dtype=jnp.float32):
    """Detection head: 3 alternating 1x1/3x3 conv pairs + final 1x1 det conv
    to (num_classes+5)*3 channels (reference PreDetectionConvGroup,
    darknet.py:107-127)."""
    keys = jax.random.split(key, 7)
    params: Params = {}
    state: State = {}
    nin = cin
    for i in range(3):
        params[f"conv{2*i}"], state[f"conv{2*i}"] = _init_cb(keys[2 * i], 1, nin, nfilter, dtype)
        params[f"conv{2*i+1}"], state[f"conv{2*i+1}"] = _init_cb(
            keys[2 * i + 1], 3, nfilter, nfilter * 2, dtype
        )
        nin = nfilter * 2
    params["det"] = _init_bias_conv(keys[6], 1, nin, (num_classes + 5) * 3, dtype)
    return params, state


def init_yolonet(
    key,
    num_classes: int = 80,
    dtype=jnp.float32,
    blocks: Tuple[int, ...] = DARKNET53_BLOCKS,
) -> Tuple[Params, State]:
    """Full 3-scale YOLOv3 (reference YoloNet, darknet.py:167-196).

    Head routing: head0 (stride 32) branches after its 5th conv; that branch
    is 1x1-reduced + 2x-upsampled and concatenated with the backbone's c4
    (cfg layer 61) to feed head1, and likewise with c3 (cfg 36) for head2
    (reference darknet.py:180-194, 204-223).
    """
    k = jax.random.split(key, 6)
    params: Params = {}
    state: State = {}
    params["backbone"], state["backbone"] = init_backbone(k[0], dtype, blocks)
    params["head0"], state["head0"] = init_head(k[1], 1024, 512, num_classes, dtype)
    params["up0"], state["up0"] = {}, {}
    params["up0"]["conv"], state["up0"]["conv"] = _init_cb(k[2], 1, 512, 256, dtype)
    params["head1"], state["head1"] = init_head(k[3], 768, 256, num_classes, dtype)
    params["up1"], state["up1"] = {}, {}
    params["up1"]["conv"], state["up1"]["conv"] = _init_cb(k[4], 1, 256, 128, dtype)
    params["head2"], state["head2"] = init_head(k[5], 384, 128, num_classes, dtype)
    return params, state


# Eagerly, the ~380 small init ops each pay this environment's 30-70 ms
# per-dispatch tunnel RTT (minutes of wall clock for one init); as one jitted
# program it is a single dispatch.  On the CPU backend (the test mesh) the
# trade inverts: eager ops are free while each distinct (num_classes,
# blocks, dtype) signature costs a ~20-60 s XLA CPU compile — so jit only
# off-CPU.
_init_yolonet_eager = init_yolonet
_init_yolonet_jit = jax.jit(
    init_yolonet, static_argnames=("num_classes", "dtype", "blocks")
)


def init_yolonet(key, num_classes: int = 80, dtype=jnp.float32,
                 blocks: Tuple[int, ...] = DARKNET53_BLOCKS):
    fn = (_init_yolonet_eager if jax.default_backend() == "cpu"
          else _init_yolonet_jit)
    return fn(key, num_classes=num_classes, dtype=dtype, blocks=blocks)


init_yolonet.__doc__ = _init_yolonet_eager.__doc__


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _conv(x, w, stride: int, f32_out: bool = True):
    """'SAME' conv.  ``f32_out=False`` keeps the input dtype (MXU still
    accumulates fp32 for bf16 operands) — required on the training path so
    the conv transpose sees matching dtypes under mixed precision; the
    inference path keeps the fp32 epilogue."""
    ks = w.shape[0]
    pad = (ks - 1) // 2
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=_DN,
        preferred_element_type=jnp.float32 if f32_out else None,
    )


def conv_bn_leaky(
    p: Params,
    s: State,
    x: jnp.ndarray,
    stride: int = 1,
    training: bool = False,
) -> Tuple[jnp.ndarray, State]:
    """'SAME' conv (bias-less) + BatchNorm + LeakyReLU(0.1)
    (reference conv_bn_relu.forward, darknet.py:43-44).  BN math runs in
    fp32 regardless of compute dtype."""
    y = _conv(x, p["w"], stride, f32_out=False).astype(jnp.float32)
    if training:
        mean = jnp.mean(y, axis=(0, 1, 2))
        var = jnp.var(y, axis=(0, 1, 2))
        n = y.shape[0] * y.shape[1] * y.shape[2]
        # torch tracks *unbiased* variance in running stats.  Under the
        # recalibration override the biased variance is stored instead: the
        # goal there is eval-mode == train-mode cascade exactly, and train
        # mode normalizes with the biased variance (at tiny n the n/(n-1)
        # factor is a real skew, e.g. 2x at a 1x1 grid with batch 2).
        unbiased = (var * (n / max(n - 1, 1))
                    if _BN_MOMENTUM_OVERRIDE is None else var)
        m = _bn_momentum()
        new_s = {
            "mean": (1 - m) * s["mean"] + m * mean,
            "var": (1 - m) * s["var"] + m * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = lax.rsqrt(var + BN_EPS) * p["bn"]["scale"]
    y = (y - mean) * inv + p["bn"]["bias"]
    y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    return y.astype(x.dtype), new_s


def _res_block(p, s, x, training):
    y, s1 = conv_bn_leaky(p["conv1"], s["conv1"], x, 1, training)
    y, s2 = conv_bn_leaky(p["conv2"], s["conv2"], y, 1, training)
    return x + y, {"conv1": s1, "conv2": s2}


def _stage_blocks(stage_params: Params) -> int:
    """Residual-block count of a backbone stage, read off the pytree — so
    apply functions work for any ``blocks`` override without extra args."""
    return sum(1 for k in stage_params if k.startswith("res"))


def _num_stages(backbone_params: Params) -> int:
    return sum(1 for k in backbone_params if k.startswith("stage"))


def apply_backbone(
    params: Params, state: State, x: jnp.ndarray, training: bool = False,
    s2d_entry: bool = False,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], State]:
    """Run Darknet-53; return the three route tensors (c3, c4, c5) at strides
    (8, 16, 32) — the functional replacement for cached cfg layers 36/61 and
    the final output (reference darknet.py:83-88, 180-181).

    ``s2d_entry=True`` computes stem + stage0 + stage1.down in the 2x2
    space-to-depth domain (``apply_s2d_entry_train``) — same numbers, full
    TPU lanes on the tiny-channel entry convs."""
    new_state: State = {}
    routes: List[jnp.ndarray] = []
    start_stage = 0
    if s2d_entry:
        assert _stage_blocks(params["stage0"]) == 1, \
            "s2d entry covers exactly stage0's single residual block"
        y, entry_state = apply_s2d_entry_train(params, state, x, training)
        new_state["stem"] = entry_state["stem"]
        new_state["stage0"] = entry_state["stage0"]
        start_stage = 1
    else:
        y, new_state["stem"] = conv_bn_leaky(
            params["stem"], state["stem"], x, 1, training)
    for i in range(start_stage, _num_stages(params)):
        sp, ss = params[f"stage{i}"], state[f"stage{i}"]
        ns: State = {}
        if s2d_entry and i == 1:
            ns["down"] = entry_state["stage1_down"]  # computed in the entry
        else:
            y, ns["down"] = conv_bn_leaky(sp["down"], ss["down"], y, 2, training)
        for b in range(_stage_blocks(sp)):
            y, ns[f"res{b}"] = _res_block(sp[f"res{b}"], ss[f"res{b}"], y, training)
        new_state[f"stage{i}"] = ns
        if i >= 2:
            routes.append(y)  # stages 2,3,4 -> c3, c4, c5
    c3, c4, c5 = routes
    return (c3, c4, c5), new_state


def apply_head(
    params: Params, state: State, x: jnp.ndarray, training: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, State]:
    """Detection head; returns (raw_det [B,H,W,3*(5+C)], branch).

    ``branch`` is the output of the 5th conv — the reference's cached ``-3``
    route feeding the upsample path (darknet.py:185, 208).
    """
    new_state: State = {}
    y = x
    for i in range(6):
        y, new_state[f"conv{i}"] = conv_bn_leaky(
            params[f"conv{i}"], state[f"conv{i}"], y, 1, training
        )
        if i == 4:
            branch = y
    det = _conv(y, params["det"]["w"], 1, f32_out=False) + params["det"]["b"]
    return det.astype(x.dtype), branch, new_state


def upsample2x_nearest(x: jnp.ndarray) -> jnp.ndarray:
    """2x nearest-neighbour upsample (reference UpsampleGroup's
    F.interpolate, darknet.py:161) as pure repeats — XLA fuses these."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def apply_yolonet(
    params: Params,
    state: State,
    x: jnp.ndarray,
    training: bool = False,
    s2d_entry: bool = False,
) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], State]:
    """Full forward: NHWC image batch -> 3 raw head outputs, coarse first
    ([B,H/32,W/32,3*(5+C)], [B,H/16,...], [B,H/8,...]) + new BN state
    (reference YoloNet.forward, darknet.py:198-231; decode/loss are separate
    ops here so the backbone stays a single fused XLA computation).
    """
    new_state: State = {}
    (c3, c4, c5), new_state["backbone"] = apply_backbone(
        params["backbone"], state["backbone"], x, training,
        s2d_entry=s2d_entry,
    )

    det0, br0, new_state["head0"] = apply_head(params["head0"], state["head0"], c5, training)

    new_state["up0"] = {}
    y, new_state["up0"]["conv"] = conv_bn_leaky(
        params["up0"]["conv"], state["up0"]["conv"], br0, 1, training
    )
    y = jnp.concatenate([upsample2x_nearest(y), c4], axis=-1)
    det1, br1, new_state["head1"] = apply_head(params["head1"], state["head1"], y, training)

    new_state["up1"] = {}
    y, new_state["up1"]["conv"] = conv_bn_leaky(
        params["up1"]["conv"], state["up1"]["conv"], br1, 1, training
    )
    y = jnp.concatenate([upsample2x_nearest(y), c3], axis=-1)
    det2, _, new_state["head2"] = apply_head(params["head2"], state["head2"], y, training)

    return (det0, det1, det2), new_state


def recalibrate_bn(params: Params, state: State, batches) -> State:
    """BN re-estimation: replace running statistics with the average batch
    statistics of ``batches`` (an array or an iterable of [B,H,W,3] arrays),
    measured in train-mode cascade.

    Running stats updated with momentum 0.1 lag the activation distribution
    whenever training is short or the loss is still moving fast (e.g. a
    few-hundred-step fine-tune/overfit run: conf logits keep growing every
    step, so the EMA never catches up and eval-mode inference diverges from
    train-mode behavior).  The fix is standard: one pass over representative
    data, writing the measured batch stats instead of EMA-ing them — the
    cumulative-moving-average momentum 1/i makes the result the exact mean
    of the per-batch statistics.  The reference never needs this because its
    published runs train for >500k batches (reference README.md:111-120);
    short custom-data runs (custom_data_train.ipynb) inherit torch's same
    lag, so this is a deliberate capability addition, not a parity delta.
    """
    global _BN_MOMENTUM_OVERRIDE
    if hasattr(batches, "shape"):
        batches = [batches]
    # Materialize BEFORE opening the override window: the override is a
    # module global read at trace time, so any unrelated BN-using function
    # first-traced while it is set would bake momentum-1.0 semantics into
    # its jit cache permanently.  The window is narrowed to ONE AOT trace
    # (`.lower()` below): compilation and every batch's execution happen
    # with the override already cleared, and a non-blocking lock makes a
    # concurrent recalibrate fail loudly instead of racing the global
    # (round-4 advisor finding).
    batches = [jnp.asarray(x) for x in batches]
    shapes = {tuple(x.shape) for x in batches}
    if len(shapes) != 1:
        raise ValueError(
            f"recalibrate_bn batches must share one shape, got {shapes}"
        )
    if not _BN_OVERRIDE_LOCK.acquire(blocking=False):
        raise RuntimeError(
            "recalibrate_bn is not reentrant: another thread holds the "
            "BN-momentum override window"
        )
    # momentum 1.0 makes the returned state the batch statistics exactly;
    # averaging those per-batch states gives the mean batch stats.  One
    # traced program regardless of batch count (a per-batch 1/i momentum
    # would retrace per step — a compile per batch on the chip).
    try:
        _BN_MOMENTUM_OVERRIDE = 1.0
        lowered = jax.jit(
            lambda p, s, x: apply_yolonet(p, s, x, training=True)[1]
        ).lower(params, state, batches[0])
    finally:
        _BN_MOMENTUM_OVERRIDE = None
        _BN_OVERRIDE_LOCK.release()
    measure = lowered.compile()
    states = [measure(params, state, x) for x in batches]
    if len(states) == 1:
        return states[0]
    return jax.tree.map(lambda *xs: sum(xs) / len(xs), *states)


# ---------------------------------------------------------------------------
# Inference-folded variant: BN folded into conv weight + bias.
# ---------------------------------------------------------------------------

def fold_batchnorm(params: Params, state: State) -> Params:
    """Fold every conv+BN pair into conv(w', b'): w' = w * scale/sqrt(var+eps),
    b' = bias - mean * scale/sqrt(var+eps).  Exact algebra; detection convs
    (already bias-only) pass through."""

    def fold(p, s):
        if "bn" in p:  # conv+bn block
            inv = 1.0 / jnp.sqrt(s["var"] + BN_EPS) * p["bn"]["scale"]
            return {"w": p["w"] * inv[None, None, None, :],
                    "b": p["bn"]["bias"] - s["mean"] * inv}
        if "b" in p:  # bias conv
            return {"w": p["w"], "b": p["b"]}
        return {k: fold(p[k], s.get(k, {})) for k in p}

    return fold(params, state)


# One dispatch instead of ~5 eager ops per conv (see init_yolonet note);
# eager on CPU, where compiles are the cost instead of dispatches.
_fold_batchnorm_eager = fold_batchnorm
_fold_batchnorm_jit = jax.jit(fold_batchnorm)


def fold_batchnorm(params: Params, state: State) -> Params:
    fn = (_fold_batchnorm_eager if jax.default_backend() == "cpu"
          else _fold_batchnorm_jit)
    return fn(params, state)


fold_batchnorm.__doc__ = _fold_batchnorm_eager.__doc__


def cast_params(params: Params, dtype) -> Params:
    return jax.tree.map(lambda a: a.astype(dtype), params)


_cast_params_jit = jax.jit(cast_params, static_argnames=("dtype",))
_cast_params_eager = cast_params


def cast_params(params: Params, dtype) -> Params:  # noqa: F811
    fn = (_cast_params_eager if jax.default_backend() == "cpu"
          else _cast_params_jit)
    return fn(params, dtype=dtype)


def _conv_bias_leaky(p, x, stride=1, leaky=True):
    y = _conv(x, p["w"], stride) + p["b"].astype(jnp.float32)
    if leaky:
        y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    return y.astype(x.dtype)


def apply_yolonet_folded(params: Params, x: jnp.ndarray):
    """Inference forward on BN-folded params (see fold_batchnorm).

    Run with bf16 params + bf16 ``x`` for MXU speed; accumulation stays fp32
    via ``preferred_element_type``.
    """
    p = params["backbone"]
    use_s2d = "s2d" in params
    if use_s2d:
        # stem + stage0 + stage1.down all in the s2d domain
        y = _apply_s2d_entry(params, x)
        start_stage = 1
    else:
        y = _conv_bias_leaky(p["stem"], x)
        start_stage = 0
    routes = []
    for i in range(_num_stages(p)):
        if i < start_stage:
            continue
        sp = p[f"stage{i}"]
        if not (use_s2d and i == 1):
            y = _conv_bias_leaky(sp["down"], y, stride=2)
        for b in range(_stage_blocks(sp)):
            r = _conv_bias_leaky(sp[f"res{b}"]["conv1"], y)
            r = _conv_bias_leaky(sp[f"res{b}"]["conv2"], r)
            y = y + r
        if i >= 2:
            routes.append(y)
    c3, c4, c5 = routes

    def head(hp, x):
        y = x
        for i in range(6):
            y = _conv_bias_leaky(hp[f"conv{i}"], y)
            if i == 4:
                branch = y
        det = _conv_bias_leaky(hp["det"], y, leaky=False)
        return det, branch

    det0, br0 = head(params["head0"], c5)
    y = _conv_bias_leaky(params["up0"]["conv"], br0)
    y = jnp.concatenate([upsample2x_nearest(y), c4], axis=-1)
    det1, br1 = head(params["head1"], y)
    y = _conv_bias_leaky(params["up1"]["conv"], br1)
    y = jnp.concatenate([upsample2x_nearest(y), c3], axis=-1)
    det2, _ = head(params["head2"], y)
    return det0, det1, det2


# ---------------------------------------------------------------------------
# Space-to-depth stem: the serving-path fix for tiny-channel convolutions.
#
# On TPU, NHWC tensors tile the channel dim into 128 lanes; the stem's
# C_in=3 / C_out=32 convs at 416x416 run an order of magnitude below peak
# (measured ~19ms of a 40ms forward at batch 64).  The standard remedy is to
# re-express the first two convolutions in a 2x2 space-to-depth domain with
# exactly remapped weights:
#
#   stem  conv3x3/s1 (3 -> 32)  @416  ==  conv3x3/s1 (12 -> 128) @210->208
#   down0 conv3x3/s2 (32 -> 64) @416  ==  conv2x2/s1 (128 -> 64) @208
#
# Outputs are bit-identical in exact arithmetic (the transform is a
# permutation of the same dot products); the fused network then proceeds
# from stage0's residual blocks unchanged.
# ---------------------------------------------------------------------------

def _s2d_1x1_weights(w):
    """[1,1,cin,cout] -> [1,1,4cin,4cout] block-diagonal: a 1x1 conv acts on
    each of the 4 spatial sub-positions independently."""
    import numpy as np

    w = np.asarray(w, np.float32).reshape(w.shape[2], w.shape[3])
    cin, cout = w.shape
    out = np.zeros((1, 1, 4 * cin, 4 * cout), np.float32)
    for k in range(4):
        out[0, 0, k * cin:(k + 1) * cin, k * cout:(k + 1) * cout] = w
    return out


def _s2d_3x3_s1_weights(w):
    """stride-1 3x3 conv, s2d input AND output: [3,3,cin,cout] ->
    [3,3,4cin,4cout], block-space padding (1,1).

    Output sub-position (dy,dx) row 2I+dy taps input rows 2I+t (t=dy+u-1),
    which live in block I + t//2 at sub-row t%2.
    """
    import numpy as np

    w = np.asarray(w, np.float32)
    cin, cout = w.shape[2], w.shape[3]
    out = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    for dy in range(2):
        for dx in range(2):
            for u in range(3):
                for v in range(3):
                    t, s = dy + u - 1, dx + v - 1
                    P, by = t // 2 + 1, t % 2
                    Q, bx = s // 2 + 1, s % 2
                    ci = (by * 2 + bx) * cin
                    co = (dy * 2 + dx) * cout
                    out[P, Q, ci:ci + cin, co:co + cout] = w[u, v]
    return out


def _s2d_3x3_s2_weights(w):
    """stride-2 3x3 conv, s2d input AND s2d output: [3,3,cin,cout] ->
    [3,3,4cin,4cout] applied with stride 1... no — block-space stride 2? No:
    output block I covers output rows 2I,2I+1 = input rows 4I+2dy+u-1,
    i.e. input blocks 2I + (2dy+u-1)//2 — a 3-tap kernel at block stride 2,
    padding (1,1).
    """
    import numpy as np

    w = np.asarray(w, np.float32)
    cin, cout = w.shape[2], w.shape[3]
    out = np.zeros((3, 3, 4 * cin, 4 * cout), np.float32)
    for dy in range(2):
        for dx in range(2):
            for u in range(3):
                for v in range(3):
                    t, s = 2 * dy + u - 1, 2 * dx + v - 1
                    P, by = t // 2 + 1, t % 2
                    Q, bx = s // 2 + 1, s % 2
                    ci = (by * 2 + bx) * cin
                    co = (dy * 2 + dx) * cout
                    out[P, Q, ci:ci + cin, co:co + cout] = w[u, v]
    return out


def _s2d_3x3_s2_exit_weights(w):
    """stride-2 3x3 conv, s2d input, NATIVE output: [3,3,cin,cout] ->
    [2,2,4cin,cout], block-space padding (1,0) — leaves the s2d domain."""
    import numpy as np

    w = np.asarray(w, np.float32)
    cin, cout = w.shape[2], w.shape[3]
    out = np.zeros((2, 2, 4 * cin, cout), np.float32)
    for u in range(3):
        for v in range(3):
            t, s = u - 1, v - 1
            P, by = t // 2 + 1, t % 2
            Q, bx = s // 2 + 1, s % 2
            ci = (by * 2 + bx) * cin
            out[P, Q, ci:ci + cin, :] = w[u, v]
    return out


def _stem4_weights(stem_w, stem_b):
    """Remap the stem conv (3x3/1, reference darknet.py:70's first layer)
    into the 4x4 space-to-depth domain: [3,3,cin,c1] -> [2,2,16cin,16c1]
    VALID conv over the (1,3)x(1,3)-padded, 4x4-block-packed image.  K grows
    to 16cin*4 taps and the output fills 16c1 lanes, so the MXU stops
    starving on the entry conv (the 2x2-domain stem's K=48 taps ran at a
    fraction of peak)."""
    import numpy as np

    stem_w = np.asarray(stem_w, np.float32)            # [3, 3, cin, c1]
    stem_b = np.asarray(stem_b, np.float32)
    cin, c1 = stem_w.shape[2], stem_w.shape[3]
    w4 = np.zeros((2, 2, 16 * cin, 16 * c1), np.float32)
    for dy in range(4):
        for dx in range(4):
            co = (dy * 4 + dx) * c1
            for u in range(3):
                for v in range(3):
                    t, s = dy + u, dx + v              # +1 pad already folded
                    ci = ((t % 4) * 4 + (s % 4)) * cin
                    w4[t // 4, s // 4, ci:ci + cin, co:co + c1] = stem_w[u, v]
    return w4, np.tile(stem_b, 16)


def _down0_4_weights(w):
    """Remap down0 (3x3/2, reference darknet.py:59's first downsample) to
    read the 4x4-block stem output DIRECTLY: [3,3,cin,cout] ->
    [2,2,16cin,4cout], stride 1, block-space padding (1,0).  Output layout
    (by,bx,o) over 2x2 blocks at the H/4 grid — exactly what the 2x2-domain
    res0 expects — without the s2d4->s2d2 depth-to-space repack XLA would
    otherwise materialize between stem and down0."""
    import numpy as np

    w = np.asarray(w, np.float32)
    cin, cout = w.shape[2], w.shape[3]
    out = np.zeros((2, 2, 16 * cin, 4 * cout), np.float32)
    for by in range(2):
        for bx in range(2):
            co = (by * 2 + bx) * cout
            for u in range(3):
                for v in range(3):
                    t = 2 * by + u - 1      # row offset from 4*I (input grid)
                    s = 2 * bx + v - 1
                    kI, dy = t // 4 + 1, t % 4   # t=-1 -> tap 0, block I-1
                    kJ, dx = s // 4 + 1, s % 4
                    ci = (dy * 4 + dx) * cin
                    out[kI, kJ, ci:ci + cin, co:co + cout] = w[u, v]
    return out


def _s2d_stem_weights(w):
    """stem 3x3/s1 conv on the (1,3)x(1,3)-padded 2x2-block image:
    [3,3,cin,c1] -> [3,3,4cin,4c1] VALID conv over blocks; the +1 row/col
    shift from the pad moves the tap blocks to I..I+2, hence P=(t+1)//2
    with no block-space padding."""
    import numpy as np

    w = np.asarray(w, np.float32)
    cin, c1 = w.shape[2], w.shape[3]
    out = np.zeros((3, 3, 4 * cin, 4 * c1), np.float32)
    for dy in range(2):
        for dx in range(2):
            for u in range(3):
                for v in range(3):
                    t, s = dy + u - 1, dx + v - 1
                    P, by = (t + 1) // 2, (t + 1) % 2
                    Q, bx = (s + 1) // 2, (s + 1) % 2
                    ci = (by * 2 + bx) * cin
                    co = (dy * 2 + dx) * c1
                    out[P, Q, ci:ci + cin, co:co + c1] = w[u, v]
    return out


def fold_space_to_depth(folded: Params) -> Params:
    """Add 's2d' remapped weights covering stem + ALL of stage0 + stage1's
    downsample, so every tensor before stage1 has >=128 channels."""
    import numpy as np

    bk = folded["backbone"]
    stem_w = np.asarray(bk["stem"]["w"], np.float32)                 # [3,3,3,32]
    stem_b = np.asarray(bk["stem"]["b"], np.float32)
    w_stem = _s2d_stem_weights(stem_w)

    s0 = bk["stage0"]
    s1 = bk["stage1"]
    dtype = bk["stem"]["w"].dtype

    def block(w, b):
        return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}

    import numpy as np  # noqa: F811

    out = dict(folded)
    out["s2d"] = {
        # [208,208,12+pad] -> [208,208,128]
        "stem": block(w_stem, np.tile(stem_b, 4)),
        # stage0 downsample: s2d -> s2d  [208,208,128] -> [104,104,256]
        "down0": block(
            _s2d_3x3_s2_weights(s0["down"]["w"]),
            np.tile(np.asarray(s0["down"]["b"], np.float32), 4),
        ),
        # stage0 residual block in s2d domain
        "res0_1": block(
            _s2d_1x1_weights(s0["res0"]["conv1"]["w"]),
            np.tile(np.asarray(s0["res0"]["conv1"]["b"], np.float32), 4),
        ),
        "res0_2": block(
            _s2d_3x3_s1_weights(s0["res0"]["conv2"]["w"]),
            np.tile(np.asarray(s0["res0"]["conv2"]["b"], np.float32), 4),
        ),
        # stage1 downsample exits the s2d domain: [104,104,256] -> [104,104,128]
        "down1": block(
            _s2d_3x3_s2_exit_weights(s1["down"]["w"]),
            np.asarray(s1["down"]["b"], np.float32),
        ),
    }
    return out


def _space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 2H, 2W, C] -> [B, H, W, 4C] with (by, bx, c) channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _space_to_depth4(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 4H, 4W, C] -> [B, H, W, 16C] with (by, bx, c) channel order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 4, 4, w // 4, 4, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 4, w // 4, 16 * c)


def _conv_s2d(p, x, stride=1, padding=((0, 0), (0, 0))):
    y = lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=_DN, preferred_element_type=jnp.float32,
    ) + p["b"].astype(jnp.float32)
    return jnp.where(y > 0, y, LEAKY_SLOPE * y).astype(x.dtype)


def _apply_s2d_entry(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x [B, H, W, 3] -> stage1-res input [B, H/4, W/4, 128] with stem,
    stage0 (down + residual block), and stage1's downsample all computed in
    the 2x2 space-to-depth domain — numerically equal to the plain conv
    path, but every tensor carries >=128 channels (full TPU lanes)."""
    sp = params["s2d"]
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xb = _space_to_depth2(xp)                      # [B, H/2+2, W/2+2, 12]
    y = _conv_s2d(sp["stem"], xb)                  # s2d(stem):  [H/2, W/2, 128]
    y = _conv_s2d(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
    #                                              # s2d(down0): [H/4, W/4, 256]
    # NOTE: the 4x4-domain stem + direct down0 (_stem4_weights /
    # _down0_4_weights) is an int8-only win — it exists to kill the int8
    # path's s2d4->s2d2 repack transpose.  The bf16 2x2 path has no repack,
    # so the bigger down0_4 kernel only adds FLOPs (measured +1% here).
    r = _conv_s2d(sp["res0_1"], y)                 #             [H/4, W/4, 128]
    r = _conv_s2d(sp["res0_2"], r, padding=((1, 1), (1, 1)))
    y = y + r                                      # s2d residual add
    # exit the s2d domain through stage1's downsample
    return _conv_s2d(sp["down1"], y, padding=((1, 0), (1, 0)))


# ---------------------------------------------------------------------------
# Training-path s2d entry.
#
# The serving path's space-to-depth entry (above) folds BN into the conv and
# remaps once on the host.  Training needs (a) gradients flowing back to the
# ORIGINAL [3,3,cin,cout] master weights and (b) train-mode BatchNorm.  Both
# fall out naturally:
#
# - every numpy remap above is a pure placement of input elements (disjoint
#   block scatter), so applying it to a position-index array yields a gather
#   table; the traced remap `w.reshape(-1)[idx] * mask` is then exact and
#   differentiable (autodiff scatter-adds the 4 appearances of each tap back
#   onto the master weight);
# - the s2d output channels are the original channels replicated over the 4
#   spatial sub-positions, each sub-position seeing exactly 1/4 of the
#   original spatial positions — so reshaping [B,H,W,4c] -> [B,H,W,4,c] and
#   reducing over (0,1,2,3) computes BN statistics over the *identical
#   element set* as the plain path: train-mode BN (and its running-stat
#   updates) match the reference semantics exactly.
# ---------------------------------------------------------------------------

_REMAP_TABLE_CACHE: dict = {}


def _remap_table(np_remap, shape):
    """(gather idx, mask) realizing ``np_remap`` as w.flat[idx] * mask.

    Built by running the numpy remap on a 1-based position encoding; valid
    because every remap above writes disjoint slices of its output (each
    output element is one input element or structural zero)."""
    import numpy as np

    key = (np_remap.__name__, tuple(shape))
    hit = _REMAP_TABLE_CACHE.get(key)
    if hit is not None:
        return hit
    size = int(np.prod(shape))
    assert size < (1 << 24), "position encoding must stay exact in float32"
    pos = np.arange(1, size + 1, dtype=np.float32).reshape(shape)
    out_pos = np.asarray(np_remap(pos))
    idx = np.maximum(out_pos.astype(np.int64) - 1, 0)
    mask = (out_pos != 0).astype(np.float32)
    _REMAP_TABLE_CACHE[key] = (idx, mask)
    return idx, mask


def _remap_traced(w, np_remap):
    """Differentiable (traced) version of a numpy weight remap."""
    idx, mask = _remap_table(np_remap, w.shape)
    return w.reshape(-1)[idx] * jnp.asarray(mask, w.dtype)


def _conv_bn_leaky_s2d(
    p: Params,
    s: State,
    x: jnp.ndarray,
    w_s2d: jnp.ndarray,
    groups: int,
    stride: int = 1,
    padding=((0, 0), (0, 0)),
    training: bool = False,
) -> Tuple[jnp.ndarray, State]:
    """conv_bn_leaky computed in the space-to-depth domain: the conv uses the
    remapped weight ``w_s2d`` (out channels = groups x original), BN uses the
    ORIGINAL per-channel parameters/state from ``p``/``s`` with statistics
    pooled across the ``groups`` sub-positions (exactly the plain path's
    element set — see block comment above)."""
    y = lax.conv_general_dilated(
        x, w_s2d, (stride, stride), padding, dimension_numbers=_DN,
    ).astype(jnp.float32)
    b, h, w, ch = y.shape
    c = ch // groups
    yv = y.reshape(b, h, w, groups, c)
    if training:
        mean = jnp.mean(yv, axis=(0, 1, 2, 3))
        var = jnp.var(yv, axis=(0, 1, 2, 3))
        n = b * h * w * groups
        # biased var under the recalibration override (see conv_bn_leaky)
        unbiased = (var * (n / max(n - 1, 1))
                    if _BN_MOMENTUM_OVERRIDE is None else var)
        m = _bn_momentum()
        new_s = {
            "mean": (1 - m) * s["mean"] + m * mean,
            "var": (1 - m) * s["var"] + m * unbiased,
        }
    else:
        mean, var = s["mean"], s["var"]
        new_s = s
    inv = lax.rsqrt(var + BN_EPS) * p["bn"]["scale"]
    yv = (yv - mean) * inv + p["bn"]["bias"]
    y = yv.reshape(b, h, w, ch)
    y = jnp.where(y > 0, y, LEAKY_SLOPE * y)
    return y.astype(x.dtype), new_s


def apply_s2d_entry_train(
    params: Params, state: State, x: jnp.ndarray, training: bool = False
) -> Tuple[jnp.ndarray, State]:
    """Training forward of stem + stage0 + stage1.down in the 2x2 s2d domain.

    Numerically equal (fp32 reassociation aside) to the plain-conv entry of
    ``apply_backbone`` — same activations out, same BN running-stat updates,
    same gradients on the master weights — but every tensor carries >=128
    channels, killing the tiny-channel MXU starvation the serving path
    already eliminated (reference hot path train.py:21-102 has no
    counterpart: this is TPU lane economics)."""
    bk, bs = params, state
    s0, s0s = bk["stage0"], bs["stage0"]
    s1, s1s = bk["stage1"], bs["stage1"]

    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xb = _space_to_depth2(xp)                      # [B, H/2+2, W/2+2, 12]
    y, st_stem = _conv_bn_leaky_s2d(
        bk["stem"], bs["stem"], xb,
        _remap_traced(bk["stem"]["w"], _s2d_stem_weights), 4,
        training=training)                         # [H/2, W/2, 128]
    y, st_d0 = _conv_bn_leaky_s2d(
        s0["down"], s0s["down"], y,
        _remap_traced(s0["down"]["w"], _s2d_3x3_s2_weights), 4,
        stride=2, padding=((1, 1), (1, 1)), training=training)
    r, st_r1 = _conv_bn_leaky_s2d(
        s0["res0"]["conv1"], s0s["res0"]["conv1"], y,
        _remap_traced(s0["res0"]["conv1"]["w"], _s2d_1x1_weights), 4,
        training=training)
    r, st_r2 = _conv_bn_leaky_s2d(
        s0["res0"]["conv2"], s0s["res0"]["conv2"], r,
        _remap_traced(s0["res0"]["conv2"]["w"], _s2d_3x3_s1_weights), 4,
        padding=((1, 1), (1, 1)), training=training)
    y = y + r
    y, st_d1 = _conv_bn_leaky_s2d(
        s1["down"], s1s["down"], y,
        _remap_traced(s1["down"]["w"], _s2d_3x3_s2_exit_weights), 1,
        padding=((1, 0), (1, 0)), training=training)
    entry_state = {
        "stem": st_stem,
        "stage0": {"down": st_d0,
                   "res0": {"conv1": st_r1, "conv2": st_r2}},
        "stage1_down": st_d1,
    }
    return y, entry_state


# ---------------------------------------------------------------------------
# Canonical conv ordering — the contract the darknet weight codec relies on.
# ---------------------------------------------------------------------------

def conv_layer_paths(
    num_stages: Optional[int] = None,
    blocks: Tuple[int, ...] = DARKNET53_BLOCKS,
) -> List[Tuple[str, ...]]:
    """Paths of all conv blocks in darknet cfg order.

    Mirrors the reference's recursive registration-order walk
    (WeightManager.find_conv_layers, darknet.py:292-303): backbone, head0,
    up0, head1, up1, head2.
    """
    if num_stages is None:
        num_stages = len(blocks)
    paths: List[Tuple[str, ...]] = [("backbone", "stem")]
    for i in range(num_stages):
        paths.append(("backbone", f"stage{i}", "down"))
        for b in range(blocks[i]):
            paths.append(("backbone", f"stage{i}", f"res{b}", "conv1"))
            paths.append(("backbone", f"stage{i}", f"res{b}", "conv2"))
    for h, up in (("head0", "up0"), ("head1", "up1"), ("head2", None)):
        for i in range(6):
            paths.append((h, f"conv{i}"))
        paths.append((h, "det"))
        if up is not None:
            paths.append((up, "conv"))
    return paths


def backbone_conv_paths() -> List[Tuple[str, ...]]:
    """Backbone-only prefix (52 convs) — the darknet53.conv.74 load target
    (reference darknet.py:102-104)."""
    return [p for p in conv_layer_paths() if p[0] == "backbone"]
