"""Whole-program A/B of entry-stage variants (VERDICT r2 item 3).

Baseline: stem4 (int8 [2,2,48,512] over 4x4 blocks) + down0_4 + s2d res0 +
down1 — measured 7.5 ms of the 22.7 ms bs64 int8-u8 forward.

Variants (each swaps ONLY the entry; tail identical):
  mm_stem   — stem as a 1x1 int8 conv on the 4-shift concat of the s2d4
              image ([B,104,104,192] @ [1,1,192,512]); K pads 192->256
              instead of per-tap 48->128 (2.67x less pad), at the price of
              materializing the 133 MB concat.
  bf16_entry— the whole entry (stem..down1) on the folded bf16 2x2-s2d
              path, quantizing to int8 at down1's output (VERDICT (a)).
  stem8     — stem4 with 8x sub-position duplication: [2,2,24,256] over a
              HALF-shifted 4x4 block grid is not expressible; instead the
              2x2-domain stem [3,3,12,128] with taps padded to 32 real
              channels by duplicating the image 2x in channels and halving
              the kernel (VERDICT (b)'s "halve the waste" shape).

Timing: jit(fori chain of n full forwards), carry-threaded, differenced
n=4 vs n=16 (CLAUDE.md methodology) + a 20-iteration per-call loop for the
headline-comparable number.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

BS = 64
DIM = 416
_DN = ("NHWC", "HWIO", "NHWC")


def build():
    params, state = D.init_yolonet(jax.random.PRNGKey(0), 80)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.uniform(0, 1, (8, DIM, DIM, 3)).astype(np.float32))
    q = Q.build_quantized(params, state, calib)
    folded = D.fold_space_to_depth(
        D.fold_batchnorm(jax.device_get(params), jax.device_get(state)))
    f16 = {k: jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), folded[k])
           for k in ("s2d",)}
    return q, f16["s2d"]


def entry_baseline(q, x_q):
    return Q._entry_s2d(q, x_q, "stem4_u8")


def entry_mm_stem(q, x_q):
    """stem as 1x1 conv over the 4-shift concat; tail of entry unchanged."""
    sc = q["scales"]
    sp = q["s2d"]
    base = sp["stem4_u8"]
    xp = jnp.pad(x_q, ((0, 0), (1, 3), (1, 3), (0, 0)),
                 constant_values=-128)
    xb = Q._space_to_depth4(xp)                     # [B,105,105,48]
    h = xb.shape[1] - 1
    parts = [xb[:, i:i + h, j:j + h, :] for i in (0, 1) for j in (0, 1)]
    xcat = jnp.concatenate(parts, axis=-1)          # [B,104,104,192]
    qp = {"w": base["w"].reshape(1, 1, 192, -1), "m": base["m"],
          "b": base["b"]}
    y4 = Q._conv_i8(qp, xcat, padding=((0, 0), (0, 0)))
    y = Q._conv_i8(sp["down0_4"], y4, padding=((1, 0), (1, 0)))
    r = Q._conv_i8(sp["res0_1"], y, padding=((0, 0), (0, 0)))
    r = Q._conv_i8(sp["res0_2"], r, padding=((1, 1), (1, 1)),
                   residual=y,
                   res_scale=sc["s2d/down0"] / sc["s2d/res0_2"])
    return Q._conv_i8(sp["down1"], r, padding=((1, 0), (1, 0)))


def entry_bf16(q, s2d16, u8):
    """whole entry on the folded bf16 s2d path; quantize at down1 out."""
    x = (u8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0))
    y = D._apply_s2d_entry({"s2d": s2d16}, x)       # bf16 [B,104,104,128]
    s = q["scales"]["s2d/down1"]
    return jnp.clip(jnp.round(y.astype(jnp.float32) / s),
                    -127, 127).astype(jnp.int8)


def forward(q, s2d16, variant, u8):
    x_q = lax.bitcast_convert_type(u8 ^ jnp.uint8(128), jnp.int8)
    if variant == "baseline":
        y = entry_baseline(q, x_q)
    elif variant == "mm_stem":
        y = entry_mm_stem(q, x_q)
    elif variant == "bf16_entry":
        y = entry_bf16(q, s2d16, u8)
    else:
        raise ValueError(variant)
    return Q._yolonet_tail(q, y)


def timed_chain(fn, u8, n):
    """jit a chain of n forwards, each consuming the previous det0 byte to
    thread the carry (prevents loop-invariant hoisting)."""

    @jax.jit
    def chain(u8):
        def body(i, carry):
            u, acc = carry
            d0, d1, d2 = fn(u)
            # data-dependent (runtime-zero, not foldable) byte fed back into
            # the input so no iteration can be hoisted as loop-invariant
            tweak = (d0[0, 0, 0, 0] > 1e9).astype(jnp.uint8)
            u = u.at[0, 0, 0, 0].set(u[0, 0, 0, 0] ^ tweak)
            return (u, acc + d0[0, 0, 0, 0].astype(jnp.float32))
        _, acc = lax.fori_loop(0, n, body, (u8, jnp.float32(0)))
        return acc

    t0 = time.perf_counter()
    np.asarray(chain(u8))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain(u8))
    return time.perf_counter() - t0, t_compile


def main():
    q, s2d16 = build()
    rng = np.random.default_rng(1)
    u8 = jnp.asarray(rng.integers(0, 256, (BS, DIM, DIM, 3), dtype=np.uint8))

    ref = None
    for variant in ("baseline", "mm_stem", "bf16_entry"):
        fn = lambda u, v=variant: forward(q, s2d16, v, u)
        # parity first (head-0 logits must match baseline closely)
        d0 = np.asarray(jax.jit(fn)(u8)[0], np.float32)
        if ref is None:
            ref, err = d0, 0.0
        else:
            err = float(np.max(np.abs(d0 - ref)))
        t4, c4 = timed_chain(fn, u8, 4)
        t16, _ = timed_chain(fn, u8, 16)
        per = (t16 - t4) / 12.0
        print(f"{variant:12s} per-fwd {per*1e3:7.2f} ms  "
              f"imgs/s {BS/per:7.0f}  maxerr-vs-base {err:.3f}  "
              f"(t4 {t4*1e3:.1f} t16 {t16*1e3:.1f} compile {c4:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
