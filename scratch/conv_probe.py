"""Probe real YOLOv3 conv shapes: bf16 XLA conv vs int8 XLA conv vs int8
conv-as-matmul (1x1 direct dot; 3x3 as 9 accumulated shifted dots).

Each variant chained n_inner times inside one jit (shape-preserving res-block
pattern: 1x1 C->C/2 then 3x3 C/2->C), one readback at the end.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def steady(fn, x, n_inner=12):
    """Unrolled chain inside one jit — mirrors the real network structure
    (straight-line conv chain), unlike fori_loop which blocks XLA's
    cross-iteration scheduling."""
    @jax.jit
    def run(x):
        for _ in range(n_inner):
            x = fn(x)
        return x

    sync(run(x))
    t0 = time.perf_counter()
    out = run(x)
    sync(out)
    return (time.perf_counter() - t0) / n_inner


B = 64
rng = np.random.default_rng(0)

# res-block shapes per stage: (H, C) with conv1 1x1 C->C/2, conv2 3x3 C/2->C
STAGES = [(104, 128), (52, 256), (26, 512), (13, 1024)]

for H, C in STAGES:
    Cm = C // 2
    flops = 2 * B * H * H * (C * Cm + Cm * 9 * C)   # per res block
    x_f = jnp.asarray(rng.standard_normal((B, H, H, C), dtype=np.float32))
    x_bf = x_f.astype(jnp.bfloat16)
    w1_bf = jnp.asarray(rng.standard_normal((1, 1, C, Cm), dtype=np.float32)).astype(jnp.bfloat16) * 0.05
    w2_bf = jnp.asarray(rng.standard_normal((3, 3, Cm, C), dtype=np.float32)).astype(jnp.bfloat16) * 0.05
    x_i8 = jnp.asarray(rng.integers(-5, 5, (B, H, H, C), dtype=np.int8))
    w1_i8 = jnp.asarray(rng.integers(-5, 5, (1, 1, C, Cm), dtype=np.int8))
    w2_i8 = jnp.asarray(rng.integers(-5, 5, (3, 3, Cm, C), dtype=np.int8))

    def bf16_block(y):
        r = lax.conv_general_dilated(y, w1_bf, (1, 1), ((0, 0), (0, 0)),
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.float32)
        r = jnp.maximum(r, 0.1 * r).astype(jnp.bfloat16)
        r = lax.conv_general_dilated(r, w2_bf, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.float32)
        return (y.astype(jnp.float32) + jnp.maximum(r, 0.1 * r)).astype(jnp.bfloat16)

    def i8_conv_block(y):
        r = lax.conv_general_dilated(y, w1_i8, (1, 1), ((0, 0), (0, 0)),
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.int32)
        r = jnp.clip(r >> 4, -127, 127).astype(jnp.int8)
        r = lax.conv_general_dilated(r, w2_i8, (1, 1), ((1, 1), (1, 1)),
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.int32)
        return jnp.clip((r >> 4) + y, -127, 127).astype(jnp.int8)

    w2_mm = w2_i8.reshape(9, Cm, C)

    def i8_mm_block(y):
        m = B * H * H
        r = jnp.dot(y.reshape(m, C), w1_i8.reshape(C, Cm),
                    preferred_element_type=jnp.int32)
        r = jnp.clip(r >> 4, -127, 127).astype(jnp.int8).reshape(B, H, H, Cm)
        rp = jnp.pad(r, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B, H, H, C), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                win = lax.dynamic_slice(rp, (0, dy, dx, 0), (B, H, H, Cm))
                acc = acc + jnp.dot(win.reshape(m, Cm), w2_mm[dy * 3 + dx],
                                    preferred_element_type=jnp.int32
                                    ).reshape(B, H, H, C)
        return jnp.clip((acc >> 4) + y, -127, 127).astype(jnp.int8)

    t = steady(bf16_block, x_bf)
    print(f"H={H:4d} C={C:5d}  bf16 conv  : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TF/s")
    t = steady(i8_conv_block, x_i8)
    print(f"H={H:4d} C={C:5d}  int8 conv  : {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TOP/s")
    t = steady(i8_mm_block, x_i8)
    print(f"H={H:4d} C={C:5d}  int8 matmul: {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TOP/s")
