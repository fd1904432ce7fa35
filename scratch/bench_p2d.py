"""Benchmark P2D fused res-block kernels vs XLA conv chains at YOLOv3
stage shapes (bs64).  8-deep shape-preserving res-block chains, one jit,
host-readback sync."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from yolo_v3_tpu.ops import fused_conv as F

_DN = ("NHWC", "HWIO", "NHWC")
DEPTH = 8


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def steady(fn, x):
    run = jax.jit(lambda v: fn(v))
    sync(run(x))
    t0 = time.perf_counter()
    out = run(x)
    sync(out)
    return (time.perf_counter() - t0) / DEPTH


B = 64
rng = np.random.default_rng(0)

for H, C in [(52, 256), (26, 512), (13, 1024)]:
    Cm = C // 2
    flops = 2 * B * H * H * (C * Cm + Cm * 9 * C)
    r, hp, wp = F.p2d_geometry(B, H, H)
    tm = F.pick_tile_m(r, 2048 if H > 16 else 4096)

    x_i8 = jnp.asarray(rng.integers(-60, 60, (r, C), dtype=np.int8))
    w1_i8 = jnp.asarray(rng.integers(-60, 60, (C, Cm), dtype=np.int8))
    w2_i8 = jnp.asarray(rng.integers(-60, 60, (3, 3, Cm, C), dtype=np.int8))
    s1 = jnp.asarray(rng.uniform(0.004, 0.008, Cm).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=Cm).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0.004, 0.008, C).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=C).astype(np.float32))

    def p2d_i8_chain(y):
        for _ in range(DEPTH):
            y = F.res_block_p2d(y, w1_i8, s1, b1, w2_i8, s2, b2, hp, wp,
                                out_dtype=jnp.int8, res_scale=1.0, tile_m=tm)
        return y

    # bf16 P2D variant
    x_bf = jnp.asarray(rng.standard_normal((r, C), dtype=np.float32)).astype(jnp.bfloat16)
    w1_bf = (jnp.asarray(rng.standard_normal((C, Cm), dtype=np.float32)) * 0.05).astype(jnp.bfloat16)
    w2_bf = (jnp.asarray(rng.standard_normal((3, 3, Cm, C), dtype=np.float32)) * 0.02).astype(jnp.bfloat16)
    ones1 = jnp.ones((Cm,), jnp.float32)
    ones2 = jnp.ones((C,), jnp.float32)
    zb1 = jnp.zeros((Cm,), jnp.float32)
    zb2 = jnp.zeros((C,), jnp.float32)

    def p2d_bf_chain(y):
        for _ in range(DEPTH):
            y = F.res_block_p2d(y, w1_bf, ones1, zb1, w2_bf, ones2, zb2,
                                hp, wp, out_dtype=jnp.bfloat16, tile_m=tm)
        return y

    # XLA bf16 baseline (NHWC conv chain, what the current serving path does)
    x4 = jnp.asarray(rng.standard_normal((B, H, H, C), dtype=np.float32)).astype(jnp.bfloat16)
    w1c = w1_bf.reshape(1, 1, C, Cm)

    def xla_bf_chain(y):
        for _ in range(DEPTH):
            t = lax.conv_general_dilated(y, w1c, (1, 1), ((0, 0), (0, 0)),
                                         dimension_numbers=_DN,
                                         preferred_element_type=jnp.float32)
            t = jnp.where(t > 0, t, 0.1 * t).astype(jnp.bfloat16)
            t = lax.conv_general_dilated(t, w2_bf, (1, 1), ((1, 1), (1, 1)),
                                         dimension_numbers=_DN,
                                         preferred_element_type=jnp.float32)
            y = (y.astype(jnp.float32) + jnp.where(t > 0, t, 0.1 * t)).astype(jnp.bfloat16)
        return y

    try:
        t = steady(p2d_i8_chain, x_i8)
        print(f"H={H:3d} C={C:4d} P2D int8: {t*1e3:7.3f} ms {flops/t/1e12:6.1f} TOP/s", flush=True)
    except Exception as e:
        print(f"H={H:3d} C={C:4d} P2D int8 FAIL: {str(e)[:150]}", flush=True)
    try:
        t = steady(p2d_bf_chain, x_bf)
        print(f"H={H:3d} C={C:4d} P2D bf16: {t*1e3:7.3f} ms {flops/t/1e12:6.1f} TF/s", flush=True)
    except Exception as e:
        print(f"H={H:3d} C={C:4d} P2D bf16 FAIL: {str(e)[:150]}", flush=True)
    t = steady(xla_bf_chain, x4)
    print(f"H={H:3d} C={C:4d} XLA bf16: {t*1e3:7.3f} ms {flops/t/1e12:6.1f} TF/s", flush=True)
