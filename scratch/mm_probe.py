"""Microbenchmark: matmul peak on this chip — bf16 vs int8, XLA vs Pallas.

Determines whether the int8 MXU mode (2x bf16) is reachable, and by which
path. All timings synced via host readback (axon block_until_ready no-op).
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return np.asarray(x.ravel()[0:1])


def timeit(fn, *args, iters=30):
    sync(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


M, K, N = 8192, 4096, 4096
FLOPS = 2 * M * K * N

rng = np.random.default_rng(0)
a_f = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32))
b_f = jnp.asarray(rng.standard_normal((K, N), dtype=np.float32))
a_bf, b_bf = a_f.astype(jnp.bfloat16), b_f.astype(jnp.bfloat16)
a_i8 = jnp.asarray(rng.integers(-127, 127, (M, K), dtype=np.int8))
b_i8 = jnp.asarray(rng.integers(-127, 127, (K, N), dtype=np.int8))


@jax.jit
def mm_bf16(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


@jax.jit
def mm_int8_xla(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.int32)


t = timeit(mm_bf16, a_bf, b_bf)
print(f"XLA bf16 : {t*1e3:8.3f} ms  {FLOPS/t/1e12:7.1f} TF/s")
t = timeit(mm_int8_xla, a_i8, b_i8)
print(f"XLA int8 : {t*1e3:8.3f} ms  {FLOPS/t/1e12:7.1f} TOP/s")


# --- Pallas tiled matmul ----------------------------------------------------
def mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, acc_dtype, n_k):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_mm(a, b, tm, tk, tn, acc_dtype, out_dtype):
    m, k = a.shape
    _, n = b.shape
    n_k = k // tk
    grid = (m // tm, n // tn, n_k)
    return pl.pallas_call(
        functools.partial(mm_kernel, acc_dtype=acc_dtype, n_k=n_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(a, b)


for tm, tk, tn in [(512, 1024, 512), (512, 2048, 512), (1024, 1024, 512), (512, 512, 1024)]:
    f = jax.jit(functools.partial(pallas_mm, tm=tm, tk=tk, tn=tn,
                                  acc_dtype=jnp.float32, out_dtype=jnp.bfloat16))
    try:
        t = timeit(f, a_bf, b_bf)
        print(f"PL bf16 t=({tm},{tk},{tn}): {t*1e3:8.3f} ms  {FLOPS/t/1e12:7.1f} TF/s")
    except Exception as e:
        print(f"PL bf16 t=({tm},{tk},{tn}): FAIL {type(e).__name__}: {str(e)[:120]}")

for tm, tk, tn in [(512, 1024, 512), (512, 2048, 512), (1024, 1024, 512), (512, 512, 1024)]:
    f = jax.jit(functools.partial(pallas_mm, tm=tm, tk=tk, tn=tn,
                                  acc_dtype=jnp.int32, out_dtype=jnp.int32))
    try:
        t = timeit(f, a_i8, b_i8)
        print(f"PL int8 t=({tm},{tk},{tn}): {t*1e3:8.3f} ms  {FLOPS/t/1e12:7.1f} TOP/s")
    except Exception as e:
        print(f"PL int8 t=({tm},{tk},{tn}): FAIL {type(e).__name__}: {str(e)[:120]}")
