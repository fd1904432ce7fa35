"""Steady-state matmul throughput: chain matmuls inside one jit via scan,
one readback at the end — removes per-call dispatch/tunnel overhead."""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def steady(fn, x, n_inner=50):
    """fn: x -> x (same shape/dtype). Run n_inner times inside one jit."""
    @jax.jit
    def run(x):
        return lax.fori_loop(0, n_inner, lambda i, v: fn(v), x)

    sync(run(x))
    t0 = time.perf_counter()
    out = run(x)
    sync(out)
    return (time.perf_counter() - t0) / n_inner


# square-ish chain: y <- (y @ B) keeps shape [M, N] with K=N
M, K = 4096, 4096
FLOPS = 2 * M * K * K
rng = np.random.default_rng(0)
B_bf = jnp.asarray(rng.standard_normal((K, K), dtype=np.float32)).astype(jnp.bfloat16)
x_bf = jnp.asarray(rng.standard_normal((M, K), dtype=np.float32)).astype(jnp.bfloat16)
B_i8 = jnp.asarray(rng.integers(-5, 5, (K, K), dtype=np.int8))
x_i8 = jnp.asarray(rng.integers(-5, 5, (M, K), dtype=np.int8))

t = steady(lambda y: jnp.dot(y, B_bf, preferred_element_type=jnp.float32)
           .astype(jnp.bfloat16), x_bf)
print(f"XLA bf16 chain: {t*1e3:7.3f} ms  {FLOPS/t/1e12:7.1f} TF/s")

t = steady(lambda y: jnp.clip(
    jnp.dot(y, B_i8, preferred_element_type=jnp.int32) >> 7, -127, 127
).astype(jnp.int8), x_i8)
print(f"XLA int8 chain: {t*1e3:7.3f} ms  {FLOPS/t/1e12:7.1f} TOP/s")


def mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, acc_dtype, n_k, shift):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:], preferred_element_type=acc_dtype)

    @pl.when(k == n_k - 1)
    def _():
        if shift:
            o_ref[:] = jnp.clip(acc_ref[:] >> 7, -127, 127).astype(o_ref.dtype)
        else:
            o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def pallas_mm(a, b, tm, tk, tn, acc_dtype, out_dtype, shift=False):
    m, k = a.shape
    _, n = b.shape
    n_k = k // tk
    return pl.pallas_call(
        functools.partial(mm_kernel, acc_dtype=acc_dtype, n_k=n_k, shift=shift),
        grid=(m // tm, n // tn, n_k),
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


t = steady(lambda y: pallas_mm(y, B_bf, 1024, 1024, 512,
                               jnp.float32, jnp.bfloat16), x_bf)
print(f"PL  bf16 chain: {t*1e3:7.3f} ms  {FLOPS/t/1e12:7.1f} TF/s")

for tm, tk, tn in [(1024, 1024, 512), (1024, 2048, 512), (2048, 1024, 512),
                   (512, 4096, 512), (1024, 1024, 1024)]:
    try:
        t = steady(lambda y: pallas_mm(y, B_i8, tm, tk, tn,
                                       jnp.int32, jnp.int8, shift=True), x_i8)
        print(f"PL  int8 chain t=({tm},{tk},{tn}): {t*1e3:7.3f} ms  {FLOPS/t/1e12:7.1f} TOP/s")
    except Exception as e:
        print(f"PL  int8 t=({tm},{tk},{tn}): FAIL {str(e)[:100]}")
