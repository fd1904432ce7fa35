"""Probe: per-scale postprocess on native [B,S,S,255] raws with static-lane
score extraction (no flat materialization, no full-tensor relayout).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

B = 64
SHAPES = [(13, 13), (26, 26), (52, 52)]
A = 3
ATT = 85


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, inputs, iters=20):
    sync(fn(inputs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def mk(c):
    def g(k):
        return [jax.random.normal(jax.random.fold_in(k, i), (B, s, s, c),
                                  jnp.bfloat16) for i, (s, _) in enumerate(SHAPES)]
    return [jax.jit(g)(jax.random.PRNGKey(i)) for i in range(2)]


raws = mk(255)

# E. static-lane score pass only
def scores_static(rs):
    outs = []
    for r in rs:
        per_a = []
        for a in range(A):
            o = r[..., a * ATT + 4].astype(jnp.float32)
            c = jnp.max(r[..., a * ATT + 5:a * ATT + 85].astype(jnp.float32),
                        axis=-1)
            per_a.append(jax.nn.sigmoid(o) * jax.nn.sigmoid(c))
        s = jnp.stack(per_a, axis=-1)        # [B,S,S,3] (h,w,a) order
        outs.append(s.reshape(B, -1))
    return jnp.concatenate(outs, axis=1)

fe = jax.jit(lambda rs: scores_static(rs).mean())
print(f"E scores static-lane : {timeit(fe, raws):7.3f} ms", flush=True)

# F. full fast pipe: scores + per-scale topk(128) + cell gather + anchor sel
#    + decode-ish (boxes, cls argmax)
K = 128

def fast_pipe(rs):
    rows_all, sc_all = [], []
    for r in rs:
        per_a = []
        for a in range(A):
            o = r[..., a * ATT + 4].astype(jnp.float32)
            c = jnp.max(r[..., a * ATT + 5:a * ATT + 85].astype(jnp.float32),
                        axis=-1)
            per_a.append(jax.nn.sigmoid(o) * jax.nn.sigmoid(c))
        s = jnp.stack(per_a, axis=-1).reshape(B, -1)     # [B, S*S*3]
        top_s, top_i = jax.lax.top_k(s, K)
        cells = r.reshape(B, -1, A * ATT)                # [B,S*S,255] layout-free
        g = jnp.take_along_axis(cells, (top_i // A)[..., None], axis=1)
        g = g.reshape(B, K, A, ATT)                      # tiny relayout
        row = jnp.take_along_axis(
            g, (top_i % A)[..., None, None], axis=2)[:, :, 0]  # [B,K,85]
        rows_all.append(row.astype(jnp.float32))
        sc_all.append(top_s)
    rows = jnp.concatenate(rows_all, axis=1)             # [B,3K,85]
    sc = jnp.concatenate(sc_all, axis=1)
    bx = jax.nn.sigmoid(rows[..., 0])
    bw = jnp.exp(rows[..., 2])
    cls = jnp.argmax(rows[..., 5:85], axis=-1)
    return (bx + bw).mean() + sc.mean() + cls.astype(jnp.float32).mean()

ff = jax.jit(fast_pipe)
print(f"F fast pipe 255 (noNMS): {timeit(ff, raws):7.3f} ms", flush=True)

# G. same but K=64 per scale
def fast_pipe_k(K):
    def f(rs):
        rows_all, sc_all = [], []
        for r in rs:
            per_a = []
            for a in range(A):
                o = r[..., a * ATT + 4].astype(jnp.float32)
                c = jnp.max(r[..., a * ATT + 5:a * ATT + 85].astype(jnp.float32),
                            axis=-1)
                per_a.append(jax.nn.sigmoid(o) * jax.nn.sigmoid(c))
            s = jnp.stack(per_a, axis=-1).reshape(B, -1)
            top_s, top_i = jax.lax.top_k(s, K)
            cells = r.reshape(B, -1, A * ATT)
            g = jnp.take_along_axis(cells, (top_i // A)[..., None], axis=1)
            g = g.reshape(B, K, A, ATT)
            row = jnp.take_along_axis(
                g, (top_i % A)[..., None, None], axis=2)[:, :, 0]
            rows_all.append(row.astype(jnp.float32))
            sc_all.append(top_s)
        rows = jnp.concatenate(rows_all, axis=1)
        sc = jnp.concatenate(sc_all, axis=1)
        bx = jax.nn.sigmoid(rows[..., 0])
        bw = jnp.exp(rows[..., 2])
        cls = jnp.argmax(rows[..., 5:85], axis=-1)
        return (bx + bw).mean() + sc.mean() + cls.astype(jnp.float32).mean()
    return f

fg = jax.jit(fast_pipe_k(64))
print(f"G fast pipe K=64      : {timeit(fg, raws):7.3f} ms", flush=True)
