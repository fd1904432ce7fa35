"""Probe the padded-lane postprocess design pieces at bs64/416.

 A. relayout cost: [B,S,S,255] -> [B,N,85] reshape+concat (current flat)
    vs [B,S,S,384] -> [B,N,128] (tile-aligned).
 B. fused per-scale score pass on [B,S,S,384] (no flat).
 C. cell gather [B,k,384] from [B,S*S,384] per scale, k=128.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

B = 64
SHAPES = [(13, 13), (26, 26), (52, 52)]


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


raws255 = mk(255)
raws384 = mk(384)

# A. flat materialization
f255 = jax.jit(lambda rs: jnp.concatenate(
    [r.reshape(B, -1, 85) for r in rs], axis=1).astype(jnp.float32).mean())
print(f"A flat255 [B,N,85] : {timeit(f255, raws255):7.3f} ms", flush=True)
f384 = jax.jit(lambda rs: jnp.concatenate(
    [r.reshape(B, -1, 128) for r in rs], axis=1).astype(jnp.float32).mean())
print(f"A flat384 [B,N,128]: {timeit(f384, raws384):7.3f} ms", flush=True)

# B. fused per-scale scores (obj*maxcls), no flat: [B,S,S,384] -> [B, S*S*3]
def scores384(rs):
    outs = []
    for r in rs:
        v = r.reshape(B, -1, 3, 128).astype(jnp.float32)
        obj = v[..., 4]
        clsmax = jnp.max(v[..., 5:85], axis=-1)
        s = jax.nn.sigmoid(obj) * jax.nn.sigmoid(clsmax)
        outs.append(s.reshape(B, -1))
    return jnp.concatenate(outs, axis=1)

fb = jax.jit(lambda rs: scores384(rs).mean())
print(f"B scores384 fused  : {timeit(fb, raws384):7.3f} ms", flush=True)

# B2. current-style scores from flat255
def scores255(rs):
    flat = jnp.concatenate([r.reshape(B, -1, 85) for r in rs], axis=1)
    obj = flat[..., 4].astype(jnp.float32)
    clsmax = jnp.max(flat[..., 5:].astype(jnp.float32), axis=-1)
    return jax.nn.sigmoid(obj) * jax.nn.sigmoid(clsmax)

fb2 = jax.jit(lambda rs: scores255(rs).mean())
print(f"B scores255 (flat) : {timeit(fb2, raws255):7.3f} ms", flush=True)

# C. per-scale cell gather + anchor select, k=128 cells per scale
def gather_cells(rs):
    outs = []
    for r in rs:
        cells = r.reshape(B, -1, 384)
        n = cells.shape[1]
        idx = jnp.arange(128, dtype=jnp.int32)[None, :] % n
        idx = jnp.broadcast_to(idx, (B, 128))
        g = jnp.take_along_axis(cells, idx[..., None], axis=1)  # [B,128,384]
        g = g.reshape(B, 128, 3, 128)
        a = (idx % 3)[..., None, None]
        row = jnp.take_along_axis(g, a, axis=2)[:, :, 0]        # [B,128,128]
        outs.append(row)
    return jnp.concatenate(outs, axis=1).astype(jnp.float32).mean()

fc = jax.jit(gather_cells)
print(f"C cell gather 3x128: {timeit(fc, raws384):7.3f} ms", flush=True)

# D. full pipeline estimate: scores + per-scale topk + gather + decode-ish
def full_fast(rs):
    outs = []
    scs = []
    for r in rs:
        v = r.reshape(B, -1, 3, 128)
        obj = v[..., 4].astype(jnp.float32)
        clsmax = jnp.max(v[..., 5:85].astype(jnp.float32), axis=-1)
        s = (jax.nn.sigmoid(obj) * jax.nn.sigmoid(clsmax)).reshape(B, -1)
        top_s, top_i = jax.lax.top_k(s, 128)                    # per scale
        cells = r.reshape(B, -1, 384)
        g = jnp.take_along_axis(cells, (top_i // 3)[..., None], axis=1)
        g = g.reshape(B, 128, 3, 128)
        row = jnp.take_along_axis(g, (top_i % 3)[..., None, None], axis=2)[:, :, 0]
        outs.append(row.astype(jnp.float32))
        scs.append(top_s)
    rows = jnp.concatenate(outs, axis=1)                        # [B,384,128]
    sc = jnp.concatenate(scs, axis=1)
    bx = jax.nn.sigmoid(rows[..., 0])
    bw = jnp.exp(rows[..., 2])
    cls = jnp.argmax(rows[..., 5:85], axis=-1)
    return (bx + bw).mean() + sc.mean() + cls.astype(jnp.float32).mean()

fd = jax.jit(full_fast)
print(f"D fast pipe (no NMS): {timeit(fd, raws384):7.3f} ms", flush=True)
