"""Entry-path variants in int8, bs64@416 (perf only, dummy scales):
A plain convs / B s2d remap (current) / C s2d + depth-to-space + plain down1
/ D plain bf16 entry for reference."""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, inputs, iters=40):
    sync(fn(inputs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


B = 64
rng = np.random.default_rng(0)
gen = jax.jit(lambda k: (jax.random.uniform(k, (B, 416, 416, 3)) * 254 - 127)
              .astype(jnp.int8))
xs = [gen(jax.random.PRNGKey(i)) for i in range(2)]


def i8w(*shape):
    return jnp.asarray(rng.integers(-60, 60, shape, dtype=np.int8))


def conv(x, w, stride=1, pad=None, out_int8=True):
    ks = w.shape[0]
    if pad is None:
        p = (ks - 1) // 2
        pad = ((p, p), (p, p))
    acc = lax.conv_general_dilated(x, w, (stride, stride), pad,
                                   dimension_numbers=_DN,
                                   preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * 0.01
    y = jnp.where(y > 0, y, 0.1 * y)
    if out_int8:
        return jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
    return y.astype(jnp.bfloat16)


w_stem = i8w(3, 3, 3, 32)
w_d0 = i8w(3, 3, 32, 64)
w_r1 = i8w(1, 1, 64, 32)
w_r2 = i8w(3, 3, 32, 64)
w_d1 = i8w(3, 3, 64, 128)


def plain(x):
    y = conv(x, w_stem)
    y = conv(y, w_d0, stride=2)
    r = conv(y, w_r1)
    r = conv(r, w_r2)
    y = jnp.clip(y.astype(jnp.int32) + r.astype(jnp.int32), -127, 127).astype(jnp.int8)
    y = conv(y, w_d1, stride=2)
    return y.astype(jnp.int32).sum()


ws_stem = i8w(3, 3, 12, 128)
ws_d0 = i8w(3, 3, 128, 256)
ws_r1 = i8w(1, 1, 256, 128)
ws_r2 = i8w(3, 3, 128, 256)
ws_d1 = i8w(2, 2, 1024, 128)


def s2d2(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def d2s2(x):
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, 2, 2, c // 4).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h, 2 * w, c // 4)


def s2d_entry(x):
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xb = s2d2(xp)
    y = conv(xb, ws_stem, pad=((0, 0), (0, 0)))
    y = conv(y, ws_d0, stride=2, pad=((1, 1), (1, 1)))
    r = conv(y, ws_r1, pad=((0, 0), (0, 0)))
    r = conv(r, ws_r2, pad=((1, 1), (1, 1)))
    y = jnp.clip(y.astype(jnp.int32) + r.astype(jnp.int32), -127, 127).astype(jnp.int8)
    # s2d of [104,104,256*?]... current exit: big sparse 2x2 conv
    ys = s2d2(y)                       # [104,104,1024]? y is [104,104,256]->52?
    return ys


def s2d_exit_conv(x):
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xb = s2d2(xp)
    y = conv(xb, ws_stem, pad=((0, 0), (0, 0)))            # [208+?,..,128]
    y = conv(y, ws_d0, stride=2, pad=((1, 1), (1, 1)))     # [104,..,256]
    r = conv(y, ws_r1, pad=((0, 0), (0, 0)))
    r = conv(r, ws_r2, pad=((1, 1), (1, 1)))
    y = jnp.clip(y.astype(jnp.int32) + r.astype(jnp.int32), -127, 127).astype(jnp.int8)
    y = conv(y, ws_d1, pad=((1, 0), (1, 0)))               # exit 2x2 sparse
    return y.astype(jnp.int32).sum()


def s2d_d2s_plain_down(x):
    xp = jnp.pad(x, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xb = s2d2(xp)
    y = conv(xb, ws_stem, pad=((0, 0), (0, 0)))
    y = conv(y, ws_d0, stride=2, pad=((1, 1), (1, 1)))
    r = conv(y, ws_r1, pad=((0, 0), (0, 0)))
    r = conv(r, ws_r2, pad=((1, 1), (1, 1)))
    y = jnp.clip(y.astype(jnp.int32) + r.astype(jnp.int32), -127, 127).astype(jnp.int8)
    y = d2s2(y)[:, 1:209, 1:209, :]    # native [208,208,64]
    y = conv(y, w_d1, stride=2)        # plain down1
    return y.astype(jnp.int32).sum()


for name, f in [("A plain int8", plain),
                ("B s2d int8 (current)", s2d_exit_conv),
                ("C s2d + d2s + plain down1", s2d_d2s_plain_down)]:
    try:
        ms = timeit(jax.jit(f), xs)
        print(f"{name:28s}: {ms:7.3f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAIL {str(e)[:120]}", flush=True)

# bf16 plain entry reference
xbfs = [x.astype(jnp.bfloat16) for x in xs]
wb = {k: (jnp.asarray(rng.standard_normal(w.shape, dtype=np.float32)) * .05).astype(jnp.bfloat16)
      for k, w in [("stem", w_stem), ("d0", w_d0), ("r1", w_r1), ("r2", w_r2), ("d1", w_d1)]}


def plain_bf(x):
    def c(x, w, s=1):
        p = (w.shape[0] - 1) // 2
        y = lax.conv_general_dilated(x, w, (s, s), ((p, p), (p, p)),
                                     dimension_numbers=_DN,
                                     preferred_element_type=jnp.float32)
        return jnp.where(y > 0, y, 0.1 * y).astype(jnp.bfloat16)
    y = c(x, wb["stem"])
    y = c(y, wb["d0"], 2)
    r = c(y, wb["r1"])
    r = c(r, wb["r2"])
    y = (y.astype(jnp.float32) + r.astype(jnp.float32)).astype(jnp.bfloat16)
    y = c(y, wb["d1"], 2)
    return y.astype(jnp.float32).sum()


ms = timeit(jax.jit(plain_bf), xbfs)
print(f"{'D plain bf16':28s}: {ms:7.3f} ms", flush=True)
