"""Fused entry megakernel vs XLA int8 s2d entry at 416/bs64 on the chip."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.ops import entry_kernel as EK


def sync(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[0:1])


def timeit(fn, inputs, iters=30):
    sync(fn(inputs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


params, state = D.init_yolonet(jax.random.PRNGKey(0), 80)
rng = np.random.default_rng(0)
calib = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
q = Q.build_quantized(params, state, calib)
sc = q["scales"]
res_scale = sc["s2d/down0"] / sc["s2d/res0_2"]

B = 64
gen = jax.jit(lambda k: jax.random.uniform(k, (B, 416, 416, 3), jnp.float32))
xs = [gen(jax.random.PRNGKey(i)) for i in range(2)]

mk_xb = jax.jit(lambda x: D._space_to_depth2(
    jnp.pad(Q.quantize_image(x, sc["image"]), ((0, 0), (1, 3), (1, 3), (0, 0)))
))
xbs = [mk_xb(x) for x in xs]

def xla_entry(xb):
    sp = q["s2d"]
    y = Q._conv_i8(sp["stem"], xb, padding=((0, 0), (0, 0)))
    y = Q._conv_i8(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
    r = Q._conv_i8(sp["res0_1"], y, padding=((0, 0), (0, 0)))
    r = Q._conv_i8(sp["res0_2"], r, padding=((1, 1), (1, 1)), residual=y,
                   res_scale=res_scale)
    y = Q._conv_i8(sp["down1"], r, padding=((1, 0), (1, 0)))
    return y.astype(jnp.int32).sum()

ms = timeit(jax.jit(xla_entry), xbs)
print(f"XLA s2d entry            : {ms:7.3f} ms", flush=True)

for band in (13, 26, 52):
    try:
        f = jax.jit(lambda xb, band=band: EK.fused_entry(
            xb, q["s2d"], res_scale, band=band).astype(jnp.int32).sum())
        ms = timeit(f, xbs)
        print(f"fused entry band={band:3d}     : {ms:7.3f} ms", flush=True)
    except Exception as e:
        print(f"fused entry band={band}: FAIL {str(e)[:130]}", flush=True)
