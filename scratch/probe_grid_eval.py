"""Round-5 probe: eval-mode postprocess — fused grid NMS vs truncated top-k.

Measures (bench.py methodology: jit whole programs, readback-synced,
20-iter loops so dispatch pipelining amortizes):

* whole-program eval-mode int8-u8 e2e bs64 with eval_grid_nms on/off,
* dense-scene standalone postprocess (grid vs truncated) at bench shapes.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scratch/probe_grid_eval.py
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.ops.postprocess import postprocess, postprocess_from_raws
from yolo_v3_tpu.utils import chiplock
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

sys.path.insert(0, "/root/repo/scratch")
enable_compilation_cache()


def _sync(tree):
    return np.asarray(jax.tree.leaves(tree)[0].ravel()[0:1])


def timeit(fn, inputs, iters=20):
    _sync(fn(inputs[0]))
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(inputs[i % len(inputs)])
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    chiplock.acquire("probe_grid_eval")
    import bench as BM  # reuse _dense_scenes

    cfg_grid = YoloConfig()                      # eval_grid_nms=True default
    cfg_old = YoloConfig(eval_grid_nms=False)
    params, state = D.init_yolonet(jax.random.PRNGKey(0), cfg_grid.num_classes)
    rng = np.random.default_rng(0)
    calib = jnp.asarray(rng.uniform(0, 1, (2, 416, 416, 3)).astype(np.float32))
    qtree = Q.build_quantized(params, state, calib)
    print("calibrated", flush=True)

    xs_u8 = [jax.jit(lambda k: jax.random.randint(
        k, (64, 416, 416, 3), 0, 256, jnp.uint8))(jax.random.PRNGKey(i))
        for i in range(2)]

    for name, cfg in (("grid", cfg_grid), ("trunc", cfg_old)):
        f = jax.jit(lambda u, c=cfg: postprocess_from_raws(
            Q.apply_yolonet_quantized_u8(qtree, u), c, 416,
            c.eval_conf_thr, 0.45, is_eval=True))
        ms = timeit(f, xs_u8, iters=10)
        print(f"eval e2e bs64 [{name}]: {ms:.2f} ms "
              f"({64 / ms * 1e3:.1f} imgs/s)", flush=True)

    dense = jnp.asarray(BM._dense_scenes(64, n=3000, c=80))
    for name, extra in (("grid", dict(grid_nms=True)), ("trunc", {})):
        f = jax.jit(functools.partial(
            postprocess, num_classes=80, conf_thr=0.005, nms_thr=0.45,
            is_eval=True, pre_nms_topk=4096, **extra))
        es = sorted(timeit(f, [dense], iters=5) for _ in range(3))
        print(f"dense eval NMS bs64 [{name}]: p50 {es[1]:.2f} ms", flush=True)

    chiplock.release()


if __name__ == "__main__":
    main()
