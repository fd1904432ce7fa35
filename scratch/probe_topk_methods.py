"""Selection-method A/B for the eval-mode top-k (the 107 of 131 ms).

Workload: scores [64, 851760] f32 (=10647 boxes x 80 classes at 416),
k=4096.  Methods:

  topk      — lax.top_k (shipping)
  topk_bf16 — lax.top_k on bf16 keys (half the sort bytes; reorders ties)
  approx95/99/100 — lax.approx_max_k at recall targets .95/.99/1.0
  2stage    — exact under the "<=4096 boxes clear conf on objectness"
              bound: top_k over per-box max-prob [64, 10647] picks the
              4096 candidate boxes, then top_k over their [64, 4096*80]
              pair scores.  Stage-1 key = obj*sigmoid(max cls logit)
              >= any pair score of that box, so no contributing box is
              ever dropped while <=4096 boxes contribute.

Prints per-call differenced ms + top-score-sum agreement vs exact.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

B, N, C, K = 64, 10647, 80, 4096


def methods():
    def m_topk(probs):
        s = probs.reshape(B, N * C)
        v, i = lax.top_k(s, K)
        return v, i

    def m_topk_bf16(probs):
        s = probs.reshape(B, N * C).astype(jnp.bfloat16)
        v, i = lax.top_k(s, K)
        return v.astype(jnp.float32), i

    def mk_approx(recall):
        def f(probs):
            s = probs.reshape(B, N * C)
            v, i = lax.approx_max_k(s, K, recall_target=recall)
            return v, i
        return f

    def m_2stage(probs):
        box_key = jnp.max(probs, axis=-1)                # [B, N]
        _, bi = lax.top_k(box_key, K)                    # [B, K] box ids
        sub = jnp.take_along_axis(probs, bi[..., None], axis=1)  # [B,K,C]
        v, pi = lax.top_k(sub.reshape(B, K * C), K)
        box = jnp.take_along_axis(bi, pi // C, axis=1)
        pair = box * C + pi % C
        return v, pair

    return [("topk", m_topk), ("topk_bf16", m_topk_bf16),
            ("approx95", mk_approx(0.95)), ("approx99", mk_approx(0.99)),
            ("approx100", mk_approx(1.0)), ("2stage", m_2stage)]


def timed(fn, x, n):
    @jax.jit
    def chain(x):
        def body(i, carry):
            xx, acc = carry
            v, idx = fn(xx)
            t = (v[0, 0] > 1e18).astype(jnp.float32)
            xx = xx.at[0, 0, 0].add(t)
            return (xx, acc + v.sum())
        _, acc = lax.fori_loop(0, n, body, (x, jnp.float32(0)))
        return acc

    t0 = time.perf_counter()
    np.asarray(chain(x))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain(x))
    return time.perf_counter() - t0, c


def main():
    rng = np.random.default_rng(0)
    # heavy-tailed scores like real obj*cls products: most ~0, some high
    raw = rng.normal(-3.0, 2.0, (B, N, C)).astype(np.float32)
    probs = jnp.asarray(1.0 / (1.0 + np.exp(-raw)))

    exact_v = None
    for name, fn in methods():
        v, i = jax.jit(fn)(probs)
        v = np.asarray(v, np.float32)
        if exact_v is None:
            exact_v = v
            miss = 0.0
        else:
            # recall proxy: sum of selected scores vs exact top-k sum
            miss = 1.0 - v.sum() / exact_v.sum()
        t2, c = timed(fn, probs, 2)
        t8, _ = timed(fn, probs, 8)
        per = (t8 - t2) / 6.0
        print(f"{name:10s} per-call {per*1e3:8.2f} ms  score-miss "
              f"{miss:.2e}  (compile {c:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
