"""Robust differenced measurement for the axon tunnel: min-of-reps totals,
adaptive chain length so device work >> dispatch noise."""
import time
import numpy as np, jax
from jax import tree

def sync(x): return np.asarray(tree.leaves(x)[0].ravel()[0:1])

def _total(fn, x, n, reps):
    import jax
    @jax.jit
    def loop(v):
        for _ in range(n):
            v = fn(v)
        return v
    sync(loop(x))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); sync(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best

def measure(fn, x, target_s=0.25, reps=3):
    t16 = _total(fn, x, 16, 2)
    est = max(t16 / 16, 1e-5)
    n2 = max(24, int(target_s / est))
    n2 = min(n2, 1024)
    n1 = max(4, n2 // 4)
    t1 = _total(fn, x, n1, reps)
    t2 = _total(fn, x, n2, reps)
    return (t2 - t1) / (n2 - n1)
