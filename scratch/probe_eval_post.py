"""Piecewise profile of the eval-mode postprocess (VERDICT r3 item 8).

Where do the ~130 ms/batch64 of eval postprocess go at 416/80c?
Stages timed (jit chains, differenced n1 vs n2 per CLAUDE.md):

  score   — probs = sigmoid(cls)*obj, mask, reshape to [B, N*C]
  topk    — + exact lax.top_k(4096)
  gather  — + candidate row gather + box decode
  nms     — + nms_sequential (the full eval path)
  nmsfix  — full path but the old [K,K] fixpoint NMS (for the record)

Each chain threads the carry through the input so no iteration hoists.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

sys.path.insert(0, "/root/repo")
from yolo_v3_tpu.ops import postprocess as P
from yolo_v3_tpu.utils.config import YoloConfig
from yolo_v3_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

BS = 64
DIM = 416
config = YoloConfig()
C = config.num_classes


def make_raws(rng):
    shapes = [(13, 13), (26, 26), (52, 52)]
    return [
        jnp.asarray(
            rng.normal(0, 1.5, (BS, h, w, 3 * (5 + C))).astype(np.float32),
            jnp.bfloat16)
        for h, w in shapes
    ]


def stage_fn(stage):
    nA = config.anchors_per_scale
    attrib = 5 + C

    def fn(raws):
        if stage in ("nms", "nmsfix"):
            old = P._SEQ_NMS_MIN_K
            P._SEQ_NMS_MIN_K = 1 << 30 if stage == "nmsfix" else 1024
            try:
                out = P.postprocess_from_raws(
                    raws, config, DIM, config.eval_conf_thr, 0.45,
                    is_eval=True)
            finally:
                P._SEQ_NMS_MIN_K = old
            return out.sum()

        flats = []
        shapes = []
        for raw in raws:
            b, h, w, _ = raw.shape
            flats.append(raw.reshape(b, h * w * nA, attrib))
            shapes.append((h, w))
        flat = jnp.concatenate(flats, axis=1)
        n_total = flat.shape[1]
        obj = jax.nn.sigmoid(flat[..., 4].astype(jnp.float32))
        cls_l = flat[..., 5:].astype(jnp.float32)
        probs = jax.nn.sigmoid(cls_l) * obj[..., None]
        score_flat = jnp.where(probs > config.eval_conf_thr, probs,
                               0.0).reshape(BS, n_total * C)
        if stage == "score":
            return score_flat.sum()
        k = min(config.eval_pre_nms_topk, n_total * C)
        top_score, top_pair = lax.top_k(score_flat, k)
        if stage == "topk":
            return top_score.sum()
        top_pair = top_pair.astype(jnp.int32)
        top_i = top_pair // C
        rows = jnp.take_along_axis(flat, top_i[..., None],
                                   axis=1).astype(jnp.float32)
        if stage == "gather":
            return rows.sum() + top_score.sum()
        raise ValueError(stage)

    return fn


def timed(fn, raws, n):
    @jax.jit
    def chain(raws):
        def body(i, carry):
            rs, acc = carry
            v = fn(rs)
            tweak = (v > 1e18).astype(jnp.bfloat16)
            rs = [r.at[0, 0, 0, 0].add(tweak) for r in rs]
            return (rs, acc + v.astype(jnp.float32))
        _, acc = lax.fori_loop(0, n, body, (raws, jnp.float32(0)))
        return acc

    t0 = time.perf_counter()
    np.asarray(chain(raws))
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    np.asarray(chain(raws))
    return time.perf_counter() - t0, c


def main():
    rng = np.random.default_rng(0)
    raws = make_raws(rng)
    for stage in ("score", "topk", "gather", "nms", "nmsfix"):
        t2, c = timed(stage_fn(stage), raws, 2)
        t8, _ = timed(stage_fn(stage), raws, 8)
        per = (t8 - t2) / 6.0
        print(f"{stage:7s} per-call {per*1e3:8.2f} ms  "
              f"(t2 {t2*1e3:.0f} t8 {t8*1e3:.0f} compile {c:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
