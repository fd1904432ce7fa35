"""Training orchestration: the host loop around the compiled step.

Equivalent of the reference ``train``/``train_impl`` (reference
train.py:21-102), reshaped for TPU execution: instead of one forward/backward
per mini-batch with Python-side accumulation, the host groups
``net_subdivisions`` consecutive mini-batches into one [S, B, ...] net-batch
array and launches a single compiled step (scan over subdivisions +
optimizer update).  Multi-scale training works through a per-dim jit cache —
one compiled executable per input resolution (SURVEY.md §2.3 bucketing
plan).

Checkpointing, resume, recorder, and progress reporting follow the reference
contract (train.py:24-28, 86-88).
"""

from __future__ import annotations

import os
import signal
import sys
import threading
import time
from typing import Callable, Dict, Optional

# Per-net-batch stage timing (data assembly / step dispatch / stats drain),
# logged through log_fn when YOLO_TPU_TRAIN_TIMING=1.  Zero-cost when off.
_TRAIN_TIMING = os.environ.get("YOLO_TPU_TRAIN_TIMING", "") == "1"

import numpy as np
import jax
import jax.numpy as jnp

from yolo_v3_tpu.train.checkpoint import save_checkpoint
from yolo_v3_tpu.train.optimizer import make_optimizer
from yolo_v3_tpu.train.recorder import Recorder
from yolo_v3_tpu.train.step import make_train_step
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig

# Process-level (optimizer, compiled step) cache.  ``make_train_step`` wraps
# a fresh closure in ``jax.jit`` every call, so without this, every
# ``train()`` invocation recompiles the full fwd+bwd+update XLA program even
# for identical configs — tens of seconds per call on the CPU test mesh,
# and a real cost in train-eval-train workflows on chip.  Keyed by the
# hashable frozen configs + the params tree structure (the optimizer's
# group labels and the step's gradient tree depend only on structure).
_STEP_CACHE: Dict = {}

# Stats from the compiled step come back as a dict of device scalars; on the
# real chip each scalar readback is a full tunnel round-trip (30-70 ms), so
# reading 9 of them per net-batch costs more than the step itself at small
# batch.  Pack them into ONE device vector (one jitted op, one dispatch) and
# read that back with a single transfer.
_PACK_CACHE: Dict = {}


def _pack_stats(stats: Dict) -> tuple:
    keys = tuple(sorted(stats))
    pack = _PACK_CACHE.get(keys)
    if pack is None:
        pack = jax.jit(
            lambda s: jnp.stack([s[k].astype(jnp.float32) for k in keys])
        )
        _PACK_CACHE[keys] = pack
    return keys, pack(stats)


class _PendingStats:
    """One in-flight net-batch's metadata: the packed device stats plus the
    host-side context needed to log it.  Draining (the host readback that
    actually waits on the device) happens one net-batch late, so host-side
    sample assembly for net-batch N+1 overlaps device execution of N."""

    def __init__(self, stats, net_batch, epoch, dim, n_imgs):
        self.keys, self.packed = _pack_stats(stats)
        self.net_batch, self.epoch, self.dim = net_batch, epoch, dim
        self.n_imgs = n_imgs

    def drain(self, recorder, log_fn):
        vals = np.asarray(self.packed)          # ONE host readback
        host = dict(zip(self.keys, (float(v) for v in vals)))
        recorder.on_batch_end(host, self.n_imgs)
        log_fn(
            f"net_batch {self.net_batch} epoch {self.epoch} "
            f"dim {self.dim} {recorder.stats_row()}"
        )


def _optimizer_and_step(params, config: YoloConfig, tcfg: TrainConfig):
    key = (config, tcfg, jax.tree.structure(params))
    hit = _STEP_CACHE.get(key)
    if hit is None:
        compute_dtype = (
            jnp.bfloat16 if tcfg.compute_dtype == "bfloat16" else jnp.float32
        )
        tx = make_optimizer(params, tcfg)
        hit = (tx, make_train_step(config, tx, compute_dtype=compute_dtype,
                                   remat=tcfg.remat,
                                   s2d_entry=tcfg.s2d_entry))
        _STEP_CACHE[key] = hit
    return hit


def train(
    data,
    params,
    state,
    config: YoloConfig,
    tcfg: TrainConfig,
    recorder: Optional[Recorder] = None,
    model_id: str = "test",
    weight_dir: Optional[str] = None,
    checkpoint: Optional[Dict] = None,
    checkpoint_interval: int = 1,
    mesh=None,
    log_fn: Callable[[str], None] = lambda s: print(s, file=sys.stderr),
    pipeline_stats: bool = False,
):
    """Run training until ``data`` is exhausted (reference train.py:21-102).

    ``data`` is a DataHelper; ``mesh`` (optional) shards net-batches over the
    ``data`` axis for multi-chip runs.  Returns (params, state, opt_state,
    recorder).

    Graceful preemption: SIGTERM/SIGINT during the run sets a flag; the loop
    finishes the in-flight net-batch, saves a checkpoint, and returns.  The
    device client is never torn down mid-compile/mid-step (which wedges this
    environment's TPU tunnel), and a ``--resume`` run continues the curve
    exactly where the kill landed (resume==one-go is the reference's
    Deterministic_data_loading contract, README.md:58-65).
    """
    recorder = recorder or Recorder()

    preempted = threading.Event()
    prev_handlers = {}
    if threading.current_thread() is threading.main_thread():
        def _on_signal(signum, frame):
            log_fn(f"[preempt] signal {signum}: will checkpoint at the next "
                   "net-batch boundary and exit")
            preempted.set()

        for sig in (signal.SIGTERM, signal.SIGINT):
            prev_handlers[sig] = signal.signal(sig, _on_signal)
    tx, step = _optimizer_and_step(params, config, tcfg)
    opt_state = tx.init(params)

    if checkpoint is not None:
        data.load_state_dict(checkpoint["data"])
        params = checkpoint["params"]
        state = checkpoint["state"]
        opt_state = jax.tree.map(jnp.asarray, checkpoint["opt_state"])
        if checkpoint["recorder"] is not None:
            recorder.load_state_dict(checkpoint["recorder"])
        if mesh is not None and checkpoint.get("mesh_shape") is not None:
            from yolo_v3_tpu.parallel.distributed import assert_mesh_compatible

            assert_mesh_compatible(mesh, checkpoint["mesh_shape"])

    if mesh is not None:
        from yolo_v3_tpu.parallel import mesh as M

        params = M.replicate(mesh, params)
        state = M.replicate(mesh, state)
        opt_state = M.replicate(mesh, opt_state)

    S = data.net_subdivisions

    micro_imgs, micro_labels = [], []
    pending: Optional[_PendingStats] = None
    last_ckpt_batch = batch = -1
    t_start = time.time()
    t_mark = time.time()
    for sample in data:
        micro_imgs.append(sample["img"])
        micro_labels.append(sample["label"])
        batch = data.get_batch()

        if len(micro_imgs) == S:
            dims = {m.shape for m in micro_imgs}
            if len(dims) != 1:
                raise ValueError(
                    "multi-scale dim changed mid-net-batch "
                    f"({sorted(dims)}); set the sampler's rand_dim_interval "
                    "to a multiple of batch_size * net_subdivisions"
                )
            imgs = np.stack(micro_imgs)
            # uint8 rides to the device as-is (the step normalizes on
            # device); anything else is finalized to float32 here.
            if imgs.dtype not in (np.float32, np.uint8):
                imgs = imgs.astype(np.float32)
            labels = np.stack(micro_labels)
            if labels.dtype != np.float32:
                labels = labels.astype(np.float32)
            micro_imgs, micro_labels = [], []

            if mesh is not None:
                from yolo_v3_tpu.parallel import mesh as M

                imgs, labels = M.shard_train_inputs(mesh, imgs, labels)

            t_data_done = time.time()
            params, state, opt_state, stats = step(
                params, state, opt_state, imgs, labels
            )
            t_dispatch_done = time.time()

            # Stats come back as ONE packed device vector = one readback
            # RTT instead of nine.  By default the drain happens right here
            # (synchronous): the per-net-batch sync is the backpressure that
            # lets this environment's tunnel client reclaim each step's
            # host-side input buffers — measured un-synced, RSS grows
            # ~650 MB per bs64x4 net-batch (every imgs stack retained) and
            # the dispatch rate degrades 2-4x as the run ages.
            # ``pipeline_stats=True`` drains one net-batch late instead, so
            # host sample assembly overlaps device execution — worth it only
            # where transfers are locally reclaimed (real multi-chip hosts).
            if pending is not None:
                pending.drain(recorder, log_fn)
            pending = _PendingStats(
                stats, data.get_net_batch(), data.get_epoch(),
                imgs.shape[2], imgs.shape[0] * imgs.shape[1],
            )
            if not pipeline_stats:
                pending.drain(recorder, log_fn)
                pending = None
            if _TRAIN_TIMING:
                now = time.time()
                log_fn(
                    f"[timing] nb {data.get_net_batch()}: "
                    f"data {t_data_done - t_mark:.2f}s "
                    f"dispatch {t_dispatch_done - t_data_done:.2f}s "
                    f"drain {now - t_dispatch_done:.2f}s "
                    f"total {now - t_mark:.2f}s"
                )
                t_mark = now

            # Checkpoint every checkpoint_interval net-batches; batch+1 is
            # always S-aligned here (the scan step consumes S mini-batches).
            # The recorder must be current at save time, so drain first.
            if weight_dir is not None and (
                preempted.is_set()
                or (batch + 1) % (S * checkpoint_interval) == 0
            ):
                if pending is not None:
                    pending.drain(recorder, log_fn)
                    pending = None
                save_checkpoint(
                    data, params, state, opt_state, recorder, model_id,
                    weight_dir,
                    mesh_shape=(mesh.devices.shape if mesh is not None
                                else None),
                )
                last_ckpt_batch = batch

            if preempted.is_set():
                if pending is not None:
                    pending.drain(recorder, log_fn)
                    pending = None
                log_fn(f"[preempt] checkpointed at net_batch "
                       f"{recorder.net_batches_seen}; exiting")
                break

        if data.is_end_of_epoch():
            recorder.on_epoch_end()

    if pending is not None:
        pending.drain(recorder, log_fn)

    # Always leave a checkpoint of the FINAL state: the reference saves
    # final weights when training ends (train.py's post-loop save), and a
    # run whose length isn't interval-aligned must not lose its tail.
    # Compare against the in-loop batch counter: DataHelper's current_batch
    # advances one past the last yielded micro-batch on exhaustion.
    if (weight_dir is not None and last_ckpt_batch != batch
            and micro_imgs == [] and batch >= 0):
        save_checkpoint(
            data, params, state, opt_state, recorder, model_id, weight_dir,
            mesh_shape=(mesh.devices.shape if mesh is not None else None),
        )
        log_fn(f"[finish] final checkpoint at net_batch "
               f"{recorder.net_batches_seen}")

    for sig, h in prev_handlers.items():
        signal.signal(sig, h)

    log_fn(
        f"[finish] net_batch {data.get_net_batch()} batch {data.get_batch()} "
        f"({time.time() - t_start:.1f}s)"
    )
    return params, state, opt_state, recorder
