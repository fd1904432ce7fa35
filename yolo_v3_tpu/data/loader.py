"""DataHelper: resumable batch iteration over scheduler + dataset.

Equivalent of the reference DataHelper (reference dataset.py:326-400): wraps
a :class:`CyclicSampler` and a dataset into a batch iterator that

* counts ``current_batch`` (mini-batches) with ``max_net_batches *
  net_subdivisions = max_batches`` semantics (dataset.py:337-343),
* re-``randomize``s the schedule at epoch boundaries (dataset.py:352-359),
* checkpoints as {current_batch, sampler state} and fast-forwards on
  restore via ``trimm`` — no replay (dataset.py:361-372),
* exposes batch/net-batch/epoch accessors (dataset.py:379-399).

Batches are ready-to-device numpy arrays: imgs [B, H, W, 3] float32 NHWC
(all samples in a batch share one multi-scale dim by construction — the
dims queue holds a dim for ``rand_dim_interval`` consecutive samples) and
labels [B, max_labels, 5].  A background prefetch thread (host pipeline)
overlaps input assembly with device compute.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from yolo_v3_tpu.data.sampler import CyclicSampler

# --- multiprocess sample assembly -------------------------------------------
# The per-sample work (JPEG decode + cv2 HSV/jitter/letterbox) is pure
# host-CPU and fully determined by (base_idx, dim, seed), so it parallelizes
# across processes without any determinism loss — the TPU equivalent of the
# reference's DataLoader worker processes (reference dataset.py:461-465,
# whose worker_init_fn reseeding exists only because imgaug uses global RNG;
# here seeds ride in the schedule, so workers need no reseeding at all).
#
# Workers are forked (trans_fn closures aren't picklable) and receive the
# dataset by fork inheritance; they only run numpy/cv2 — never JAX.

_WORKER_DS = None
_WORKER_DROP: tuple = ()


def _pool_init(dataset, drop_keys):
    global _WORKER_DS, _WORKER_DROP
    _WORKER_DS = dataset
    _WORKER_DROP = drop_keys
    try:
        import cv2

        cv2.setNumThreads(0)  # one cv2 thread per worker process
    except ImportError:
        pass


def _pool_get(task):
    base_idx, dim, seed = task
    s = _WORKER_DS.get(base_idx, dim, seed)
    for k in _WORKER_DROP:
        s.pop(k, None)
    return s


def collate(samples: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack same-shaped fields, keep ragged ones as lists, all-None -> None
    (the reference's variable_shape_collate_fn contract,
    dataset.py:408-458)."""
    out: Dict[str, Any] = {}
    keys = samples[0].keys()
    for k in keys:
        vals = [s.get(k) for s in samples]
        if all(v is None for v in vals):
            out[k] = None
        elif all(isinstance(v, np.ndarray) for v in vals):
            same = all(v.shape == vals[0].shape for v in vals)
            out[k] = np.stack(vals) if same else vals
        else:
            out[k] = vals
    return out


class DataHelper:
    def __init__(
        self,
        dataset,
        sampler: CyclicSampler,
        current_batch: int = 0,
        max_net_batches: Optional[int] = None,
        max_batches: Optional[int] = None,
        net_subdivisions: int = 1,
        prefetch: int = 2,
        drop_keys: tuple = ("rng",),
        host_id: int = 0,
        n_hosts: int = 1,
        num_workers: int = 0,
        native_threads: int = 0,
    ):
        """``host_id``/``n_hosts`` shard each (deterministically scheduled)
        batch across hosts for multi-host data parallelism: every host runs
        the same seed and schedule, and host h assembles contiguous slice h
        of each global batch — the global batch is the concatenation of the
        host shards, and per-sample seeds/dims stay identical to the
        single-host run (the reference's determinism contract extended to a
        slice, SURVEY.md §2.3)."""
        assert sampler.batch_size % n_hosts == 0, (
            f"batch_size {sampler.batch_size} not divisible by {n_hosts} hosts"
        )
        self.host_id = host_id
        self.n_hosts = n_hosts
        self.dataset = dataset
        self.sampler = sampler
        self.batch_size = sampler.batch_size
        self.current_batch = current_batch
        self.net_subdivisions = net_subdivisions
        self.prefetch = prefetch
        self.drop_keys = drop_keys
        self.num_workers = num_workers
        self.native_threads = native_threads
        self._pool = None
        self._native = None
        self._native_disabled = native_threads <= 0
        self._spec_cache: Dict[Any, Any] = {}

        if max_net_batches is not None:
            self.max_net_batches = max_net_batches
            self.max_batches = max_net_batches * net_subdivisions
        elif max_batches is not None:
            self.max_batches = max_batches
        else:
            self.max_batches = sampler.indices_batch
        self._iterator: Optional[Iterator] = None

    # -- iteration ---------------------------------------------------------

    def _get_pool(self):
        if self._pool is None and self.num_workers > 0:
            import multiprocessing

            ctx = multiprocessing.get_context("fork")
            self._pool = ctx.Pool(
                self.num_workers,
                initializer=_pool_init,
                initargs=(self.dataset, tuple(self.drop_keys)),
            )
        return self._pool

    def close(self) -> None:
        """Shut down the worker pool / native loader (idempotent)."""
        if self._pool is not None:
            self._pool.terminate()
            self._pool.join()
            self._pool = None
        if self._native is not None:
            self._native.close()
            self._native = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _native_assemble(self, tasks) -> Optional[Dict[str, Any]]:
        """Assemble a batch on the C++ decode+augment pool
        (data/native_aug.py) — bit-identical labels/randomness to the
        Python path.  Returns None (and disables itself where the cause is
        permanent) when the dataset/transform/toolchain can't take the
        native path; non-JPEG samples fall back individually."""
        if self._native_disabled:
            return None
        ds = self.dataset
        if not hasattr(ds, "raw_entry") or getattr(ds, "trans_fn", None) is None:
            self._native_disabled = True
            return None
        if len({t[1] for t in tasks}) != 1:
            return None  # mixed dims in one shard: not by construction, bail
        dim = tasks[0][1]
        from yolo_v3_tpu.data import native_aug as NA

        if dim not in self._spec_cache:
            self._spec_cache[dim] = NA.compile_transform(ds.trans_fn(dim))
        spec = self._spec_cache[dim]
        if spec is None:
            self._native_disabled = True  # not the darknet training chain
            return None
        if self._native is None:
            try:
                self._native = NA.NativeAugLoader(self.native_threads)
            except RuntimeError:  # toolchain/libjpeg unavailable
                self._native_disabled = True
                return None
        entries = [ds.raw_entry(t[0]) for t in tasks]
        samples, ok = self._native.load_batch(
            [e[0] for e in entries], [e[1] for e in entries],
            [t[2] for t in tasks], dim, spec,
        )
        keep = ("img", "label", "lb_reverter", "img_path")
        for i, (base_idx, d, seed) in enumerate(tasks):
            if not ok[i]:
                s = ds.get(base_idx, d, seed)
                samples[i] = {k: s.get(k) for k in keep}
        return collate(samples)

    def _assemble(self, positions: List[int]) -> Dict[str, Any]:
        tasks = [self.sampler.schedule(pos) for pos in positions]
        batch = self._native_assemble(tasks)
        if batch is not None:
            return batch
        pool = self._get_pool()
        if pool is not None:
            samples = pool.map(_pool_get, tasks, chunksize=1)
        else:
            samples = []
            for base_idx, dim, seed in tasks:
                s = self.dataset.get(base_idx, dim, seed)
                for k in self.drop_keys:
                    s.pop(k, None)
                samples.append(s)
        return collate(samples)

    def _epoch_batches(self) -> Iterator[Dict[str, Any]]:
        n = len(self.sampler) // self.batch_size
        shard = self.batch_size // self.n_hosts
        for b in range(n):
            start = b * self.batch_size + self.host_id * shard
            yield self._assemble(list(range(start, start + shard)))

    def _gen(self) -> Iterator[Dict[str, Any]]:
        while self.current_batch < self.max_batches:
            produced = False
            for batch in self._prefetched(self._epoch_batches()):
                produced = True
                yield batch
                self.current_batch += 1
                if self.current_batch >= self.max_batches:
                    return
            self.sampler.randomize()
            if not produced and len(self.sampler) < self.batch_size:
                raise RuntimeError("sampler cannot fill a single batch")

    def _prefetched(self, it: Iterator) -> Iterator:
        if self.prefetch <= 0:
            yield from it
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        done = object()
        err: List[BaseException] = []

        def worker():
            try:
                for item in it:
                    q.put(item)
            except BaseException as e:  # surface worker errors to consumer
                err.append(e)
            finally:
                q.put(done)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is done:
                if err:
                    raise err[0]
                return
            yield item

    def __iter__(self):
        if self._iterator is None:
            self._iterator = iter(self._gen())
        return self._iterator

    def reset(self) -> "DataHelper":
        self._iterator = None
        self.current_batch = 0
        return self

    # -- resume (dataset.py:361-372) --------------------------------------

    def state_dict(self) -> Dict[str, Any]:
        return {
            "current_batch": self.current_batch,
            "sampler": self.sampler.state_dict(),
        }

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        self._iterator = None
        self.current_batch = sd["current_batch"] + 1
        self.sampler.load_state_dict(sd["sampler"])
        self.sampler.trimm(batch_idx=self.current_batch)

    # -- accessors (dataset.py:379-399) ------------------------------------

    def get_batch(self) -> int:
        return self.current_batch

    def get_net_batch(self) -> int:
        return self.current_batch // self.net_subdivisions

    def get_epoch_num_batches(self) -> int:
        return self.sampler.indices_batch

    def get_epoch(self) -> int:
        return self.current_batch // self.get_epoch_num_batches()

    def get_epoch_batch(self) -> int:
        return self.current_batch % self.get_epoch_num_batches()

    def is_start_of_epoch(self) -> bool:
        return self.current_batch % self.get_epoch_num_batches() == 0

    def is_end_of_epoch(self) -> bool:
        return (self.current_batch + 1) % self.get_epoch_num_batches() == 0
