"""Multi-host bootstrap: process init + process-aware mesh + data sharding.

The reference is single-process/single-GPU (SURVEY.md §2.3); multi-host
scaling here is TPU-native: every host runs the same program, JAX's
distributed runtime stitches the per-host local devices into one global
device set, the mesh spans all of them, and the deterministic data
scheduler hands each host its contiguous shard of every global batch
(`DataHelper(host_id, n_hosts)` — the shards concatenate to the exact
single-host batch, so determinism and resume carry over unchanged).

Usage on each host of a slice::

    from yolo_v3_tpu.parallel import distributed as dist

    ctx = dist.initialize()                 # no-op on a single process
    mesh = dist.make_global_mesh(space=1)
    data = dist.make_data_helper(dataset, sampler, ctx, ...)
    # train exactly as on one host; shard_train_inputs handles placement

Checkpoint contract: `save_checkpoint(..., mesh_shape=mesh.devices.shape)`
records the mesh so a resume can assert topology compatibility
(SURVEY.md §2.3 resume contract).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax

from yolo_v3_tpu.parallel import mesh as M


@dataclasses.dataclass(frozen=True)
class ProcessContext:
    process_id: int
    num_processes: int
    coordinator: Optional[str]

    @property
    def is_distributed(self) -> bool:
        return self.num_processes > 1


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> ProcessContext:
    """Bring up jax.distributed when a multi-process run is configured.

    Configuration precedence: explicit args > JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars > single-process no-op.
    Safe to call unconditionally — entry points call this first.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "0")) or None
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        process_id = int(pid) if pid is not None else None

    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return ProcessContext(jax.process_index(), jax.process_count(),
                              coordinator_address)
    return ProcessContext(jax.process_index(), jax.process_count(), None)


def make_global_mesh(space: int = 1, n_devices: Optional[int] = None):
    """Mesh over ALL processes' devices (jax.devices() is global after
    initialize()).  Shape (data, space); data-parallel by default."""
    return M.make_mesh(n_devices=n_devices, space=space)


def make_data_helper(dataset, sampler, ctx: ProcessContext, **kw):
    """DataHelper sharded for this process: host ``process_id`` of
    ``num_processes`` assembles its contiguous slice of every global batch
    (deterministic across any host count — tests/test_data.py
    TestMultiHostSharding)."""
    from yolo_v3_tpu.data.loader import DataHelper

    return DataHelper(dataset, sampler, host_id=ctx.process_id,
                      n_hosts=max(ctx.num_processes, 1), **kw)


def shard_train_inputs_global(mesh, imgs_local, labels_local):
    """Multi-process analog of ``mesh.shard_train_inputs``: each process
    passes its LOCAL shard of the net-batch (what ``make_data_helper``
    hands it) and gets back global jax.Arrays spanning every process's
    devices.  ``device_put`` can only target addressable devices, so the
    global arrays are assembled from the per-process pieces.  Works
    unchanged (and is the preferred entry) in single-process runs."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(x, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return (put(imgs_local, P(None, M.DATA_AXIS)),
            put(labels_local, P(None, M.DATA_AXIS)))


def replicate_global(mesh, tree):
    """Replicate a host pytree (identical on every process — params, BN
    state, optimizer state) onto all devices of a multi-process mesh."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P())
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree,
    )


def assert_mesh_compatible(mesh, ckpt_mesh_shape) -> None:
    """Resume guard: the data-axis size must match the checkpointed run (the
    global batch layout depends on it); the space axis may differ."""
    if ckpt_mesh_shape is None:
        return
    if tuple(mesh.devices.shape)[0] != tuple(ckpt_mesh_shape)[0]:
        raise ValueError(
            f"checkpoint was written with mesh {tuple(ckpt_mesh_shape)}; "
            f"current mesh {tuple(mesh.devices.shape)} has a different "
            "data-parallel width - resume would change the global batch"
        )
