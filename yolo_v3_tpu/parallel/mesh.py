"""Device mesh + sharding layer: data-parallel (and beyond) scaling.

The reference is single-process single-GPU with no distributed backend at
all (SURVEY.md §2.3); scaling there means gradient accumulation.  Here
scaling is a first-class TPU-native design: a ``jax.sharding.Mesh`` over the
slice, batch axis sharded over the ``data`` mesh axis, parameters/optimizer
state replicated, and XLA inserting the gradient all-reduce over ICI.  The
same compiled train step runs on 1 chip or N — only the shardings change.

For very large input resolutions a second ``space`` mesh axis spatially
shards the NHWC height dimension (the CNN analog of sequence parallelism;
SURVEY.md §5 long-context note): halo exchanges for the 3x3 convs are
inserted by XLA via the sharding propagation on ``lax.conv``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(
    n_devices: Optional[int] = None,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh of shape (data, space).  ``space=1`` -> pure data parallelism.

    ``space > 1`` also switches jax to the legacy GSPMD partitioner for
    the rest of the process: the Shardy partitioner (this jax version's
    default) MISCOMPILES the backward pass of the full height-sharded
    backbone — BN scale/bias and conv weight gradients come out up to
    ~30x too large on a (data, space) mesh (round-5 finding, verified
    against a finite-difference oracle and bisected to the partitioner:
    identical program under GSPMD matches the single-device gradients to
    reduction-order noise).  Small sub-graphs don't reproduce it; the
    full 5-stage chain does.  GSPMD is correct for every configuration
    this repo uses, so it is the safe default whenever spatial sharding
    is in play; pure-DP meshes leave the global config alone.
    Regression-gated by tests/test_distributed.py::TestSpaceShardedParity.
    """
    if space > 1:
        jax.config.update("jax_use_shardy_partitioner", False)
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    assert n % space == 0, f"{n} devices not divisible by space={space}"
    arr = np.asarray(devs).reshape(n // space, space)
    return Mesh(arr, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh: Mesh, spatial: bool = False) -> NamedSharding:
    """[S, B, H, W, C] or [B, ...] arrays: shard the batch dim (index -2 of
    the leading dims for subdivision-stacked input) over ``data``; height
    over ``space`` when spatial sharding is on."""
    if spatial:
        return NamedSharding(mesh, P(None, DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any, spec: Optional[P] = None) -> Any:
    """Device-put host arrays with the batch axis sharded over ``data``.

    Default spec shards axis 1 (the mini-batch axis of [S, B, ...] input);
    pass ``spec=P(DATA_AXIS)`` for arrays whose axis 0 is the batch.
    """
    spec = spec if spec is not None else P(None, DATA_AXIS)

    def put(x):
        nd = NamedSharding(mesh, P(*spec[: np.ndim(x)]))
        return jax.device_put(x, nd)

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_train_inputs(mesh: Mesh, imgs, labels):
    """Shard a net-batch ([S, B, H, W, 3], [S, B, T, 5]) for DP training."""
    return (
        shard_batch(mesh, imgs, P(None, DATA_AXIS)),
        shard_batch(mesh, labels, P(None, DATA_AXIS)),
    )
