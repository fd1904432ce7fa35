"""Composite training checkpoints: {data, params, BN state, optimizer,
recorder}.

Equivalent of the reference checkpoint manager (reference train.py:208-264):
same composite content, same ``yolov3_{model_id}_checkpoint_{netbatch:06d}``
naming/latest-discovery/retention-GC contract, stored as npz pytrees + a
pickled metadata blob instead of torch serialization.

The data-pipeline state (scheduler queues + RNG state) rides inside the
checkpoint, which is what makes pause/resume bit-identical (the reference's
Deterministic_data_loading contract, README.md:58-65).
"""

from __future__ import annotations

import glob
import os
import os.path as osp
import pickle
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

from yolo_v3_tpu.models.weights import _flatten_with_names, _unflatten_from_names

_FMT = "yolov3_{model_id}_checkpoint_{net_batch:06d}.npz"
_PATTERN = r"yolov3_(.+?)_checkpoint_(\d+)\.npz$"


def save_checkpoint(
    data_helper,
    params,
    state,
    opt_state,
    recorder,
    model_id: str,
    weight_dir: str,
    mesh_shape=None,
) -> str:
    model_dir = osp.join(weight_dir, model_id)
    os.makedirs(model_dir, exist_ok=True)
    path = osp.join(
        model_dir,
        _FMT.format(model_id=model_id, net_batch=data_helper.get_net_batch()),
    )

    flat = {}
    flat.update({f"params/{k}": v for k, v in _flatten_with_names(params).items()})
    flat.update({f"state/{k}": v for k, v in _flatten_with_names(state).items()})
    import jax

    meta = {
        "data": data_helper.state_dict(),
        "recorder": recorder.state_dict() if recorder is not None else None,
        # optax state pytree (namedtuples of arrays): host-ify then pickle
        "opt_state": jax.tree.map(np.asarray, opt_state),
        # mesh topology of the writing run (SURVEY §2.3 resume contract);
        # resume asserts data-axis compatibility via
        # parallel.distributed.assert_mesh_compatible
        "mesh_shape": tuple(mesh_shape) if mesh_shape is not None else None,
    }
    flat["__meta__"] = np.frombuffer(pickle.dumps(meta), dtype=np.uint8)
    np.savez(path, **flat)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with np.load(path, allow_pickle=False) as z:
        flat = {k: z[k] for k in z.files}
    meta = pickle.loads(bytes(flat.pop("__meta__").tolist()))
    params = _unflatten_from_names(
        {k[len("params/"):]: v for k, v in flat.items() if k.startswith("params/")}
    )
    state = _unflatten_from_names(
        {k[len("state/"):]: v for k, v in flat.items() if k.startswith("state/")}
    )
    return {
        "params": params,
        "state": state,
        "opt_state": meta["opt_state"],
        "data": meta["data"],
        "recorder": meta["recorder"],
        "mesh_shape": meta.get("mesh_shape"),
    }


def get_checkpoint_list(model_id: str, weight_dir: str):
    return sorted(glob.glob(osp.join(weight_dir, model_id, "yolov3_*_checkpoint_*.npz")))


def get_latest_checkpoint(model_id: str, weight_dir: str) -> Tuple[Optional[str], int]:
    """Latest checkpoint by net-batch number in the filename
    (reference train.py:245-264)."""
    latest_path, latest_iter = None, 0
    for f in get_checkpoint_list(model_id, weight_dir):
        m = re.search(_PATTERN, f)
        if not m or m.group(1) != model_id:
            continue
        it = int(m.group(2))
        if it >= latest_iter:
            latest_path, latest_iter = f, it
    return latest_path, latest_iter


def remove_checkpoints(
    model_id: str,
    weight_dir: str,
    num_remove: int = 20,
    num_keep: int = 10,
    remove_all: bool = False,
    debug: bool = False,
) -> None:
    """Retention GC: once more than num_keep+num_remove exist, delete the
    oldest down to num_keep (reference train.py:230-243)."""
    ckpts = get_checkpoint_list(model_id, weight_dir)
    if remove_all:
        doomed = ckpts
    else:
        excess = len(ckpts) - num_keep
        doomed = ckpts[:excess] if excess >= num_remove else []
    for f in doomed:
        if not debug:
            os.remove(f)
