"""Weight I/O: pjreddie darknet binary codec + native pytree checkpoints.

Darknet ``.weights`` format (reference WeightManager, darknet.py:249-303):
5 little-endian int32 header values (``seen`` image count at index 3),
followed by one flat float32 blob.  Per conv+BN block the order is
bn.bias, bn.scale (torch "weight"), running_mean, running_var, conv kernel;
per bias conv it is bias, kernel (darknet.py:279-290).  Conv kernels are
serialized in torch/darknet [cout, cin, kh, kw] row-major order; we transpose
to/from our HWIO layout.

Layer order is the canonical cfg walk from
:func:`yolo_v3_tpu.models.darknet.conv_layer_paths`.

Superset of the reference: we also implement darknet-format *saving*
(reference darknet.py:237-238 raises NotImplementedError) and a plain
npz-based native checkpoint for param/state pytrees.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from yolo_v3_tpu.models.darknet import backbone_conv_paths, conv_layer_paths

HEADER_LEN = 5


def _get_path(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node[k]
    node[path[-1]] = value


def _is_bn_block(p: Dict[str, Any]) -> bool:
    return "bn" in p


def load_darknet_weights(
    params,
    state,
    path: str,
    paths: Optional[Sequence[Tuple[str, ...]]] = None,
    allow_partial: bool = False,
):
    """Read a darknet ``.weights`` file into (params, state) pytrees.

    Returns (params, state, header, n_floats_consumed).  With
    ``allow_partial`` the read stops cleanly at end-of-file (the
    darknet53.conv.74 backbone-prefix case, reference darknet.py:102-104).
    """
    with open(path, "rb") as fp:
        header = np.fromfile(fp, dtype=np.int32, count=HEADER_LEN)
        blob = np.fromfile(fp, dtype=np.float32)
    return load_darknet_blob(params, state, blob, paths, allow_partial) + (header,)


def infer_blocks(params) -> tuple:
    """Per-stage residual-block counts read off the params tree, so the
    default codec paths match reduced-``blocks`` models (test fixtures)."""
    bk = params["backbone"]
    stages = sorted(k for k in bk if k.startswith("stage"))
    return tuple(sum(1 for k in bk[s] if k.startswith("res")) for s in stages)


def load_darknet_blob(params, state, blob: np.ndarray, paths=None, allow_partial=False):
    params = jax.tree.map(lambda a: a, params)  # shallow functional copy
    state = jax.tree.map(lambda a: a, state)
    if paths is None:
        paths = conv_layer_paths(blocks=infer_blocks(params))

    ptr = 0

    def take(n, shape):
        nonlocal ptr
        if ptr + n > blob.size:
            raise EOFError
        out = blob[ptr:ptr + n].reshape(shape)
        ptr += n
        return jnp.asarray(out)

    for p in paths:
        pp = _get_path(params, p)
        cout = pp["w"].shape[3]
        kh, kw, cin = pp["w"].shape[0], pp["w"].shape[1], pp["w"].shape[2]
        try:
            if _is_bn_block(pp):
                bias = take(cout, (cout,))
                scale = take(cout, (cout,))
                mean = take(cout, (cout,))
                var = take(cout, (cout,))
                w = take(cout * cin * kh * kw, (cout, cin, kh, kw)).transpose(2, 3, 1, 0)
                _set_path(params, p, {"w": w, "bn": {"scale": scale, "bias": bias}})
                _set_path(state, p, {"mean": mean, "var": var})
            else:
                b = take(cout, (cout,))
                w = take(cout * cin * kh * kw, (cout, cin, kh, kw)).transpose(2, 3, 1, 0)
                _set_path(params, p, {"w": w, "b": b})
        except EOFError:
            if allow_partial:
                break
            raise ValueError(
                f"weights file exhausted at layer {'/'.join(p)} "
                f"(consumed {ptr} of {blob.size} floats)"
            )
    return params, state, ptr


def save_darknet_weights(params, state, path: str, paths=None, seen: int = 0,
                         version=(0, 2, 0)):
    """Write params/state as a darknet ``.weights`` file (codec inverse)."""
    if paths is None:
        paths = conv_layer_paths(blocks=infer_blocks(params))
    chunks: List[np.ndarray] = []
    for p in paths:
        pp = _get_path(params, p)
        w = np.asarray(pp["w"], dtype=np.float32).transpose(3, 2, 0, 1)  # -> OIHW
        if _is_bn_block(pp):
            sp = _get_path(state, p)
            chunks.append(np.asarray(pp["bn"]["bias"], np.float32).ravel())
            chunks.append(np.asarray(pp["bn"]["scale"], np.float32).ravel())
            chunks.append(np.asarray(sp["mean"], np.float32).ravel())
            chunks.append(np.asarray(sp["var"], np.float32).ravel())
        else:
            chunks.append(np.asarray(pp["b"], np.float32).ravel())
        chunks.append(w.ravel())
    header = np.array([version[0], version[1], version[2], seen, 0], dtype=np.int32)
    with open(path, "wb") as fp:
        header.tofile(fp)
        np.concatenate(chunks).tofile(fp)


def load_backbone_darknet_weights(params, state, path: str):
    """darknet53.conv.74-style backbone init for fine-tuning
    (reference darknet.py:102-104, custom_data_train.ipynb)."""
    return load_darknet_weights(params, state, path,
                                paths=backbone_conv_paths(), allow_partial=True)


# ---------------------------------------------------------------------------
# Native pytree checkpoint (npz + json treedef) — the "pytorch format"
# equivalent (reference darknet.py:234-246) without torch.
# ---------------------------------------------------------------------------

def _flatten_with_names(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_flatten_with_names(tree[k], f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten_from_names(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for name, arr in flat.items():
        parts = name.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    return tree


def save_pytree(tree, path: str, meta: Optional[Dict[str, Any]] = None):
    flat = _flatten_with_names(tree)
    if meta is not None:
        flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_pytree(path: str):
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        flat = {k: z[k] for k in z.files}
    meta = None
    if "__meta__" in flat:
        meta = json.loads(bytes(flat.pop("__meta__").tolist()).decode())
    return _unflatten_from_names(flat), meta
