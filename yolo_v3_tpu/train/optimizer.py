"""Optimizer factory: SGD with momentum/weight-decay and per-group LRs.

Equivalent of the reference's two-param-group SGD (reference
train.py:118-135): the Darknet-53 backbone gets its own (usually smaller)
learning rate or is frozen entirely; detection heads get the main LR.

Built on optax with ``multi_transform`` keyed by pytree path — the pytree
analog of torch param groups.  Resume semantics match the reference's
``load_optimizer`` (train.py:104-116): restoring the optimizer state keeps
the *current* lr/wd/momentum because those live in the transform, not the
state.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

from yolo_v3_tpu.utils.config import TrainConfig

BACKBONE_KEY = "backbone"


def _group_labels(params) -> Any:
    """'backbone' for the feature extractor subtree, 'detection' elsewhere."""
    return {
        k: jax.tree.map(lambda _: "backbone" if k == BACKBONE_KEY else "detection",
                        v)
        for k, v in params.items()
    }


def _sgd(lr: float, cfg: TrainConfig) -> optax.GradientTransformation:
    """torch-style SGD: grad += wd*param, then momentum buffer, then -lr."""
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale(-lr),
    )


def make_optimizer(params, cfg: TrainConfig) -> optax.GradientTransformation:
    """Two-group SGD; freezing zeroes backbone updates
    (reference train.py:121-127)."""
    backbone_tx = (
        optax.set_to_zero() if cfg.freeze_backbone else _sgd(cfg.backbone_lr, cfg)
    )
    tx = optax.multi_transform(
        {"detection": _sgd(cfg.lr, cfg), "backbone": backbone_tx},
        _group_labels(params),
    )
    return optax.chain(optax.clip_by_global_norm(cfg.clip_grad_norm), tx)
