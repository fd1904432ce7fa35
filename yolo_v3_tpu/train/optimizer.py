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
import jax.numpy as jnp
import optax

from yolo_v3_tpu.utils.config import TrainConfig

BACKBONE_KEY = "backbone"


def schedule_multiplier(cfg: TrainConfig):
    """LR multiplier as a function of the update (net-batch) count.

    darknet semantics: ((n+1)/burn_in)^power during burn-in (n is 0-based
    here, so the first step is not dead), then a cumulative scale applied at
    each step boundary.  With the default config this is constantly 1.0 —
    the reference's constant-LR behavior.
    """
    steps = tuple(int(s) for s in cfg.lr_steps)
    scales = tuple(float(s) for s in cfg.lr_step_scales)
    if len(steps) != len(scales):
        raise ValueError(
            f"lr_steps ({len(steps)}) and lr_step_scales ({len(scales)}) "
            "must have the same length"
        )

    def mult(count):
        count = jnp.asarray(count, jnp.float32)
        m = jnp.ones((), jnp.float32)
        if cfg.burn_in > 0:
            m = jnp.where(
                count < cfg.burn_in,
                ((count + 1.0) / cfg.burn_in) ** cfg.burn_in_power,
                1.0,
            )
        for boundary, scale in zip(steps, scales):
            m = m * jnp.where(count >= boundary, scale, 1.0)
        return m

    return mult


def _group_labels(params) -> Any:
    """'backbone' for the feature extractor subtree, 'detection' elsewhere."""
    return {
        k: jax.tree.map(lambda _: "backbone" if k == BACKBONE_KEY else "detection",
                        v)
        for k, v in params.items()
    }


def _sgd(lr: float, cfg: TrainConfig) -> optax.GradientTransformation:
    """torch-style SGD: grad += wd*param, then momentum buffer, then
    -lr * schedule(count).  The count lives in the optimizer state
    (scale_by_schedule), so the schedule position checkpoints/resumes."""
    mult = schedule_multiplier(cfg)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        optax.scale_by_schedule(lambda count: -lr * mult(count)),
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
