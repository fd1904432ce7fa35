"""The compiled training step: subdivisions, grad accumulation, update.

Reference flow (train.py:34-97): run ``net_subdivisions`` mini-batches
accumulating gradients (losses are sum-reduced so accumulation == one large
batch, yololayer.py:27-28), clip the global grad norm at 1000 (train.py:67),
then one optimizer step.  Here the whole net-batch — all subdivisions — is
one ``lax.scan`` inside one jit: micro-batches stream through the model
sequentially (BatchNorm running stats thread through the scan exactly like
the reference's per-forward updates), gradients are summed on device, and
the optimizer applies once.

The same step function runs single-chip or data-parallel: under a
``jax.sharding.Mesh`` the batch axis is sharded and XLA inserts the ICI
all-reduces for the (replicated) gradient/BN-stat reductions automatically.

One deliberate deviation from the reference: it clips the *accumulated*
grad norm after every mini-batch (train.py:67); we clip once before the
update.  At clip=1000 the bound essentially never binds mid-accumulation;
clipping once keeps the scan body collective-free.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models.loss import yolo_loss
from yolo_v3_tpu.utils.config import YoloConfig


def loss_fn(params, state, imgs, labels, config: YoloConfig,
            compute_dtype=jnp.float32, s2d_entry: bool = False):
    """Forward + loss on one mini-batch; returns (loss, (stats, new_state)).

    ``compute_dtype=bfloat16`` gives mixed-precision training: activations
    and weight *uses* are bf16 on the MXU while master params, gradients,
    BatchNorm statistics, and the loss itself stay float32 (conv
    accumulation is fp32 via preferred_element_type; the loss casts head
    outputs to fp32 before any sigmoid/exp).  fp32 default matches the
    reference exactly; bf16 is ~3x faster on TPU (fp32 matmuls run as
    multi-pass bf16).
    """
    if imgs.dtype == jnp.uint8:
        # uint8 train feed: pixels cross host->device as raw bytes (4x less
        # tunnel/PCIe traffic than float32) and normalize HERE, on device.
        # Dividing in float32 first matches the host-side ToArray path to
        # within 1 ulp per pixel (XLA lowers /255 to a reciprocal multiply;
        # numpy performs a true divide) — tested in test_train_step.py.
        imgs = imgs.astype(jnp.float32) / 255.0
    if compute_dtype != jnp.float32:
        params_c = jax.tree.map(lambda a: a.astype(compute_dtype), params)
        imgs = imgs.astype(compute_dtype)
    else:
        params_c = params
    raws, new_state = D.apply_yolonet(params_c, state, imgs, training=True,
                                      s2d_entry=s2d_entry)
    loss, stats = yolo_loss(raws, labels, config, imgs.shape[1])
    return loss, (stats, new_state)


def make_train_step(config: YoloConfig, tx: optax.GradientTransformation,
                    compute_dtype=jnp.float32, remat: bool = False,
                    s2d_entry: bool = False):
    """Build a jittable net-batch step.

    Inputs: ``imgs`` [S, B, H, W, 3], ``labels`` [S, B, T, 5] where S is the
    subdivision count (S=1 means no accumulation).  Stats are averaged over
    subdivisions (reference train.py:74).  ``s2d_entry`` runs the
    tiny-channel entry convs in the space-to-depth domain (same math, full
    MXU lanes — see darknet.apply_s2d_entry_train).
    """

    base = functools.partial(loss_fn, config=config,
                             compute_dtype=compute_dtype,
                             s2d_entry=s2d_entry)
    if remat:
        # recompute the forward during the backward pass instead of saving
        # activations: memory ~ layer peak, gradients bitwise identical
        base = jax.checkpoint(base)
    grad_fn = jax.value_and_grad(base, has_aux=True)

    @jax.jit
    def train_step(params, state, opt_state, imgs, labels):
        zero_grads = jax.tree.map(jnp.zeros_like, params)

        def micro(carry, xs):
            state, grads_acc = carry
            im, lb = xs
            (loss, (stats, state)), grads = grad_fn(params, state, im, lb)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (state, grads_acc), stats

        (state, grads), stats = jax.lax.scan(
            micro, (state, zero_grads), (imgs, labels)
        )
        stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), stats)
        stats["recall"] = jnp.where(
            stats["nGT"] > 0, stats["nCorrect"] / jnp.maximum(stats["nGT"], 1e-9), 0.0
        )

        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, state, opt_state, stats

    return train_step
