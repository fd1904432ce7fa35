"""Train step tests: accumulation semantics, param groups, DP mesh parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.parallel import mesh as M
from yolo_v3_tpu.train.loop import _optimizer_and_step
from yolo_v3_tpu.train.optimizer import make_optimizer
from yolo_v3_tpu.train.step import make_train_step, loss_fn
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig

CFG = YoloConfig(num_classes=2, img_dim=64)
# one fwd+bwd+update XLA program is ~25 s to compile on the CPU mesh; these
# tests share compiled steps through the train-loop's process-level cache
TCFG = TrainConfig(lr=1e-3, backbone_lr=1e-4)
TCFG16 = TrainConfig(lr=1e-3, backbone_lr=1e-4, compute_dtype="bfloat16")


def tiny_batch(rng, S=2, B=2, dim=64, T=10):
    imgs = rng.uniform(0, 1, (S, B, dim, dim, 3)).astype(np.float32)
    labels = np.zeros((S, B, T, 5), np.float32)
    labels[..., :2, 0] = rng.integers(0, 2, (S, B, 2))
    labels[..., :2, 1:3] = rng.uniform(0.2, 0.8, (S, B, 2, 2))
    labels[..., :2, 3:5] = rng.uniform(0.1, 0.5, (S, B, 2, 2))
    return jnp.asarray(imgs), jnp.asarray(labels)


@pytest.fixture(scope="module")
def net():
    # tiny backbone (1 res block/stage): these tests exercise step/loop
    # semantics, not architecture parity — 13 backbone convs compile ~10x
    # faster than the full 52 on the CPU mesh
    return D.init_yolonet(jax.random.PRNGKey(0), num_classes=2,
                          blocks=(1, 1, 1, 1, 1))


class TestTrainStep:
    def test_loss_decreases(self, net, rng):
        params, state = net
        tx, step = _optimizer_and_step(params, CFG, TCFG)
        opt_state = tx.init(params)
        imgs, labels = tiny_batch(rng)
        losses = []
        for _ in range(8):
            params, state, opt_state, stats = step(params, state, opt_state, imgs, labels)
            losses.append(float(stats["loss"]))
        assert losses[-1] < losses[0]

    def test_uint8_feed_matches_float32(self, net, rng):
        """uint8 imgs + device-side /255 == host-side f32 /255 to within
        1 ulp per pixel (XLA lowers the divide to a reciprocal multiply,
        numpy true-divides); the u8 feed is a transport optimization, not
        a numerics change."""
        params, state = net
        tx, step = _optimizer_and_step(params, CFG, TCFG)
        opt_state = tx.init(params)
        u8 = rng.integers(0, 256, (2, 2, 64, 64, 3), dtype=np.uint8)
        f32 = u8.astype(np.float32) / 255.0
        _, labels = tiny_batch(rng)
        p_u8, s_u8, _, st_u8 = step(params, state, opt_state,
                                    jnp.asarray(u8), labels)
        p_f32, s_f32, _, st_f32 = step(params, state, opt_state,
                                       jnp.asarray(f32), labels)
        np.testing.assert_allclose(float(st_u8["loss"]),
                                   float(st_f32["loss"]), rtol=1e-5)
        # post-step params: the 1-ulp pixel delta flows through bf16
        # gradients, so a handful of elements drift by O(1e-5) absolute
        for a, b in zip(jax.tree.leaves(p_u8), jax.tree.leaves(p_f32)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-4, atol=5e-5)

    def test_scan_accumulation_equals_manual_loop(self, net, rng):
        """The fused scan step == python-loop micro-batch accumulation +
        one optimizer apply (the reference's subdivision contract,
        train.py:59-72).  Note: accumulation is NOT identical to one large
        batch because BatchNorm batch stats differ per micro-batch — true
        of the reference too."""
        import optax

        params, state = net
        tx, step = _optimizer_and_step(params, CFG, TCFG)
        opt_state = tx.init(params)
        imgs, labels = tiny_batch(rng, S=2, B=2)

        # manual accumulation, threading BN state through micro-batches
        g_acc = jax.tree.map(jnp.zeros_like, params)
        st = state
        for s in range(2):
            (_, (_, st)), g = jax.value_and_grad(loss_fn, has_aux=True)(
                params, st, imgs[s], labels[s], CFG
            )
            g_acc = jax.tree.map(jnp.add, g_acc, g)
        updates, _ = tx.update(g_acc, opt_state, params)
        want_params = optax.apply_updates(params, updates)

        got_params, got_state, _, _ = step(params, state, opt_state, imgs, labels)
        for a, b in zip(jax.tree.leaves(got_params), jax.tree.leaves(want_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
        for a, b in zip(jax.tree.leaves(got_state), jax.tree.leaves(st)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_freeze_backbone(self, net, rng):
        params, state = net
        tcfg = TrainConfig(freeze_backbone=True)
        tx = make_optimizer(params, tcfg)
        opt_state = tx.init(params)
        step = make_train_step(CFG, tx)
        imgs, labels = tiny_batch(rng)
        new_params, *_ = step(params, state, opt_state, imgs, labels)
        for a, b in zip(jax.tree.leaves(params["backbone"]),
                        jax.tree.leaves(new_params["backbone"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # detection params did move
        moved = any(
            float(jnp.abs(a - b).max()) > 0
            for a, b in zip(jax.tree.leaves(params["head0"]),
                            jax.tree.leaves(new_params["head0"]))
        )
        assert moved

    def test_differential_lr(self, net, rng):
        """backbone_lr=0 must leave backbone unchanged while heads move."""
        params, state = net
        tcfg = TrainConfig(lr=1e-3, backbone_lr=0.0, weight_decay=0.0)
        tx = make_optimizer(params, tcfg)
        step = make_train_step(CFG, tx)
        imgs, labels = tiny_batch(rng)
        new_params, *_ = step(params, state, tx.init(params), imgs, labels)
        for a, b in zip(jax.tree.leaves(params["backbone"]),
                        jax.tree.leaves(new_params["backbone"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDataParallel:
    def test_dp_matches_single_device(self, net, rng):
        """Same step, same data: sharded-over-8-devices == single device."""
        params, state = net
        tx, step = _optimizer_and_step(params, CFG, TCFG)
        imgs, labels = tiny_batch(rng, S=1, B=8)

        p1, s1, o1, stats1 = step(params, state, tx.init(params), imgs, labels)

        mesh = M.make_mesh()
        params_r = M.replicate(mesh, params)
        state_r = M.replicate(mesh, state)
        opt_r = M.replicate(mesh, tx.init(params))
        imgs_s, labels_s = M.shard_train_inputs(mesh, imgs, labels)
        p8, s8, o8, stats8 = step(params_r, state_r, opt_r, imgs_s, labels_s)

        np.testing.assert_allclose(float(stats1["loss"]), float(stats8["loss"]),
                                   rtol=1e-4)
        # cross-device reductions reorder float ops; bound absolute drift
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)

    def test_mesh_shapes(self):
        mesh = M.make_mesh()
        assert mesh.devices.shape == (8, 1)
        mesh2 = M.make_mesh(space=2)
        assert mesh2.devices.shape == (4, 2)


class TestMixedPrecision:
    def test_bf16_step_close_to_f32(self, net, rng):
        params, state = net
        imgs, labels = tiny_batch(rng)

        tx, step32 = _optimizer_and_step(params, CFG, TCFG)
        _, step16 = _optimizer_and_step(params, CFG, TCFG16)
        p32, s32, _, st32 = step32(params, state, tx.init(params), imgs, labels)
        p16, s16, _, st16 = step16(params, state, tx.init(params), imgs, labels)

        # master params stay f32 and move in the same direction
        assert jax.tree.leaves(p16)[0].dtype == jnp.float32
        l32, l16 = float(st32["loss"]), float(st16["loss"])
        assert abs(l16 - l32) / l32 < 0.05
        # all updates finite
        for a in jax.tree.leaves(p16):
            assert np.all(np.isfinite(np.asarray(a)))

    def test_remat_step_matches_plain(self, net, rng):
        """jax.checkpoint trades activation memory for recompute FLOPs; the
        numbers must not move — same graph, recomputed (TrainConfig.remat,
        the enabler for large-batch 608 training)."""
        params, state = net
        imgs, labels = tiny_batch(rng)

        tx, step = _optimizer_and_step(params, CFG, TCFG)
        _, step_r = _optimizer_and_step(
            params, CFG, TrainConfig(lr=1e-3, backbone_lr=1e-4, remat=True))
        p0, s0, _, st0 = step(params, state, tx.init(params), imgs, labels)
        p1, s1, _, st1 = step_r(params, state, tx.init(params), imgs, labels)

        np.testing.assert_allclose(float(st0["loss"]), float(st1["loss"]),
                                   rtol=1e-6)
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_bf16_training_reduces_loss(self, net, rng):
        params, state = net
        tx, step = _optimizer_and_step(params, CFG, TCFG16)
        opt_state = tx.init(params)
        imgs, labels = tiny_batch(rng)
        losses = []
        for _ in range(6):
            params, state, opt_state, stats = step(params, state, opt_state,
                                                   imgs, labels)
            losses.append(float(stats["loss"]))
        assert losses[-1] < losses[0]

