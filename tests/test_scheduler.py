"""LR schedule: darknet burn-in + step decay (reference train.py:211-216
reserves a scheduler slot in the checkpoint; darknet yolov3.cfg defines the
COCO recipe: burn_in 1000 power 4, steps 400k/450k x0.1)."""

import numpy as np
import jax.numpy as jnp
import optax
import pytest

from yolo_v3_tpu.train.optimizer import make_optimizer, schedule_multiplier
from yolo_v3_tpu.utils.config import TrainConfig


class TestScheduleMultiplier:
    def test_constant_by_default(self):
        mult = schedule_multiplier(TrainConfig())
        for n in (0, 1, 10, 10**6):
            assert float(mult(n)) == 1.0

    def test_burn_in_power_curve(self):
        cfg = TrainConfig(burn_in=100, burn_in_power=4.0)
        mult = schedule_multiplier(cfg)
        np.testing.assert_allclose(float(mult(49)), 0.5**4, rtol=1e-6)
        np.testing.assert_allclose(float(mult(99)), 1.0, rtol=1e-6)
        assert float(mult(100)) == 1.0
        # first step not dead (fp32 rounding on the power curve is fine)
        np.testing.assert_allclose(float(mult(0)), (1 / 100) ** 4, rtol=1e-5)

    def test_step_decay(self):
        cfg = TrainConfig(lr_steps=(400, 450), lr_step_scales=(0.1, 0.1))
        mult = schedule_multiplier(cfg)
        assert float(mult(399)) == 1.0
        np.testing.assert_allclose(float(mult(400)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(mult(449)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(mult(450)), 0.01, rtol=1e-6)

    def test_mismatched_lengths_raise(self):
        cfg = TrainConfig(lr_steps=(10,), lr_step_scales=())
        with pytest.raises(ValueError):
            schedule_multiplier(cfg)


class TestScheduledOptimizer:
    def _params(self):
        return {"backbone": {"w": jnp.ones((4,))}, "head0": {"w": jnp.ones((4,))}}

    def test_update_magnitude_follows_schedule(self):
        params = self._params()
        cfg = TrainConfig(
            lr=1.0, backbone_lr=1.0, weight_decay=0.0, momentum=0.0,
            lr_steps=(2,), lr_step_scales=(0.5,),
        )
        tx = make_optimizer(params, cfg)
        opt_state = tx.init(params)
        g = {"backbone": {"w": jnp.ones((4,))}, "head0": {"w": jnp.ones((4,))}}
        got = []
        for _ in range(4):
            updates, opt_state = tx.update(g, opt_state, params)
            got.append(float(updates["head0"]["w"][0]))
        # counts 0,1 -> -1.0; counts 2,3 -> -0.5
        np.testing.assert_allclose(got, [-1.0, -1.0, -0.5, -0.5], rtol=1e-6)

    def test_schedule_position_lives_in_state(self):
        """Round-tripping opt_state through host numpy (the checkpoint path)
        preserves the schedule position."""
        import jax

        params = self._params()
        cfg = TrainConfig(lr=1.0, weight_decay=0.0, momentum=0.0,
                          lr_steps=(1,), lr_step_scales=(0.25,))
        tx = make_optimizer(params, cfg)
        opt_state = tx.init(params)
        g = jax.tree.map(jnp.ones_like, params)
        _, opt_state = tx.update(g, opt_state, params)  # count -> 1
        # simulate checkpoint save/load (train/checkpoint.py pickles the
        # host-ified pytree)
        restored = jax.tree.map(np.asarray, opt_state)
        updates, _ = tx.update(g, restored, params)
        np.testing.assert_allclose(
            float(updates["head0"]["w"][0]), -0.25, rtol=1e-6
        )
