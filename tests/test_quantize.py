"""int8 quantization building-block tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q


class TestQuantize:
    def test_weight_roundtrip_error_bounded(self, rng):
        w = jnp.asarray(rng.normal(size=(3, 3, 16, 32)).astype(np.float32))
        wq, s = Q.quantize_weights_per_channel(w)
        assert wq.dtype == jnp.int8
        deq = wq.astype(jnp.float32) * s[None, None, None, :]
        # max error per channel <= scale/2
        err = np.abs(np.asarray(deq - w))
        assert np.all(err <= np.asarray(s)[None, None, None, :] * 0.5 + 1e-7)

    def test_int8_conv_close_to_float(self, rng):
        """A quantized conv block stays within ~2% relative error of the
        float path on well-scaled data."""
        c_in, c_out = 16, 32
        x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, c_in)).astype(np.float32))
        p = {
            "w": jnp.asarray(rng.normal(size=(3, 3, c_in, c_out)).astype(np.float32)) * 0.1,
            "b": jnp.asarray(rng.normal(size=(c_out,)).astype(np.float32)) * 0.1,
        }
        want = np.asarray(D._conv_bias_leaky(p, x))
        got = np.asarray(Q.quantized_block(x, p, x_absmax=float(jnp.max(jnp.abs(x)))))
        denom = np.maximum(np.abs(want), 0.1)
        assert np.median(np.abs(got - want) / denom) < 0.02
        assert np.max(np.abs(got - want)) < 0.2

    def test_activation_clipping(self):
        x = jnp.asarray([[-10.0, 0.0, 0.5, 10.0]])
        q = Q.quantize_activation(x, Q.activation_scale(1.0))
        np.testing.assert_array_equal(np.asarray(q), [[-127, 0, 64, 127]])

    def test_jit_int8_conv(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 8)).astype(np.float32))
        p = {"w": jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32)) * 0.1,
             "b": jnp.zeros((8,))}
        f = jax.jit(lambda x: Q.quantized_block(x, p, 1.0))
        out = f(x)
        assert out.shape == (1, 8, 8, 8) and np.all(np.isfinite(np.asarray(out)))
