"""Pallas fused-res-block correctness vs the XLA folded path (interpreter
mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.ops.pallas_kernels import fused_res_block


def xla_res_block(y, w1, b1, w2, b2):
    p1 = {"w": w1, "b": b1}
    p2 = {"w": w2, "b": b2}
    r = D._conv_bias_leaky(p1, y)
    r = D._conv_bias_leaky(p2, r)
    return y + r


@pytest.mark.parametrize("shape,cmid", [((2, 32, 16, 8), 4), ((1, 48, 24, 16), 8)])
def test_fused_matches_xla(rng, shape, cmid):
    b, h, w, c = shape
    y = jnp.asarray(rng.normal(size=shape).astype(np.float32)) * 0.5
    w1 = jnp.asarray(rng.normal(size=(1, 1, c, cmid)).astype(np.float32)) * 0.2
    b1 = jnp.asarray(rng.normal(size=(cmid,)).astype(np.float32)) * 0.1
    w2 = jnp.asarray(rng.normal(size=(3, 3, cmid, c)).astype(np.float32)) * 0.2
    b2 = jnp.asarray(rng.normal(size=(c,)).astype(np.float32)) * 0.1

    want = xla_res_block(y, w1, b1, w2, b2)
    got = fused_res_block(y, w1, b1, w2, b2, tile_h=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_edge_rows_zero_padded(rng):
    """First/last rows depend on the 3x3 zero padding — must match XLA."""
    y = jnp.asarray(rng.normal(size=(1, 16, 8, 8)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(1, 1, 8, 4)).astype(np.float32))
    b1 = jnp.zeros((4,))
    w2 = jnp.asarray(rng.normal(size=(3, 3, 4, 8)).astype(np.float32))
    b2 = jnp.zeros((8,))
    want = np.asarray(xla_res_block(y, w1, b1, w2, b2))
    got = np.asarray(fused_res_block(y, w1, b1, w2, b2, tile_h=8, interpret=True))
    np.testing.assert_allclose(got[:, 0], want[:, 0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got[:, -1], want[:, -1], rtol=1e-4, atol=1e-5)
