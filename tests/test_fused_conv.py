"""Fused padded-2D conv kernels vs XLA references (interpret mode).

Validates exact integer math of the int8 path (int32 accumulation, fp32
epilogue, round-clip requantization) and the bf16/f32 path against
``lax.conv_general_dilated`` compositions, including border-zeroing and the
fused residual add.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.ops import fused_conv as F


def _rand_int8(rng, shape):
    return jnp.asarray(rng.integers(-20, 20, shape, dtype=np.int8))


class TestLayout:
    def test_pack_unpack_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 5, 7, 3), dtype=np.float32))
        x2d = F.pack_p2d(x)
        assert x2d.shape == (2 * 7 * 9, 3)
        np.testing.assert_array_equal(np.asarray(F.unpack_p2d(x2d, 2, 5, 7)),
                                      np.asarray(x))

    def test_pack_borders_are_zero(self, rng):
        x = jnp.ones((1, 4, 4, 2))
        x2d = np.asarray(F.pack_p2d(x)).reshape(6, 6, 2)
        assert (x2d[0] == 0).all() and (x2d[-1] == 0).all()
        assert (x2d[:, 0] == 0).all() and (x2d[:, -1] == 0).all()


class TestConv1x1:
    @pytest.mark.parametrize("out_dtype", [jnp.int8, jnp.bfloat16])
    def test_int8_matches_reference(self, rng, out_dtype):
        b, h, w, c, n = 2, 6, 6, 16, 24
        x = _rand_int8(rng, (b, h, w, c))
        wt = _rand_int8(rng, (c, n))
        scale = jnp.asarray(rng.uniform(0.001, 0.01, n).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=n).astype(np.float32) * 0.1)

        r, hp, wp = F.p2d_geometry(b, h, w)
        got2d = F.conv1x1_p2d(F.pack_p2d(x), wt, scale, bias, hp, wp,
                              out_dtype=out_dtype,
                              tile_m=F.pick_tile_m(r, 64), tile_n=n,
                              interpret=True)
        got = F.unpack_p2d(got2d, b, h, w)

        acc = jnp.einsum("bhwc,cn->bhwn", x.astype(jnp.int32),
                         wt.astype(jnp.int32))
        y = acc.astype(jnp.float32) * scale + bias
        y = jnp.where(y > 0, y, 0.1 * y)
        if out_dtype == jnp.int8:
            want = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
        else:
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(y, np.float32),
                rtol=1e-2, atol=1e-2,
            )

    def test_borders_stay_zero(self, rng):
        b, h, w, c, n = 1, 4, 4, 8, 8
        x = _rand_int8(rng, (b, h, w, c))
        wt = _rand_int8(rng, (c, n))
        # big positive bias: leaky(bias) != 0, so borders would be nonzero
        # without the epilogue mask
        bias = jnp.full((n,), 5.0, jnp.float32)
        r, hp, wp = F.p2d_geometry(b, h, w)
        got = np.asarray(
            F.conv1x1_p2d(F.pack_p2d(x), wt, jnp.full((n,), 0.01), bias,
                          hp, wp, out_dtype=jnp.int8,
                          tile_m=F.pick_tile_m(r, 64), tile_n=n,
                          interpret=True)
        ).reshape(hp, wp, n)
        assert (got[0] == 0).all() and (got[-1] == 0).all()
        assert (got[:, 0] == 0).all() and (got[:, -1] == 0).all()


class TestConv3x3:
    @pytest.mark.parametrize("dtype,out_dtype", [
        (jnp.int8, jnp.int8),
        (jnp.int8, jnp.bfloat16),
        (jnp.bfloat16, jnp.bfloat16),
    ])
    def test_matches_xla_conv(self, rng, dtype, out_dtype):
        b, h, w, c, n = 2, 8, 10, 16, 24
        if dtype == jnp.int8:
            x = _rand_int8(rng, (b, h, w, c))
            wt = _rand_int8(rng, (3, 3, c, n))
        else:
            x = jnp.asarray(rng.standard_normal((b, h, w, c),
                                                dtype=np.float32)).astype(dtype)
            wt = (jnp.asarray(rng.standard_normal((3, 3, c, n),
                                                  dtype=np.float32)) * 0.1
                  ).astype(dtype)
        scale = jnp.asarray(rng.uniform(0.001, 0.01, n).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=n).astype(np.float32) * 0.1)

        r, hp, wp = F.p2d_geometry(b, h, w)
        got2d = F.conv3x3_p2d(F.pack_p2d(x), wt, scale, bias, hp, wp,
                              out_dtype=out_dtype,
                              tile_m=F.pick_tile_m(r, 80), tile_n=n,
                              interpret=True)
        got = np.asarray(F.unpack_p2d(got2d, b, h, w), np.float32)
        want = np.asarray(
            F.conv3x3_ref(x, wt, scale, bias, out_dtype=out_dtype), np.float32
        )
        if dtype == jnp.int8 and out_dtype == jnp.int8:
            np.testing.assert_array_equal(got, want)
        else:
            np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    def test_tap_geometry_identity_kernel(self, rng):
        """A 3x3 weight that is a pure shift (only tap (0,0) nonzero) must
        shift the image down-right by one pixel — catches off-by-one in the
        row-offset math."""
        b, h, w, c = 1, 6, 6, 4
        x = _rand_int8(rng, (b, h, w, c))
        wt = np.zeros((3, 3, c, c), np.int8)
        wt[0, 0] = np.eye(c, dtype=np.int8)  # tap (dy=-1, dx=-1)
        r, hp, wp = F.p2d_geometry(b, h, w)
        got2d = F.conv3x3_p2d(F.pack_p2d(x), jnp.asarray(wt),
                              jnp.ones((c,)), jnp.zeros((c,)), hp, wp,
                              leaky=False, out_dtype=jnp.int8,
                              tile_m=F.pick_tile_m(r, 48), tile_n=c,
                              interpret=True)
        got = np.asarray(F.unpack_p2d(got2d, b, h, w))
        want = np.zeros_like(np.asarray(x))
        want[:, 1:, 1:] = np.asarray(x)[:, :-1, :-1]
        np.testing.assert_array_equal(got, want)


class TestResBlock:
    def test_int8_res_block_matches_composition(self, rng):
        b, h, w, c = 2, 8, 8, 16
        cm = c // 2
        x = _rand_int8(rng, (b, h, w, c))
        w1 = _rand_int8(rng, (c, cm))
        w2 = _rand_int8(rng, (3, 3, cm, c))
        s1 = jnp.asarray(rng.uniform(0.01, 0.05, cm).astype(np.float32))
        b1 = jnp.asarray(rng.normal(size=cm).astype(np.float32))
        s2 = jnp.asarray(rng.uniform(0.001, 0.01, c).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1)
        res_scale = 0.7

        r, hp, wp = F.p2d_geometry(b, h, w)
        tm = F.pick_tile_m(r, 80)
        got2d = F.res_block_p2d(F.pack_p2d(x), w1, s1, b1, w2, s2, b2,
                                hp, wp, out_dtype=jnp.int8,
                                res_scale=res_scale, tile_m=tm,
                                interpret=True)
        got = np.asarray(F.unpack_p2d(got2d, b, h, w))

        # composition from the separately-tested pieces
        mid2d = F.conv1x1_p2d(F.pack_p2d(x), w1, s1, b1, hp, wp,
                              out_dtype=jnp.int8, tile_m=tm, tile_n=cm,
                              interpret=True)
        mid = F.unpack_p2d(mid2d, b, h, w)
        want = F.conv3x3_ref(mid, w2, s2, b2, out_dtype=jnp.int8,
                             residual=x, res_scale=res_scale)
        np.testing.assert_array_equal(got, np.asarray(want))
