"""Fused entry megakernel vs the XLA int8 s2d entry: exact int8 parity.

Same quantized weights, same epilogues — the kernel must reproduce the
XLA path bit-for-bit (both accumulate in int32 and round identically).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.models import quantized as Q
from yolo_v3_tpu.ops import entry_kernel as EK

DIM = 96   # -> h104 = 24 (divisible by band 8/12)


@pytest.fixture(scope="module")
def qnet():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (2, DIM, DIM, 3)).astype(np.float32))
    params, state = D.init_yolonet(jax.random.PRNGKey(5), 8,
                                   blocks=(1, 1, 1, 1, 1))
    # BN stats -> batch stats so activations are O(1) (see test_e2e_oracle)
    _, ns = D.apply_yolonet(params, state, x, training=True)

    def fix(old, new):
        if set(old.keys()) == {"mean", "var"}:
            mean = (np.asarray(new["mean"]) - 0.9 * np.asarray(old["mean"])) / 0.1
            var = (np.asarray(new["var"]) - 0.9 * np.asarray(old["var"])) / 0.1
            return {"mean": jnp.asarray(mean),
                    "var": jnp.asarray(np.maximum(var, 1e-3))}
        return {k: fix(old[k], new[k]) for k in old}

    state = fix(state, ns)
    qtree = Q.build_quantized(params, state, x, space_to_depth=True)
    return qtree, x


def xla_entry(q, x):
    """The XLA reference: the s2d entry section of apply_yolonet_quantized."""
    sc = q["scales"]
    x_q = Q.quantize_image(x, sc["image"])
    sp = q["s2d"]
    xp = jnp.pad(x_q, ((0, 0), (1, 3), (1, 3), (0, 0)))
    xb = D._space_to_depth2(xp)
    y = Q._conv_i8(sp["stem"], xb, padding=((0, 0), (0, 0)))
    y = Q._conv_i8(sp["down0"], y, stride=2, padding=((1, 1), (1, 1)))
    r = Q._conv_i8(sp["res0_1"], y, padding=((0, 0), (0, 0)))
    r = Q._conv_i8(sp["res0_2"], r, padding=((1, 1), (1, 1)), residual=y,
                   res_scale=sc["s2d/down0"] / sc["s2d/res0_2"])
    return Q._conv_i8(sp["down1"], r, padding=((1, 0), (1, 0))), xb


@pytest.mark.parametrize("band", [8, 12, 24])
def test_fused_entry_matches_xla(qnet, band):
    qtree, x = qnet
    want, xb = xla_entry(qtree, x)
    got = EK.fused_entry(
        xb, qtree["s2d"],
        res_scale=qtree["scales"]["s2d/down0"] / qtree["scales"]["s2d/res0_2"],
        band=band, interpret=True,
    )
    got = np.asarray(got, np.int32)
    want = np.asarray(want, np.int32)
    # int32 accumulation is exact; the fp32 epilogue's rounding ties can
    # flip the requantized value between interpret and XLA (fma association
    # in the epilogue AND in the upstream jitted BN fold), and a tie flip on
    # the *residual* branch input can move the sum by 2.  Require small
    # deviations on a vanishing fraction of elements.
    diff = np.abs(got - want)
    assert diff.max() <= 2, diff.max()
    assert (diff != 0).mean() < 5e-3, (diff != 0).mean()
    assert (diff > 1).mean() < 1e-4, (diff > 1).mean()
