"""Model core tests: shapes, conv/BN parity vs torch, BN folding, routing.

torch (CPU) is used purely as a numerical oracle for convolution geometry —
the model under test is the JAX pytree implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.models import darknet as D


@pytest.fixture(scope="module")
def tiny_net():
    params, state = D.init_yolonet(jax.random.PRNGKey(0), num_classes=2)
    return params, state


class TestShapes:
    @pytest.mark.parametrize("dim,grids", [(416, (13, 26, 52)), (320, (10, 20, 40))])
    def test_head_shapes(self, tiny_net, dim, grids):
        params, state = tiny_net
        x = jnp.zeros((1, dim, dim, 3))
        (d0, d1, d2), _ = D.apply_yolonet(params, state, x, training=False)
        for det, g in zip((d0, d1, d2), grids):
            assert det.shape == (1, g, g, 3 * 7)  # 3 anchors * (5+2 classes)

    def test_backbone_routes(self, tiny_net):
        params, state = tiny_net
        x = jnp.zeros((1, 416, 416, 3))
        (c3, c4, c5), _ = D.apply_backbone(params["backbone"], state["backbone"], x)
        assert c3.shape == (1, 52, 52, 256)
        assert c4.shape == (1, 26, 26, 512)
        assert c5.shape == (1, 13, 13, 1024)

    def test_conv_count_is_75(self):
        # darknet-53 has 52 convs; yolov3 total = 75 (darknet cfg)
        paths = D.conv_layer_paths()
        assert len(paths) == 75
        assert len(D.backbone_conv_paths()) == 52


class TestTorchParity:
    def _torch_cb(self, p, s, stride):
        import torch

        cout = p["w"].shape[3]
        cin = p["w"].shape[2]
        ks = p["w"].shape[0]
        conv = torch.nn.Conv2d(cin, cout, ks, stride, (ks - 1) // 2, bias=False)
        bn = torch.nn.BatchNorm2d(cout)
        with torch.no_grad():
            conv.weight.copy_(torch.from_numpy(
                np.asarray(p["w"]).transpose(3, 2, 0, 1).copy()))
            bn.weight.copy_(torch.from_numpy(np.asarray(p["bn"]["scale"])))
            bn.bias.copy_(torch.from_numpy(np.asarray(p["bn"]["bias"])))
            bn.running_mean.copy_(torch.from_numpy(np.asarray(s["mean"])))
            bn.running_var.copy_(torch.from_numpy(np.asarray(s["var"])))
        return conv, bn

    @pytest.mark.parametrize("stride,ks", [(1, 3), (2, 3), (1, 1)])
    def test_conv_bn_leaky_eval(self, rng, stride, ks):
        import torch

        cin, cout, hw = 4, 6, 10
        key = jax.random.PRNGKey(1)
        p = {
            "w": jnp.asarray(rng.normal(size=(ks, ks, cin, cout)).astype(np.float32)) * 0.1,
            "bn": {
                "scale": jnp.asarray(rng.uniform(0.5, 1.5, cout).astype(np.float32)),
                "bias": jnp.asarray(rng.normal(size=cout).astype(np.float32)),
            },
        }
        s = {
            "mean": jnp.asarray(rng.normal(size=cout).astype(np.float32)),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, cout).astype(np.float32)),
        }
        x = rng.normal(size=(2, hw, hw, cin)).astype(np.float32)

        got, _ = D.conv_bn_leaky(p, s, jnp.asarray(x), stride=stride, training=False)

        conv, bn = self._torch_cb(p, s, stride)
        conv.eval(); bn.eval()
        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
            want = torch.nn.functional.leaky_relu(bn(conv(tx)), 0.1)
        want = want.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_bn_running_stats_update_matches_torch(self, rng):
        import torch

        cin, cout = 3, 5
        p = {
            "w": jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)) * 0.1,
            "bn": {"scale": jnp.ones(cout), "bias": jnp.zeros(cout)},
        }
        s = {"mean": jnp.zeros(cout), "var": jnp.ones(cout)}
        x = rng.normal(size=(4, 8, 8, cin)).astype(np.float32)

        _, new_s = D.conv_bn_leaky(p, s, jnp.asarray(x), stride=1, training=True)

        conv, bn = self._torch_cb(p, s, 1)
        conv.train(); bn.train()
        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
            bn(conv(tx))
        np.testing.assert_allclose(np.asarray(new_s["mean"]), bn.running_mean.numpy(),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(new_s["var"]), bn.running_var.numpy(),
                                   rtol=1e-4, atol=1e-5)

    def test_full_model_vs_torch_replica(self, tiny_net):
        """Whole-net numerical parity: assemble the same architecture from
        torch primitives, copy our params in, compare all 3 head outputs.
        Catches routing/padding/upsample misalignment that unit tests miss.
        """
        import torch
        import torch.nn as tnn
        import torch.nn.functional as F

        params, state = tiny_net

        def cb(p, s, x, stride=1):
            conv, bn = self._torch_cb(p, s, stride)
            conv.eval(); bn.eval()
            return F.leaky_relu(bn(conv(x)), 0.1)

        def head(hp, hs, x):
            y = x
            for i in range(6):
                y = cb(hp[f"conv{i}"], hs[f"conv{i}"], y)
                if i == 4:
                    branch = y
            w = torch.from_numpy(np.asarray(hp["det"]["w"]).transpose(3, 2, 0, 1).copy())
            b = torch.from_numpy(np.asarray(hp["det"]["b"]))
            det = F.conv2d(y, w, b)
            return det, branch

        rng = np.random.default_rng(3)
        x = rng.uniform(0, 1, size=(1, 3, 96, 96)).astype(np.float32)

        with torch.no_grad():
            bp, bs = params["backbone"], state["backbone"]
            y = cb(bp["stem"], bs["stem"], torch.from_numpy(x))
            routes = []
            for i, nblk in enumerate(D.DARKNET53_BLOCKS):
                sp, ss = bp[f"stage{i}"], bs[f"stage{i}"]
                y = cb(sp["down"], ss["down"], y, stride=2)
                for bidx in range(nblk):
                    r = cb(sp[f"res{bidx}"]["conv1"], ss[f"res{bidx}"]["conv1"], y)
                    r = cb(sp[f"res{bidx}"]["conv2"], ss[f"res{bidx}"]["conv2"], r)
                    y = y + r
                if i >= 2:
                    routes.append(y)
            c3, c4, c5 = routes
            det0, br0 = head(params["head0"], state["head0"], c5)
            u = cb(params["up0"]["conv"], state["up0"]["conv"], br0)
            u = F.interpolate(u, scale_factor=2, mode="nearest")
            det1, br1 = head(params["head1"], state["head1"], torch.cat([u, c4], 1))
            u = cb(params["up1"]["conv"], state["up1"]["conv"], br1)
            u = F.interpolate(u, scale_factor=2, mode="nearest")
            det2, _ = head(params["head2"], state["head2"], torch.cat([u, c3], 1))

        (g0, g1, g2), _ = D.apply_yolonet(
            params, state, jnp.asarray(x.transpose(0, 2, 3, 1)), training=False
        )
        for got, want in ((g0, det0), (g1, det1), (g2, det2)):
            np.testing.assert_allclose(
                np.asarray(got),
                want.numpy().transpose(0, 2, 3, 1),
                rtol=2e-3, atol=2e-4,
            )


class TestBNFolding:
    def test_folded_matches_eval(self, tiny_net):
        params, state = tiny_net
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(0, 1, size=(1, 96, 96, 3)).astype(np.float32))
        want, _ = D.apply_yolonet(params, state, x, training=False)
        folded = D.fold_batchnorm(params, state)
        got = D.apply_yolonet_folded(folded, x)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=3e-4)


class TestSpaceToDepthStem:
    def test_s2d_entry_matches_baseline(self, tiny_net, rng):
        """The s2d-remapped stem+stage0+down1 must equal the conv chain."""
        params, state = tiny_net
        folded = D.fold_batchnorm(params, state)
        s2d = D.fold_space_to_depth(folded)
        bk = folded["backbone"]

        x = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))
        y = D._conv_bias_leaky(bk["stem"], x)
        y = D._conv_bias_leaky(bk["stage0"]["down"], y, stride=2)
        r = D._conv_bias_leaky(bk["stage0"]["res0"]["conv1"], y)
        r = D._conv_bias_leaky(bk["stage0"]["res0"]["conv2"], r)
        y = y + r
        want = D._conv_bias_leaky(bk["stage1"]["down"], y, stride=2)

        got = D._apply_s2d_entry(s2d, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_full_folded_net_with_s2d(self, tiny_net, rng):
        params, state = tiny_net
        folded = D.fold_batchnorm(params, state)
        s2d = D.fold_space_to_depth(folded)
        x = jnp.asarray(rng.uniform(0, 1, (1, 96, 96, 3)).astype(np.float32))
        want = D.apply_yolonet_folded(folded, x)
        got = D.apply_yolonet_folded(s2d, x)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-3, atol=3e-4)


class TestS2dTrainingEntry:
    """apply_s2d_entry_train == the plain train-mode entry: activations, BN
    running-stat updates, AND gradients on the master weights (VERDICT r2
    item 4: the serving path's tiny-channel fix folded into training)."""

    def test_forward_and_state_match_plain(self, tiny_net, rng):
        params, state = tiny_net
        x = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))
        want, want_st = D.apply_yolonet(params, state, x, training=True)
        got, got_st = D.apply_yolonet(params, state, x, training=True,
                                      s2d_entry=True)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=2e-3, atol=3e-4)
        assert jax.tree.structure(got_st) == jax.tree.structure(want_st)
        for g, w in zip(jax.tree.leaves(got_st), jax.tree.leaves(want_st)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-5)

    def test_entry_gradients_exact(self, tiny_net, rng):
        """Gradients THROUGH the s2d entry alone equal the plain chain's to
        fp32 reassociation (~1e-5 relative) — the remap gathers scatter-add
        each tap's 4 sub-position contributions back onto the master weight
        and the pooled BN statistics backprop identically."""
        params, state = tiny_net
        bk, bs = params["backbone"], state["backbone"]
        x = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32))

        def plain(bk):
            y, _ = D.conv_bn_leaky(bk["stem"], bs["stem"], x, 1, True)
            y, _ = D.conv_bn_leaky(bk["stage0"]["down"],
                                   bs["stage0"]["down"], y, 2, True)
            r, _ = D.conv_bn_leaky(bk["stage0"]["res0"]["conv1"],
                                   bs["stage0"]["res0"]["conv1"], y, 1, True)
            r, _ = D.conv_bn_leaky(bk["stage0"]["res0"]["conv2"],
                                   bs["stage0"]["res0"]["conv2"], r, 1, True)
            y = y + r
            y, _ = D.conv_bn_leaky(bk["stage1"]["down"],
                                   bs["stage1"]["down"], y, 2, True)
            return (y * jnp.sin(jnp.arange(y.size).reshape(y.shape))).sum()

        def s2d(bk):
            y, _ = D.apply_s2d_entry_train(bk, bs, x, True)
            return (y * jnp.sin(jnp.arange(y.size).reshape(y.shape))).sum()

        for g, w in zip(jax.tree.leaves(jax.grad(s2d)(bk)),
                        jax.tree.leaves(jax.grad(plain)(bk))):
            g, w = np.asarray(g), np.asarray(w)
            scale = max(np.max(np.abs(w)), 1.0)
            np.testing.assert_allclose(g, w, rtol=0, atol=2e-5 * scale)

    def test_full_net_gradient_direction(self, tiny_net, rng):
        """End-to-end loss gradients: the ~3e-4 forward reassociation delta
        at the entry exit amplifies chaotically through 50 train-mode-BN
        layers of a random-init net (~2% per-leaf L2 drift measured), so the
        meaningful full-net contract is direction + magnitude: global cosine
        > 0.999 and gradient-norm ratio within 0.5%."""
        from yolo_v3_tpu.train.step import loss_fn
        from yolo_v3_tpu.utils.config import YoloConfig

        params, state = tiny_net
        cfg = YoloConfig(num_classes=2, img_dim=96)
        x = jnp.asarray(rng.uniform(0, 1, (2, 96, 96, 3)).astype(np.float32))
        labels = np.zeros((2, 30, 5), np.float32)
        labels[0, 0] = [0, 0.5, 0.5, 0.4, 0.3]
        labels[1, 0] = [1, 0.3, 0.6, 0.2, 0.5]
        labels = jnp.asarray(labels)

        def flat_grad(s2d):
            g = jax.grad(
                lambda p: loss_fn(p, state, x, labels, cfg,
                                  s2d_entry=s2d)[0])(params)
            return np.concatenate(
                [np.asarray(l, np.float64).ravel()
                 for l in jax.tree.leaves(g)])

        a, b = flat_grad(True), flat_grad(False)
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        ratio = np.linalg.norm(a) / np.linalg.norm(b)
        assert cos > 0.999, cos
        assert abs(ratio - 1) < 5e-3, ratio
