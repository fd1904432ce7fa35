"""End-to-end training loop: checkpoint/resume parity (the reference's
Deterministic_data_loading contract: pause/resume == one go)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.sampler import CyclicSampler
from yolo_v3_tpu.data import transforms as T
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.train.checkpoint import (
    get_latest_checkpoint,
    load_checkpoint,
    remove_checkpoints,
)
from yolo_v3_tpu.train.loop import train
from yolo_v3_tpu.train.recorder import Recorder
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig

CFG = YoloConfig(num_classes=3, img_dim=64)
TCFG = TrainConfig(lr=1e-3, backbone_lr=1e-4, net_subdivisions=2)


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("coco")
    (root / "images").mkdir()
    (root / "labels").mkdir()
    rng = np.random.default_rng(1)
    paths = []
    for i in range(8):
        img = rng.integers(0, 255, (96, 128, 3), dtype=np.uint8)
        p = root / "images" / f"img_{i:04d}.jpg"
        cv2.imwrite(str(p), img)
        rows = np.array([[rng.integers(0, 3), 0.5, 0.5, 0.4, 0.4]], np.float32)
        np.savetxt(str(root / "labels" / f"img_{i:04d}.txt"), rows, fmt="%.6f")
        paths.append(str(p))
    (root / "train.txt").write_text("\n".join(paths) + "\n")
    return str(root / "train.txt")


def make_data(coco_dir, max_net_batches, seed=0):
    ds = ListDataset(coco_dir, trans_fn=lambda dim: T.training_transform(dim))
    sampler = CyclicSampler(len(ds), 2, seed=seed, dim=(64, 64))
    return DataHelper(ds, sampler, max_net_batches=max_net_batches,
                      net_subdivisions=2, prefetch=0)


def leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


class TestTrainLoop:
    def test_resume_matches_one_go(self, coco_dir, tmp_path):
        init = D.init_yolonet(jax.random.PRNGKey(0), CFG.num_classes, blocks=(1, 1, 1, 1, 1))

        # one go: 4 net batches
        p_ref, s_ref, _, _ = train(
            make_data(coco_dir, 4), *jax.tree.map(jnp.array, init), CFG, TCFG,
            log_fn=lambda s: None,
        )

        # run 2 net batches with checkpointing, then resume for 2 more
        wdir = str(tmp_path / "w")
        p1, s1, _, _ = train(
            make_data(coco_dir, 2), *jax.tree.map(jnp.array, init), CFG, TCFG,
            model_id="t", weight_dir=wdir, checkpoint_interval=1,
            log_fn=lambda s: None,
        )
        path, it = get_latest_checkpoint("t", wdir)
        assert path is not None and it == 1
        ckpt = load_checkpoint(path)

        p2, s2, _, rec = train(
            make_data(coco_dir, 4), *jax.tree.map(jnp.array, init), CFG, TCFG,
            checkpoint=ckpt, log_fn=lambda s: None,
        )

        for a, b in zip(leaves(p2), leaves(p_ref)):
            np.testing.assert_allclose(a, b, atol=2e-6)
        for a, b in zip(leaves(s2), leaves(s_ref)):
            np.testing.assert_allclose(a, b, atol=2e-6)

    def test_graceful_preemption_checkpoints_and_resumes(self, coco_dir,
                                                         tmp_path):
        """SIGTERM mid-run: the loop finishes the in-flight net-batch,
        checkpoints, and exits; --resume continues to the same final params
        as an uninterrupted run (the reference's pause/resume==one-go
        contract, README.md:58-65, extended to kill-based preemption)."""
        import signal

        init = D.init_yolonet(jax.random.PRNGKey(0), CFG.num_classes,
                              blocks=(1, 1, 1, 1, 1))

        p_ref, s_ref, _, _ = train(
            make_data(coco_dir, 4), *jax.tree.map(jnp.array, init), CFG, TCFG,
            log_fn=lambda s: None,
        )

        wdir = str(tmp_path / "w")
        lines = []
        fired = []

        def log_fn(s):
            lines.append(s)
            if s.startswith("net_batch") and not fired:
                fired.append(True)
                signal.raise_signal(signal.SIGTERM)

        # checkpoint_interval huge: the only checkpoint is the preempt one
        train(make_data(coco_dir, 4), *jax.tree.map(jnp.array, init), CFG,
              TCFG, model_id="t", weight_dir=wdir, checkpoint_interval=10_000,
              log_fn=log_fn)
        assert any("[preempt]" in l for l in lines)
        # stops at the preempt boundary: the logged net-batch plus at most
        # the one already in flight (1-deep pipelining drains one late)
        assert sum(l.startswith("net_batch") for l in lines) <= 2

        path, _ = get_latest_checkpoint("t", wdir)
        assert path is not None
        p2, s2, _, _ = train(
            make_data(coco_dir, 4), *jax.tree.map(jnp.array, init), CFG, TCFG,
            checkpoint=load_checkpoint(path), log_fn=lambda s: None,
        )
        for a, b in zip(leaves(p2), leaves(p_ref)):
            np.testing.assert_allclose(a, b, atol=2e-6)
        for a, b in zip(leaves(s2), leaves(s_ref)):
            np.testing.assert_allclose(a, b, atol=2e-6)

    def test_final_checkpoint_always_written(self, coco_dir, tmp_path):
        """A run whose length is not checkpoint_interval-aligned still
        leaves a checkpoint of the FINAL state (the reference's post-loop
        weight save, train.py) — and its params equal the returned ones."""
        init = D.init_yolonet(jax.random.PRNGKey(0), CFG.num_classes,
                              blocks=(1, 1, 1, 1, 1))
        wdir = str(tmp_path / "w")
        p, s, _, _ = train(
            make_data(coco_dir, 3), *jax.tree.map(jnp.array, init), CFG, TCFG,
            model_id="t", weight_dir=wdir, checkpoint_interval=10_000,
            log_fn=lambda s: None,
        )
        path, it = get_latest_checkpoint("t", wdir)
        assert path is not None and it == 3
        ckpt = load_checkpoint(path)
        for a, b in zip(leaves(ckpt["params"]), leaves(p)):
            np.testing.assert_array_equal(a, b)

    def test_checkpoint_gc(self, tmp_path):
        import os

        d = tmp_path / "gc" / "m"
        d.mkdir(parents=True)
        for i in range(35):
            (d / f"yolov3_m_checkpoint_{i:06d}.npz").write_bytes(b"x")
        remove_checkpoints("m", str(tmp_path / "gc"), num_remove=20, num_keep=10)
        left = sorted(os.listdir(d))
        assert len(left) == 10
        assert left[0] == "yolov3_m_checkpoint_000025.npz"

    def test_multi_scale_training_smoke(self, coco_dir):
        """Multi-scale dims change across net batches; per-dim jit cache
        compiles one executable per resolution (SURVEY.md bucketing plan)."""
        from yolo_v3_tpu.data.datasets import ListDataset
        from yolo_v3_tpu.data.loader import DataHelper
        from yolo_v3_tpu.data.sampler import CyclicSampler
        from yolo_v3_tpu.data import transforms as T

        ds = ListDataset(coco_dir, trans_fn=lambda dim: T.training_transform(dim))
        # dims roll every 4 samples = batch_size * net_subdivisions
        sampler = CyclicSampler(len(ds), 2, seed=4, dim=None,
                                rand_dim_interval=4, dim_mult_range=(2, 4))
        data = DataHelper(ds, sampler, max_net_batches=3, net_subdivisions=2,
                          prefetch=0)
        dims_seen = {d[0] for d in sampler.dims}
        assert dims_seen <= {64, 96}

        init = D.init_yolonet(jax.random.PRNGKey(0), CFG.num_classes, blocks=(1, 1, 1, 1, 1))
        p, s, _, rec = train(data, *jax.tree.map(jnp.array, init), CFG, TCFG,
                             log_fn=lambda s: None)
        assert np.isfinite(rec.current_stats["loss"])

    def test_same_seed_training_is_reproducible(self, coco_dir):
        """Two fresh runs with identical seeds produce identical params —
        the determinism contract end-to-end (data schedule + augmentation +
        compiled step)."""
        def run():
            init = D.init_yolonet(jax.random.PRNGKey(0), CFG.num_classes, blocks=(1, 1, 1, 1, 1))
            p, s, _, _ = train(
                make_data(coco_dir, 2, seed=11), *jax.tree.map(jnp.array, init),
                CFG, TCFG, log_fn=lambda s: None,
            )
            return p

        p1, p2 = run(), run()
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
