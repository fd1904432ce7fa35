"""Multi-host bootstrap glue: process context, sharded data -> identical
training, mesh-shape checkpoint contract (SURVEY §2.3)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from yolo_v3_tpu.data.datasets import ListDataset
from yolo_v3_tpu.data.loader import DataHelper
from yolo_v3_tpu.data.sampler import CyclicSampler
from yolo_v3_tpu.data import transforms as T
from yolo_v3_tpu.models import darknet as D
from yolo_v3_tpu.parallel import distributed as dist
from yolo_v3_tpu.parallel import mesh as M
from yolo_v3_tpu.train.optimizer import make_optimizer
from yolo_v3_tpu.train.step import make_train_step
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig

CFG = YoloConfig(num_classes=2, img_dim=64)


@pytest.fixture(autouse=True)
def _fresh_trace_caches():
    """Retracing the mesh-sharded train step with abstract-eval caches
    populated by earlier tests' (since-destroyed) meshes intermittently
    aborts in XLA's C++ sharding rule (SIGABRT in call_sharding_rule when
    the full suite runs in one process; never in isolation).  Clearing
    jax's caches before each test here avoids the stale-mesh interaction."""
    jax.clear_caches()
    yield


class TestProcessContext:
    def test_single_process_noop(self):
        ctx = dist.initialize()
        assert ctx.process_id == 0
        assert ctx.num_processes == 1
        assert not ctx.is_distributed

    def test_make_data_helper_uses_process_shard(self, coco_dir):
        ds = ListDataset(coco_dir, trans_fn=lambda dim: T.eval_transform(dim))
        sampler = CyclicSampler(len(ds), 4, seed=0, dim=(64, 64))
        ctx = dist.ProcessContext(process_id=1, num_processes=2,
                                  coordinator=None)
        dh = dist.make_data_helper(ds, sampler, ctx, max_batches=2, prefetch=0)
        assert dh.host_id == 1 and dh.n_hosts == 2
        batch = next(iter(dh))
        assert batch["img"].shape[0] == 2  # half of the global batch of 4


class TestMeshCompat:
    def test_compatible(self):
        mesh = M.make_mesh(8, space=2)
        dist.assert_mesh_compatible(mesh, (4, 2))
        dist.assert_mesh_compatible(mesh, (4, 1))  # space may differ
        dist.assert_mesh_compatible(mesh, None)

    def test_incompatible_data_axis(self):
        mesh = M.make_mesh(8, space=2)
        with pytest.raises(ValueError):
            dist.assert_mesh_compatible(mesh, (8, 1))


class TestShardedTrainingParity:
    def test_two_host_shards_train_like_one_host(self, coco_dir):
        """Two simulated hosts' shards, concatenated into the global batch
        and trained on the DP mesh, produce the same params as the
        single-host batch trained on one device — the data-sharding
        determinism contract extended through the train step.

        Runs in a fresh subprocess: after ~60 suite tests (torch + XLA CPU
        loaded in-process), tracing this mesh-sharded train step SIGABRTs
        intermittently inside XLA's C++ (no Python-level cause; passes in
        isolation every time).  Subprocess isolation makes the suite
        deterministic; the child still runs the full assertion body."""
        import os
        import subprocess
        import sys

        if os.environ.get("YOLO_SHARDED_PARITY_CHILD") != "1":
            env = dict(os.environ, YOLO_SHARDED_PARITY_CHILD="1",
                       JAX_PLATFORMS="cpu")
            # Don't register the TPU-tunnel PJRT plugin in the child: the
            # abort correlates with two live tunnel sessions (sitecustomize
            # register()s one per python process).
            env.pop("PALLAS_AXON_POOL_IPS", None)
            # One crash-retry is the documented workaround for the known
            # XLA-CPU SIGABRT (CLAUDE.md); needing a SECOND retry would mean
            # a new/different crash, so that fails loudly instead of being
            # silently absorbed.  The signature of every crashed attempt is
            # printed so regressions are diagnosable from suite output.
            crashes = []
            for attempt in range(2):
                r = subprocess.run(
                    [sys.executable, "-m", "pytest", "-q",
                     "-p", "no:cacheprovider",
                     __file__ + "::TestShardedTrainingParity"
                     "::test_two_host_shards_train_like_one_host"],
                    env=env, capture_output=True, text=True, timeout=1200,
                    cwd=os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__))),
                )
                if r.returncode == 0:
                    if crashes:
                        print(f"sharded-parity child crashed once before "
                              f"passing (known SIGABRT workaround): "
                              f"{crashes[0]!r}")
                    return
                crash = (
                    "Aborted" in r.stderr
                    or "Fatal Python error" in r.stderr
                    or r.returncode < 0          # killed by signal
                )
                if not crash:
                    break  # real assertion failure: don't mask it by retrying
                crashes.append(
                    f"attempt {attempt}: rc={r.returncode}, "
                    f"stderr tail: {r.stderr[-400:]}")
            raise AssertionError(
                f"child run failed after {len(crashes)} crash(es): "
                f"{crashes}\nstdout:\n{r.stdout}\nstderr:\n{r.stderr}"
            )
        self._body(coco_dir)

    def _body(self, coco_dir):
        def helper(host_id, n_hosts):
            ds = ListDataset(coco_dir,
                             trans_fn=lambda dim: T.eval_transform(dim))
            sampler = CyclicSampler(len(ds), 8, seed=0, dim=(64, 64))
            return DataHelper(ds, sampler, max_batches=1, prefetch=0,
                              host_id=host_id, n_hosts=n_hosts)

        single = next(iter(helper(0, 1)))
        h0 = next(iter(helper(0, 2)))
        h1 = next(iter(helper(1, 2)))
        imgs = np.concatenate([h0["img"], h1["img"]])
        labels = np.concatenate([h0["label"], h1["label"]])
        np.testing.assert_array_equal(imgs, single["img"])

        params, state = D.init_yolonet(jax.random.PRNGKey(0), 2,
                                       blocks=(1, 1, 1, 1, 1))
        tcfg = TrainConfig(lr=1e-3, backbone_lr=1e-4)
        tx = make_optimizer(params, tcfg)
        step = make_train_step(CFG, tx)

        def run(imgs, labels, mesh=None):
            i = jnp.asarray(imgs[None].astype(np.float32))
            l = jnp.asarray(labels[None].astype(np.float32))
            p, s, o = params, state, tx.init(params)
            if mesh is not None:
                p = M.replicate(mesh, p)
                s = M.replicate(mesh, s)
                o = M.replicate(mesh, o)
                i, l = M.shard_train_inputs(mesh, i, l)
            p2, *_ = step(p, s, o, i, l)
            return p2

        mesh = M.make_mesh(8, space=1)
        got = run(imgs, labels, mesh)
        want = run(single["img"], single["label"])
        # cross-device reductions reorder float ops; bound absolute drift
        # (measured: <1e-4 on a handful of the 4.7M params after one step)
        for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)


def _run_isolated(nodeid: str, env_flag: str):
    """Run ``nodeid`` in a fresh subprocess with one crash-retry — the
    documented workaround for the known XLA-CPU SIGABRT when tracing
    mesh-sharded steps late in the suite (see
    TestShardedTrainingParity.test_two_host_shards_train_like_one_host).
    Returns True when the caller IS the child and should run the body."""
    import subprocess
    import sys

    if os.environ.get(env_flag) == "1":
        return True
    env = dict(os.environ, **{env_flag: "1"}, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    crashes = []
    for attempt in range(2):
        r = subprocess.run(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider",
             os.path.abspath(__file__) + "::" + nodeid],
            env=env, capture_output=True, text=True, timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        if r.returncode == 0:
            if crashes:
                print(f"isolated child crashed once before passing "
                      f"(known SIGABRT workaround): {crashes[0]!r}")
            return False
        crash = ("Aborted" in r.stderr or "Fatal Python error" in r.stderr
                 or r.returncode < 0)
        if not crash:
            break
        crashes.append(f"attempt {attempt}: rc={r.returncode}, "
                       f"stderr tail: {r.stderr[-400:]}")
    raise AssertionError(
        f"child run failed after {len(crashes)} crash(es): {crashes}\n"
        f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}")


class TestSpaceShardedParity:
    """Numerical parity for the spatially-sharded (``space`` axis) path —
    halo exchange under height-sharded stride-2 convs is exactly what can
    silently produce wrong numbers while compiling fine (VERDICT r4 #2).
    Every pre-round-5 parity test used space=1; these pin space=2 against
    the single-device numbers."""

    def test_space2_train_step_matches_single_device(self, coco_dir):
        if not _run_isolated(
                "TestSpaceShardedParity::test_space2_train_step_matches_"
                "single_device", "YOLO_SPACE_PARITY_CHILD"):
            return
        params, state = D.init_yolonet(jax.random.PRNGKey(0), CFG.num_classes,
                                       blocks=(1, 1, 1, 1, 1))
        tcfg = TrainConfig(lr=1e-3, backbone_lr=1e-4)
        tx = make_optimizer(params, tcfg)
        step = make_train_step(CFG, tx)

        rng = np.random.default_rng(7)
        S, B, dim = 2, 4, 64
        imgs = rng.uniform(0, 1, (S, B, dim, dim, 3)).astype(np.float32)
        labels = np.zeros((S, B, 10, 5), np.float32)
        labels[..., 0, :] = [1, 0.5, 0.5, 0.3, 0.3]
        labels[..., 1, :] = [0, 0.3, 0.6, 0.2, 0.4]

        def run(mesh=None):
            p, s, o = params, state, tx.init(params)
            i, l = jnp.asarray(imgs), jnp.asarray(labels)
            if mesh is not None:
                p, s, o = (M.replicate(mesh, t) for t in (p, s, o))
                i = M.shard_batch(mesh, i,
                                  M.P(None, M.DATA_AXIS, M.SPACE_AXIS))
                l = M.shard_batch(mesh, l, M.P(None, M.DATA_AXIS))
            p2, s2, _, stats = step(p, s, o, i, l)
            return p2, s2, stats

        mesh = M.make_mesh(8, space=2)      # (4, 2): dp x spatial
        got_p, got_s, got_st = run(mesh)
        want_p, want_s, want_st = run()

        # FORWARD parity, tight: raw f32 head activations under the
        # height-sharded mesh vs single device.  This is the direct halo
        # check — a wrong/missing halo exchange corrupts boundary rows of
        # every conv output immediately.
        fwd = jax.jit(lambda p, s, x: D.apply_yolonet(
            p, s, x, training=True)[0])
        x1 = jnp.asarray(imgs[0])
        want_raws = fwd(params, state, x1)
        with mesh:
            got_raws = fwd(M.replicate(mesh, params),
                           M.replicate(mesh, state),
                           M.shard_batch(
                               mesh, x1, M.P(M.DATA_AXIS, M.SPACE_AXIS)))
        for a, b in zip(got_raws, want_raws):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)

        for k in ("loss", "nGT", "nCorrect", "loss_xy", "loss_wh",
                  "loss_conf", "loss_cls"):
            if k in want_st:
                np.testing.assert_allclose(
                    float(got_st[k]), float(want_st[k]),
                    rtol=2e-4, atol=2e-4, err_msg=k)
        # BACKWARD/update parity.  This test CAUGHT a real miscompile:
        # under the Shardy partitioner (this jax's default) the
        # height-sharded full backbone's backward produced BN scale/bias
        # and conv weight gradients up to ~30x too large (verified wrong
        # against a finite-difference oracle; single-device and GSPMD
        # agree with the oracle).  make_mesh(space>1) now forces the
        # legacy GSPMD partitioner (parallel/mesh.py), under which the
        # update drift collapses to reduction-order noise (measured
        # <= 2.4e-5 absolute on every leaf in this config).
        for a, b, p0 in zip(jax.tree.leaves(got_p),
                            jax.tree.leaves(want_p),
                            jax.tree.leaves(params)):
            da = np.asarray(a) - np.asarray(p0)
            db = np.asarray(b) - np.asarray(p0)
            np.testing.assert_allclose(da, db, atol=2e-4)
        for a, b in zip(jax.tree.leaves(got_s), jax.tree.leaves(want_s)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4)

    def test_space2_detect_matches_single_device(self):
        """Height-sharded SERVING: the full detect path under a
        (data=4, space=2) mesh must return the single-device detections
        (XLA inserts the conv halo exchanges; decode/NMS gather the
        sharded heads)."""
        if not _run_isolated(
                "TestSpaceShardedParity::test_space2_detect_matches_"
                "single_device", "YOLO_SPACE_DETECT_CHILD"):
            return
        from yolo_v3_tpu.detector import detect_fn

        params, state = D.init_yolonet(jax.random.PRNGKey(0), CFG.num_classes,
                                       blocks=(1, 1, 1, 1, 1))
        folded = D.cast_params(D.fold_batchnorm(params, state), jnp.bfloat16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
        org = jnp.asarray(np.tile([[96.0, 64.0]], (8, 1)).astype(np.float32))

        fn = jax.jit(lambda p, v, o: detect_fn(
            p, v, o, CFG, conf_thr=0.3, nms_thr=0.45,
            compute_dtype=jnp.bfloat16))
        want = np.asarray(fn(folded, x, org))

        mesh = M.make_mesh(8, space=2)
        with mesh:
            ps = M.replicate(mesh, folded)
            xs = M.shard_batch(mesh, x, M.P(M.DATA_AXIS, M.SPACE_AXIS))
            os_ = M.shard_batch(mesh, org, M.P(M.DATA_AXIS))
            got = np.asarray(fn(ps, xs, os_))
        assert got.shape == want.shape
        np.testing.assert_array_equal(got[..., 7], want[..., 7])  # validity
        np.testing.assert_allclose(got, want, atol=1e-2, rtol=1e-4)


class TestRealTwoProcess:
    def test_two_process_train_step_matches_single(self, tmp_path):
        """REAL multi-process bring-up: two OS processes, localhost
        coordinator, `jax.distributed.initialize` via the env-var path
        (distributed.py:67-75 — dead code in every in-process test), a
        global 2-device CPU mesh, one DP train step with each process
        feeding its local half of the batch.  Params after the step must
        match the single-process run of the same global batch: the psum
        gradient all-reduce rode the cross-process collective."""
        import socket
        import subprocess
        import sys

        worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "dist_worker.py")
        with socket.socket() as s:  # free localhost port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        base = dict(os.environ, JAX_PLATFORMS="cpu",
                    XLA_FLAGS="--xla_force_host_platform_device_count=1",
                    PYTHONPATH=repo + os.pathsep
                    + os.environ.get("PYTHONPATH", ""))
        base.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in children

        def spawn(pid, out):
            env = dict(base, JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                       JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid))
            return subprocess.Popen(
                [sys.executable, worker, out], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)

        got_npz = str(tmp_path / "got.npz")
        procs = [spawn(0, got_npz), spawn(1, got_npz)]
        outs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=600)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                raise
            outs.append(out)
        assert all(p.returncode == 0 for p in procs), (
            f"worker failed:\nproc0:\n{outs[0]}\nproc1:\n{outs[1]}")

        want_npz = str(tmp_path / "want.npz")
        r = subprocess.run([sys.executable, worker, want_npz], env=base,
                           capture_output=True, text=True, timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr

        got, want = np.load(got_npz), np.load(want_npz)
        assert set(got.files) == set(want.files)
        for k in want.files:
            # cross-process psum reorders float reductions; bound drift
            np.testing.assert_allclose(got[k], want[k], atol=2e-4)


class TestCheckpointMeshShape:
    def test_mesh_shape_roundtrip(self, coco_dir, tmp_path):
        from yolo_v3_tpu.train.checkpoint import load_checkpoint, save_checkpoint
        from yolo_v3_tpu.train.recorder import Recorder

        ds = ListDataset(coco_dir, trans_fn=lambda dim: T.eval_transform(dim))
        sampler = CyclicSampler(len(ds), 4, seed=0, dim=(64, 64))
        dh = DataHelper(ds, sampler, max_batches=2, prefetch=0)
        params, state = D.init_yolonet(jax.random.PRNGKey(0), 2,
                                       blocks=(1, 1, 1, 1, 1))
        tx = make_optimizer(params, TrainConfig())
        path = save_checkpoint(dh, params, state, tx.init(params), Recorder(),
                               "m", str(tmp_path), mesh_shape=(4, 2))
        ckpt = load_checkpoint(path)
        assert ckpt["mesh_shape"] == (4, 2)


class TestShardedServing:
    def test_sharded_detect_matches_single_device(self):
        """Data-parallel SERVING: the full detect path (folded forward +
        fused decode + NMS) jitted over a dp mesh returns exactly the
        single-device results — XLA inserts no cross-batch collectives, so
        sharding the batch axis is semantically free."""
        from yolo_v3_tpu.detector import detect_fn

        params, state = D.init_yolonet(jax.random.PRNGKey(0), CFG.num_classes,
                                       blocks=(1, 1, 1, 1, 1))
        folded = D.cast_params(D.fold_batchnorm(params, state), jnp.bfloat16)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (8, 64, 64, 3)).astype(np.float32))
        org = jnp.asarray(np.tile([[96.0, 64.0]], (8, 1)).astype(np.float32))

        fn = jax.jit(lambda p, v, o: detect_fn(
            p, v, o, CFG, conf_thr=0.3, nms_thr=0.45,
            compute_dtype=jnp.bfloat16))
        want = np.asarray(fn(folded, x, org))

        mesh = M.make_mesh(len(jax.devices()), space=1)
        with mesh:
            ps = M.replicate(mesh, folded)
            xs = M.shard_batch(mesh, x, M.P(M.DATA_AXIS))
            os_ = M.shard_batch(mesh, org, M.P(M.DATA_AXIS))
            got = np.asarray(fn(ps, xs, os_))
        np.testing.assert_array_equal(want, got)
