"""Unit tests for recorder, display, profiling, and config utilities."""

import json
import time

import numpy as np
import pytest

from yolo_v3_tpu.train.display import ProgressDisplay, stats_header, stats_row
from yolo_v3_tpu.train.recorder import Recorder, ewma_online
from yolo_v3_tpu.utils.config import TrainConfig, YoloConfig, anchors_flat
from yolo_v3_tpu.utils.profiling import StepTimer


class TestRecorder:
    def test_raw_policy_tracks_latest(self):
        r = Recorder()
        r.on_batch_end({"loss": 5.0, "loss_x": 1.0, "recall": 0.5})
        r.on_batch_end({"loss": 3.0, "loss_x": 0.5, "recall": 0.7})
        assert r.current_stats["loss"] == 3.0
        assert r.current_stats["recall"] == 0.7

    def test_ewma_policy(self):
        r = Recorder(ewma_window=9)  # alpha = 0.2
        r.on_batch_end({"loss": 10.0})
        r.on_batch_end({"loss": 0.0})
        assert r.current_stats["loss"] == pytest.approx(8.0)
        assert ewma_online(0.0, 10.0, 9) == pytest.approx(8.0)

    def test_state_roundtrip(self):
        r = Recorder()
        r.on_batch_end({"loss": 2.5, "recall": 0.4})
        sd = r.state_dict()
        r2 = Recorder()
        r2.load_state_dict(sd)
        assert r2.current_stats["loss"] == 2.5

    def test_stats_row_contains_values(self):
        r = Recorder()
        r.on_batch_end({"loss": 2.5})
        assert "loss=2.5" in r.stats_row()


class TestDisplay:
    def test_header_and_row_fixed_width(self):
        h = stats_header()
        r = Recorder()
        r.on_batch_end({"loss": 1.0, "loss_x": 0.1, "recall": 0.5})
        row = stats_row(3, 1, r)
        assert "net_batch" in h and row.startswith("        3     1")

    def test_progress_display_smoke(self, capsys):
        class FakeData:
            def get_net_batch(self): return 1
            def get_epoch(self): return 0
            def get_epoch_batch(self): return 1
            def get_epoch_num_batches(self): return 4
            def is_start_of_epoch(self): return False

        d = ProgressDisplay(FakeData(), use_tqdm=False)
        r = Recorder()
        r.on_batch_end({"loss": 1.0})
        d.update(r)
        d.close()


class TestStepTimer:
    def test_summary_fields(self):
        t = StepTimer(warmup=0)
        for _ in range(3):
            with t.step(n_items=4):
                time.sleep(0.01)
        s = t.summary()
        assert s["steps"] == 3
        assert s["p50_ms"] >= 10.0
        assert s["items_per_sec"] > 0


class TestConfig:
    def test_json_roundtrip(self):
        cfg = YoloConfig(num_classes=5, img_dim=320)
        cfg2 = YoloConfig.from_json(cfg.to_json())
        assert cfg2 == cfg
        assert isinstance(cfg2.anchors[0], tuple)

    def test_hashable_for_jit_static(self):
        assert hash(YoloConfig()) == hash(YoloConfig())
        assert hash(YoloConfig(num_classes=3)) != hash(YoloConfig())

    def test_anchors_flat(self):
        assert anchors_flat(((1, 2), (3, 4)))== (1.0, 2.0, 3.0, 4.0)

    def test_derived_props(self):
        cfg = YoloConfig(num_classes=20)
        assert cfg.bbox_attrib == 25
        assert cfg.num_scales == 3 and cfg.anchors_per_scale == 3


class TestChipLock:
    def test_acquire_release_and_wait(self, tmp_path, monkeypatch):
        from yolo_v3_tpu.utils import chiplock as CL

        monkeypatch.setattr(CL, "LOCK_PATH", str(tmp_path / "chip.lock"))
        assert CL.holder() is None
        assert CL.wait_until_free(timeout_s=0.1)
        CL.acquire("test-job")
        rec = CL.holder()
        assert rec is not None and rec["pid"] == __import__("os").getpid()
        assert not CL.wait_until_free(timeout_s=0.2, poll_s=0.05)
        CL.release()
        assert CL.holder() is None
        assert CL.wait_until_free(timeout_s=0.1)

    def test_stale_lock_reaped(self, tmp_path, monkeypatch):
        import json

        from yolo_v3_tpu.utils import chiplock as CL

        monkeypatch.setattr(CL, "LOCK_PATH", str(tmp_path / "chip.lock"))
        # legacy single-record format is still understood
        with open(CL.LOCK_PATH, "w") as f:
            json.dump({"pid": 2 ** 22 + 12345, "tag": "dead", "since": 0}, f)
        assert CL.holder() is None  # dead pid -> reaped
        import os.path as osp
        assert not osp.exists(CL.LOCK_PATH)

    def test_second_job_stays_visible(self, tmp_path, monkeypatch):
        """A job arriving while another is registered must STILL register:
        if it stayed invisible, the first job's release would free the
        bench while the second is mid-run (the round-3 failure)."""
        import json
        import os

        from yolo_v3_tpu.utils import chiplock as CL

        monkeypatch.setattr(CL, "LOCK_PATH", str(tmp_path / "chip.lock"))
        # a live foreign holder (this very pytest process under another
        # record id is the simplest always-alive pid: use pid 1)
        with open(CL.LOCK_PATH, "w") as f:
            json.dump([{"pid": 1, "tag": "other", "since": 0}], f)
        CL.acquire("second-job")
        recs = json.load(open(CL.LOCK_PATH))
        assert {int(r["pid"]) for r in recs} == {1, os.getpid()}
        # releasing the second job leaves the first registered
        CL.release()
        recs = json.load(open(CL.LOCK_PATH))
        assert [int(r["pid"]) for r in recs] == [1]
        assert not CL.wait_until_free(timeout_s=0.2, poll_s=0.05)

    def test_concurrent_registration_loses_no_record(self, tmp_path,
                                                     monkeypatch):
        """N processes acquiring at once must all end up registered: the
        read-modify-write cycle is flock-serialized (round-4 advisor
        finding — atomic replace alone allowed lost updates)."""
        import json
        import multiprocessing as mp
        import os

        from yolo_v3_tpu.utils import chiplock as CL

        monkeypatch.setattr(CL, "LOCK_PATH", str(tmp_path / "chip.lock"))
        n = 8
        barrier = mp.Barrier(n + 1)
        done = mp.Event()

        def job():
            barrier.wait()          # maximise contention
            CL.acquire("c-job")
            barrier.wait()          # parent reads while children live
            done.wait(10)

        procs = [mp.Process(target=job) for _ in range(n)]
        for p in procs:
            p.start()
        barrier.wait()
        barrier.wait()
        try:
            recs = json.load(open(CL.LOCK_PATH))
            pids = {int(r["pid"]) for r in recs}
            assert pids == {p.pid for p in procs}, (
                f"lost {n - len(pids & {p.pid for p in procs})} records")
        finally:
            done.set()
            for p in procs:
                p.join(10)
        # all children exited -> reaped on next read
        assert CL.holder() is None or CL.holder()["pid"] == os.getpid()
