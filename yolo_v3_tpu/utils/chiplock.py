"""Single-chip job serialization: a PID lockfile for long TPU runs.

CLAUDE.md rule, mechanized (round-3 failure: a builder-launched training
rerun straddled the round boundary and starved the driver's benchmark —
BENCH_r03 recorded rc=124 with no number).  Long-running chip jobs (CLI
training) register themselves; the benchmark harness refuses to start while
a registered job is alive and instead waits for it, so two TPU clients
never contend for the one chip.

Advisory only — nothing breaks if a process doesn't participate — and
scoped to processes on this host (the chip is reached through a local
tunnel, so every client IS a local process).  Stale locks (dead PID) are
reaped automatically.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

LOCK_PATH = "/tmp/yolo_tpu_chip.lock"


def _read() -> Optional[dict]:
    try:
        with open(LOCK_PATH) as f:
            return json.load(f)
    except (FileNotFoundError, ValueError):
        return None


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except ProcessLookupError:
        return False
    except PermissionError:
        return True


def holder() -> Optional[dict]:
    """The live lock record {pid, tag, since}, or None (reaping stale)."""
    rec = _read()
    if rec is None:
        return None
    if not _alive(int(rec.get("pid", -1))):
        try:
            os.unlink(LOCK_PATH)
        except FileNotFoundError:
            pass
        return None
    return rec


def acquire(tag: str) -> None:
    """Register this process as the chip's long-running job.  Does not
    block on an existing holder (the chip tolerates overlap; the point is
    visibility for ``wait_until_free``), but refuses to silently replace a
    live one — late-comers see who they are contending with."""
    rec = holder()
    if rec is not None and int(rec["pid"]) != os.getpid():
        import sys

        print(
            f"[chiplock] WARNING: chip job already registered: pid "
            f"{rec['pid']} ({rec.get('tag', '?')}) — two TPU clients will "
            "contend; serialize them (CLAUDE.md)",
            file=sys.stderr, flush=True,
        )
        return
    with open(LOCK_PATH, "w") as f:
        json.dump({"pid": os.getpid(), "tag": tag, "since": time.time()}, f)


def release() -> None:
    rec = _read()
    if rec is not None and int(rec.get("pid", -1)) == os.getpid():
        try:
            os.unlink(LOCK_PATH)
        except FileNotFoundError:
            pass


def wait_until_free(timeout_s: float = 1800.0,
                    poll_s: float = 10.0,
                    log=None) -> bool:
    """Block until no registered chip job is alive (True) or the timeout
    expires (False).  The benchmark harness calls this first so a stray
    training run finishes instead of corrupting the measurement."""
    t0 = time.time()
    while True:
        rec = holder()
        if rec is None:
            return True
        if time.time() - t0 > timeout_s:
            return False
        if log is not None:
            log(
                f"chip busy: pid {rec['pid']} ({rec.get('tag', '?')}, "
                f"{time.time() - float(rec.get('since', t0)):.0f}s); waiting"
            )
        time.sleep(poll_s)
