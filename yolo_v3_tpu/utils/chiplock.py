"""Single-chip job serialization: a PID registry file for long TPU runs.

CLAUDE.md rule, mechanized (round-3 failure: a builder-launched training
rerun straddled the round boundary and starved the driver's benchmark —
BENCH_r03 recorded rc=124 with no number).  Long-running chip jobs (CLI
training) register themselves; the benchmark harness refuses to start while
any registered job is alive and instead waits for it, so two TPU clients
never contend for the one chip.

Advisory only — nothing breaks if a process doesn't participate — and
scoped to processes on this host (the chip is reached through a local
tunnel, so every client IS a local process).  The file holds a LIST of
{pid, tag, since} records so concurrent jobs all stay visible (a second
job must not vanish from ``wait_until_free`` just because a first one was
registered — that would recreate the round-3 failure the lock exists to
prevent).  Writes are atomic (tmp + os.replace), so a concurrent reader
never sees a truncated file.  Dead AND zombie PIDs are reaped: a crashed
training child whose parent never waited on it stays a zombie, and
``os.kill(pid, 0)`` alone would count it alive for the full bench timeout.
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import time
from typing import List, Optional

LOCK_PATH = "/tmp/yolo_tpu_chip.lock"


@contextlib.contextmanager
def _mutex():
    """flock-ed critical section for read-modify-write of the registry.

    The atomic-replace write alone only prevents torn READS; two processes
    registering concurrently could each read the old list and one record
    would vanish on the second os.replace — exactly the invisible-second-job
    scenario the list format exists to prevent (round-4 advisor finding).
    A sidecar flock serializes the whole cycle; crashes can't leak it
    (flocks die with the process)."""
    with open(f"{LOCK_PATH}.mutex", "w") as f:
        fcntl.flock(f, fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(f, fcntl.LOCK_UN)


def _read() -> List[dict]:
    try:
        with open(LOCK_PATH) as f:
            data = json.load(f)
    except (FileNotFoundError, ValueError):
        return []
    if isinstance(data, dict):  # legacy single-record file
        return [data]
    return list(data)


def _write(records: List[dict]) -> None:
    tmp = f"{LOCK_PATH}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        json.dump(records, f)
    os.replace(tmp, LOCK_PATH)  # atomic: readers see old or new, never torn


def _alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    # the signal-0 probe counts zombies as alive; check the process state
    try:
        with open(f"/proc/{pid}/stat") as f:
            # field 3 (after the parenthesized comm, which may hold spaces)
            state = f.read().rsplit(")", 1)[1].split()[0]
        return state != "Z"
    except (FileNotFoundError, IndexError, OSError):
        return True  # no /proc — keep the conservative answer


def _live_records_locked() -> List[dict]:
    """Registered records whose processes are alive, reaping the rest.
    Caller must hold ``_mutex()``."""
    recs = _read()
    live = [r for r in recs if _alive(int(r.get("pid", -1)))]
    if len(live) != len(recs):
        if live:
            _write(live)
        else:
            try:
                os.unlink(LOCK_PATH)
            except FileNotFoundError:
                pass
    return live


def _live_records() -> List[dict]:
    with _mutex():
        return _live_records_locked()


def holder() -> Optional[dict]:
    """The oldest live job record {pid, tag, since}, or None."""
    live = _live_records()
    return live[0] if live else None


def acquire(tag: str) -> None:
    """Register this process as a long-running chip job.  Does not block
    on existing holders (the chip tolerates overlap; the point is
    visibility for ``wait_until_free``) — EVERY caller registers, and
    late-comers are warned about who they are contending with."""
    with _mutex():
        live = _live_records_locked()
        if not any(int(r["pid"]) == os.getpid() for r in live):
            live.append({"pid": os.getpid(), "tag": tag, "since": time.time()})
            _write(live)
    others = [r for r in live if int(r["pid"]) != os.getpid()]
    if others:
        import sys

        r = others[0]
        print(
            f"[chiplock] WARNING: chip job already registered: pid "
            f"{r['pid']} ({r.get('tag', '?')}) — two TPU clients will "
            "contend; serialize them (CLAUDE.md)",
            file=sys.stderr, flush=True,
        )


def release() -> None:
    with _mutex():
        recs = _read()
        mine = [r for r in recs if int(r.get("pid", -1)) == os.getpid()]
        if not mine:
            return
        rest = [r for r in recs if int(r.get("pid", -1)) != os.getpid()]
        if rest:
            _write(rest)
        else:
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
