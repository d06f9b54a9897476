"""Writer mutual exclusion for index mutations.

The reference serializes index writers with a PID lock file and
stale-holder detection (/root/reference/caterpillar/locking.py:50-195,
contention-tested across 16 processes in
processing/test/test_index.py:736-774).  The Spark rebuild's manifest
swap keeps READERS consistent and the batch ledger makes REPLAYS
idempotent, but until round 5 two concurrent ``append_batch`` callers
on one index path could interleave appends and race the manifest
revision — single-writer was an unstated assumption.  This module
makes it a guarded one.

Mechanics: ``O_CREAT | O_EXCL`` creation of ``<index>/.write.lock``
holding (pid, host, wall time) — creation is the atomic acquire;
waiters poll up to ``timeout``.  A lock is STALE when its holder pid
is dead on this host, or its age exceeds ``stale_after`` (covers
holders on other hosts against a shared filesystem).  Stale takeover
is race-free via rename: only one waiter's ``os.rename`` of the stale
file can succeed, so two waiters can never both "break" the lock and
then both acquire.

Driver-side only: the lock guards the mutation CONTROL FLOW (manifest
read → Spark jobs → manifest write); executor tasks never touch it.
"""

from __future__ import annotations

import json
import os
import socket
import time
import uuid
from contextlib import contextmanager

__all__ = ["WriterLockTimeout", "write_lock"]

LOCK_NAME = ".write.lock"


class WriterLockTimeout(TimeoutError):
    """Another writer holds the index write lock and did not release it
    within the acquisition timeout."""


def _lock_info(lock_path: str):
    try:
        with open(lock_path) as f:
            return json.load(f)
    except (FileNotFoundError, json.JSONDecodeError, OSError):
        return None


def _is_stale(lock_path: str, stale_after: float) -> bool:
    info = _lock_info(lock_path)
    if info is None:
        # unreadable/corrupt (e.g. holder died mid-write): stale once
        # it stops being brand-new
        try:
            return time.time() - os.path.getmtime(lock_path) > 5.0
        except OSError:
            return False  # vanished: the holder released; just retry
    if time.time() - float(info.get("ts", 0)) > stale_after:
        return True
    if info.get("host") == socket.gethostname():
        pid = int(info.get("pid", -1))
        if pid > 0:
            try:
                os.kill(pid, 0)
            except ProcessLookupError:
                return True  # holder process is gone on this host
            except PermissionError:
                pass  # alive, owned by someone else
    return False


def _try_break(lock_path: str) -> None:
    """Atomically take over a stale lock: rename wins exactly once."""
    token = f"{lock_path}.stale.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    try:
        os.rename(lock_path, token)
    except OSError:
        return  # someone else broke or the holder released — retry acquire
    try:
        os.unlink(token)
    except OSError:
        pass


@contextmanager
def write_lock(
    index_path: str,
    timeout: float = 300.0,
    poll: float = 0.05,
    stale_after: float = 3600.0,
):
    """Acquire the index's writer lock for the duration of the block.

    Blocks up to ``timeout`` seconds waiting for a live holder (index
    mutations run Spark jobs — the default accommodates a slow
    concurrent append), breaking stale locks along the way; raises
    :class:`WriterLockTimeout` if a live writer never releases."""
    os.makedirs(index_path, exist_ok=True)
    lock_path = os.path.join(index_path, LOCK_NAME)
    payload = json.dumps(
        {"pid": os.getpid(), "host": socket.gethostname(), "ts": time.time()}
    ).encode()
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            try:
                os.write(fd, payload)
            finally:
                os.close(fd)
            break
        except FileExistsError:
            if _is_stale(lock_path, stale_after):
                _try_break(lock_path)
                continue
            if time.monotonic() >= deadline:
                info = _lock_info(lock_path)
                raise WriterLockTimeout(
                    f"index at {index_path} is write-locked by {info}; "
                    "another writer is active (or raise timeout=)"
                )
            time.sleep(poll)
    try:
        yield
    finally:
        try:
            os.unlink(lock_path)
        except FileNotFoundError:
            pass
