"""Exclusive writer lock per index_dir (SURVEY.md §2.10 I6).

Reference semantics: pipeline/locks.py:35-121 — atomic ``mkdir`` as the
lock primitive, a status file recording holder pid/start time, staleness
takeover (dead pid or age past a deadline), and a loud, actionable error
when the lock is genuinely held. Two concurrent writers on one index_dir
would interleave manifest publishes and corrupt it silently; this makes
the second writer fail fast instead.

Portability note: atomic mkdir is a POSIX-filesystem primitive. On object
storage the same role is played by a conditional PUT (if-none-match) of
the status object — same protocol, one swapped primitive.
"""

from __future__ import annotations

import contextlib
import json
import os
import shutil
import time


class IndexLockHeld(RuntimeError):
    pass


def _pid_alive(pid: int) -> bool:
    if pid <= 0:
        return False
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


@contextlib.contextmanager
def index_lock(index_dir: str, purpose: str = "write", stale_after_sec: int = 3600):
    """Acquire the index's writer lock for the duration of the block.

    A lock whose holder pid is dead, or whose age exceeds
    ``stale_after_sec``, is taken over (crash recovery — the reference's
    stale-lock cleanup, pipeline/locks.py:88-105).
    """
    os.makedirs(index_dir, exist_ok=True)
    lock_dir = os.path.join(index_dir, ".lock")
    status_path = os.path.join(lock_dir, "status.json")
    for attempt in range(2):
        try:
            os.mkdir(lock_dir)  # atomic iff the lock does not exist
            break
        except FileExistsError:
            status: dict = {}
            try:
                with open(status_path) as f:
                    status = json.load(f)
            except Exception:
                pass
            pid = int(status.get("pid") or 0)
            try:
                age = time.time() - os.stat(lock_dir).st_mtime
            except OSError:
                age = 0.0
            if _pid_alive(pid) and age < stale_after_sec and attempt == 0:
                raise IndexLockHeld(
                    f"another writer (pid={pid}, purpose={status.get('purpose')}, "
                    f"age={int(age)}s) holds the lock on {index_dir}; if it "
                    f"crashed, remove {lock_dir}"
                )
            shutil.rmtree(lock_dir, ignore_errors=True)  # stale: take over
    tmp = status_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"pid": os.getpid(), "purpose": purpose,
                   "started_at": time.time()}, f)
    os.replace(tmp, status_path)
    try:
        yield
    finally:
        shutil.rmtree(lock_dir, ignore_errors=True)
