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
import uuid


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


def _read_status(status_path: str) -> dict:
    try:
        with open(status_path) as f:
            return json.load(f)
    except Exception:
        return {}


def _sweep_orphaned_claims(index_dir: str, stale_after_sec: int) -> None:
    """Remove ``.lock.stale-<pid>-<hex>`` dirs left by claimants that
    crashed between the rename-claim and their private rmtree. A claim
    dir is garbage once its claimant pid is dead OR it has aged past the
    staleness deadline (a live claimant deletes its dir within
    milliseconds of the rename, so age >= stale_after_sec can only mean
    an abandoned claim). Two sweepers racing on one orphan both rmtree
    with ignore_errors — harmless, the dir is garbage either way."""
    try:
        names = os.listdir(index_dir)
    except OSError:
        return
    now = time.time()
    for name in names:
        if not name.startswith(".lock.stale-"):
            continue
        path = os.path.join(index_dir, name)
        parts = name.split("-")
        pid = int(parts[1]) if len(parts) >= 3 and parts[1].isdigit() else 0
        try:
            age = now - os.stat(path).st_mtime
        except OSError:
            continue
        if (pid and not _pid_alive(pid)) or age >= stale_after_sec:
            shutil.rmtree(path, ignore_errors=True)


@contextlib.contextmanager
def index_lock(
    index_dir: str, purpose: str = "write", stale_after_sec: int = 24 * 3600
):
    """Acquire the index's writer lock for the duration of the block.

    Takeover is allowed ONLY when the holder pid is provably dead, or the
    lock's age exceeds ``stale_after_sec`` (default 24h — the reference's
    deadline, pipeline/locks.py:88-105). A LIVE holder younger than the
    deadline is never stolen, however long it has run short of it.

    Race discipline: a stale lock is CLAIMED atomically by renaming it to
    a private per-claimant path — of N processes that all observed the
    same dead/expired lock, exactly one rename succeeds, and each
    claimant only ever deletes its own renamed dir. (The earlier
    rmtree-then-mkdir takeover had a window where the loser's rmtree
    deleted the winner's freshly created lock, after which both held it.)
    After the claim, re-acquisition is an ordinary ``mkdir`` race; losing
    it raises IndexLockHeld — the winner's fresh lock is never touched.
    """
    os.makedirs(index_dir, exist_ok=True)
    _sweep_orphaned_claims(index_dir, stale_after_sec)
    lock_dir = os.path.join(index_dir, ".lock")
    status_path = os.path.join(lock_dir, "status.json")
    acquired = False
    for attempt in range(2):
        try:
            os.mkdir(lock_dir)  # atomic iff the lock does not exist
            acquired = True
            break
        except FileExistsError:
            status = _read_status(status_path)
            pid = int(status.get("pid") or 0)
            try:
                age = time.time() - os.stat(lock_dir).st_mtime
            except OSError:
                age = 0.0
            holder_dead = pid > 0 and not _pid_alive(pid)
            stale = holder_dead or age >= stale_after_sec
            if attempt == 0 and stale:
                # atomic claim: one rename wins; the rmtree below touches
                # only the claimant's PRIVATE renamed dir, never lock_dir
                claimed = f"{lock_dir}.stale-{os.getpid()}-{uuid.uuid4().hex[:8]}"
                try:
                    os.rename(lock_dir, claimed)
                except OSError:
                    pass  # another claimant renamed it first; re-race mkdir
                else:
                    shutil.rmtree(claimed, ignore_errors=True)
                continue
            raise IndexLockHeld(
                f"another writer (pid={pid}, purpose={status.get('purpose')}, "
                f"age={int(age)}s) holds the lock on {index_dir}; if it "
                f"crashed, remove {lock_dir}"
            )
    if not acquired:  # defensive: loop exhausted without mkdir or raise
        raise IndexLockHeld(f"could not acquire writer lock on {index_dir}")
    tmp = status_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"pid": os.getpid(), "purpose": purpose,
                   "started_at": time.time()}, f)
    os.replace(tmp, status_path)
    try:
        yield
    finally:
        shutil.rmtree(lock_dir, ignore_errors=True)
