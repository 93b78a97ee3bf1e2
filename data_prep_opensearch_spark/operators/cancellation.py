"""Cooperative cancellation for long-running index writers (SURVEY.md
§2.10 I5; reference semantics: common/cancellation.py:10-12 — a shared
flag that work loops poll at safe points, never a hard kill).

The flag is a small JSON file inside the index dir, so any process that
can reach the index can request a stop (the reference's cancel endpoint
does exactly this through its job store). Writers poll BETWEEN commit
groups / merge passes — the only safe points, since a group commit is
atomic via the manifest swap. A build that honors a cancel:

  - returns ``{"status": "interrupted", "cancelled": True, ...}``,
  - leaves a fully resumable index (completed groups committed + lineage),
  - releases the writer lock (context-managed),
  - CONSUMES the flag — the next run starts fresh rather than
    immediately re-cancelling.

On object storage the file is one small PUT/GET/DELETE — same protocol.
"""

from __future__ import annotations

import json
import os
import time

_FLAG = ".cancel"


def request_cancel(index_dir: str, reason: str = "") -> None:
    """Ask the current (or next) writer on ``index_dir`` to stop at its
    next safe point. Idempotent."""
    os.makedirs(index_dir, exist_ok=True)
    tmp = os.path.join(index_dir, _FLAG + ".tmp")
    with open(tmp, "w") as f:
        json.dump(
            {"requested_at": time.time(), "pid": os.getpid(), "reason": reason},
            f,
        )
    os.replace(tmp, os.path.join(index_dir, _FLAG))


def cancel_requested(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, _FLAG))


def clear_cancel(index_dir: str) -> None:
    try:
        os.remove(os.path.join(index_dir, _FLAG))
    except FileNotFoundError:
        pass


def consume_cancel(index_dir: str) -> dict:
    """Read-and-clear: returns the request payload ({} if unreadable).
    Called by the writer that HONORS the cancel, so the flag does not
    leak into the next run."""
    path = os.path.join(index_dir, _FLAG)
    payload: dict = {}
    try:
        with open(path) as f:
            payload = json.load(f)
    except Exception:
        pass
    clear_cancel(index_dir)
    return payload
