"""Serialize CPU-heavy runs (bench.py, verify_oracle.py, pytest-driven
full suites) through one flock'd lockfile.

Two of these running concurrently on the same host contend for every
core: the round-3 and round-4 logs both recorded bench numbers inflated
2x and spurious test failures from exactly that overlap. Acquiring the
lock BLOCKS until the other run finishes (fail-open if the lock module
is unavailable), so a forgotten background bench can no longer corrupt
a verify run started on top of it.

Usage:
    from tools.runlock import acquire_run_lock
    _lock = acquire_run_lock("bench")       # blocks; released at exit
"""

from __future__ import annotations

import os
import sys

LOCK_PATH = "/tmp/memfuse_spark_run.lock"


def acquire_run_lock(label: str, path: str = LOCK_PATH):
    """Block until the host-wide run lock is free, then hold it for the
    lifetime of the returned file object (the OS releases the flock when
    the process exits, so crashes can't wedge the lock)."""
    try:
        import fcntl
    except ImportError:  # non-POSIX fallback: fail open
        return None
    fh = open(path, "a+")
    try:
        fcntl.flock(fh, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        holder = ""
        try:
            fh.seek(0)
            holder = fh.read().strip()
        except OSError:
            pass
        print(
            f"[runlock] waiting for {path}"
            + (f" (held by: {holder})" if holder else ""),
            file=sys.stderr,
            flush=True,
        )
        fcntl.flock(fh, fcntl.LOCK_EX)  # block until free
    fh.seek(0)
    fh.truncate()
    fh.write(f"{label} pid={os.getpid()}\n")
    fh.flush()
    return fh
