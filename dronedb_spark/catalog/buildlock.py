"""Build locking — cross-process mutual exclusion for artifact builds
(reference: buildlock.cpp/buildlock.h, build.cpp:974 isBuildActive,
tests buildlock_test.cpp / isbuildactive_test.cpp).

Same design as the reference: an EXCLUSIVE KERNEL ADVISORY LOCK on a
per-artifact lock file, not lock-file existence.  The distinction is
the whole point — a process that dies without cleanup leaves the FILE
behind, but the kernel released its LOCK at process exit, so the stale
file is silently reclaimable by the next builder (buildlock.h:117).
Linux 3.15+ open-file-description locks (``F_OFD_SETLK``) are
preferred — per-fd semantics, immune to the classic POSIX
"any close releases all locks" foot-gun — with ``flock`` as the
fallback, mirroring buildlock.cpp:22-33.

The lock file body carries PID + timestamp diagnostics only; nothing
reads it programmatically (buildlock.cpp:118-121 parity).

Spark shape: each build task takes the lock for the one artifact it
writes, so a re-submitted job, a speculative duplicate task, or a
second driver cannot interleave half-written artifacts; the atomic
tmp+rename+_SUCCESS protocol remains the correctness backstop — the
lock only removes wasted duplicate work and tmp-file races.
"""

from __future__ import annotations

import datetime
import os

try:  # Unix only; the container/test environment is always Linux
    import fcntl
except ImportError:  # pragma: no cover
    fcntl = None  # type: ignore[assignment]

LOCK_NAME = ".buildlock"


def _try_lock(fd: int) -> bool:
    """Non-blocking exclusive lock via ``flock`` — per-fd in modern
    kernels, which is the property the reference's OFD-lock preference
    buys (buildlock.cpp:22-33); Python's fcntl has no portable struct
    flock layout for F_OFD_SETLK, and flock carries none of the POSIX
    record-lock "any close releases all locks" hazard."""
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        return True
    except OSError:
        return False


class BuildLockError(RuntimeError):
    pass


class BuildLock:
    """``with BuildLock(path):`` — exclusive advisory lock on ``path``.
    ``wait=False`` raises BuildLockError when another LIVE process holds
    the lock; a stale lock FILE (holder exited) is reclaimed silently."""

    def __init__(self, path: str, wait: bool = True, poll_s: float = 0.05,
                 timeout_s: float = 30.0):
        self.path = path
        self._fd: int | None = None
        import time

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        deadline = time.monotonic() + timeout_s
        while True:
            fd = os.open(path, os.O_RDWR | os.O_CREAT, 0o644)
            if _try_lock(fd):
                self._fd = fd
                stamp = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
                os.ftruncate(fd, 0)
                os.write(fd, f"PID: {os.getpid()}\nAcquired: {stamp}\n".encode())
                os.fsync(fd)
                return
            os.close(fd)
            if not wait:
                raise BuildLockError(f"build lock held: {path}")
            if time.monotonic() > deadline:
                raise BuildLockError(f"timeout waiting for build lock: {path}")
            time.sleep(poll_s)

    def is_locked(self) -> bool:
        return self._fd is not None

    def release(self) -> None:
        """Early release (destructor parity: close drops the kernel lock
        automatically; the file is removed best-effort)."""
        if self._fd is None:
            return
        try:
            os.close(self._fd)
        finally:
            self._fd = None
            try:
                os.remove(self.path)
            except OSError:
                pass

    def __enter__(self) -> "BuildLock":
        return self

    def __exit__(self, *exc) -> None:
        self.release()

    def __del__(self):  # destructor parity with the C++ RAII class
        self.release()


def lock_path(root: str, hash_: str, kind: str) -> str:
    from dronedb_spark.catalog.build import _artifact_dir

    return os.path.join(_artifact_dir(root, hash_, kind), LOCK_NAME)


def is_build_active(root: str, hash_: str, kind: str) -> bool:
    """isBuildActive (build.cpp:974): TRUE only while a live process
    holds the artifact's lock — a leftover lock file alone is not
    active (the kernel dropped the dead holder's lock)."""
    p = lock_path(root, hash_, kind)
    if not os.path.exists(p):
        return False
    fd = os.open(p, os.O_RDWR)
    try:
        return not _try_lock(fd)
    finally:
        os.close(fd)  # releases our probe lock if we won it
