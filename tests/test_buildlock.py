"""Build locking (catalog/buildlock.py; reference buildlock.cpp,
buildlock_test.cpp / isbuildactive_test.cpp)."""

from __future__ import annotations

import multiprocessing
import os

import pytest

from dronedb_spark.catalog.buildlock import (
    BuildLock,
    BuildLockError,
    is_build_active,
    lock_path,
)


def test_acquire_writes_diagnostics_release_removes(tmp_path):
    p = str(tmp_path / "x.lock")
    lk = BuildLock(p, wait=False)
    assert lk.is_locked()
    body = open(p).read()
    assert f"PID: {os.getpid()}" in body and "Acquired: " in body
    lk.release()
    assert not lk.is_locked()
    assert not os.path.exists(p)
    lk.release()  # double release is a no-op


def test_contention_nonblocking_raises(tmp_path):
    p = str(tmp_path / "x.lock")
    with BuildLock(p, wait=False):
        with pytest.raises(BuildLockError, match="held"):
            BuildLock(p, wait=False)
    # released → acquirable again
    with BuildLock(p, wait=False):
        pass


def test_stale_lock_file_is_reclaimed(tmp_path):
    # a leftover FILE without a kernel lock (holder died) must not block
    p = str(tmp_path / "x.lock")
    with open(p, "w") as f:
        f.write("PID: 99999\nAcquired: 2020-01-01 00:00:00\n")
    with BuildLock(p, wait=False) as lk:
        assert lk.is_locked()


def test_wait_mode_times_out(tmp_path):
    p = str(tmp_path / "x.lock")
    with BuildLock(p, wait=False):
        with pytest.raises(BuildLockError, match="timeout"):
            BuildLock(p, wait=True, poll_s=0.01, timeout_s=0.1)


def _hold(path, acquired, release):  # pragma: no cover - child process
    from dronedb_spark.catalog.buildlock import BuildLock

    with BuildLock(path, wait=False):
        acquired.set()
        release.wait(10)


def test_cross_process_exclusion(tmp_path):
    p = str(tmp_path / "x.lock")
    ctx = multiprocessing.get_context("fork")
    acquired, release = ctx.Event(), ctx.Event()
    child = ctx.Process(target=_hold, args=(p, acquired, release))
    child.start()
    try:
        assert acquired.wait(10)
        with pytest.raises(BuildLockError):
            BuildLock(p, wait=False)
    finally:
        release.set()
        child.join(10)
    with BuildLock(p, wait=False):  # child exited → lock free
        pass


def test_is_build_active_tracks_lock_not_file(tmp_path):
    root = str(tmp_path)
    assert is_build_active(root, "h0", "thumb") is False  # no file
    p = lock_path(root, "h0", "thumb")
    os.makedirs(os.path.dirname(p), exist_ok=True)
    open(p, "w").write("PID: 1\n")
    assert is_build_active(root, "h0", "thumb") is False  # stale file only
    with BuildLock(p):
        assert is_build_active(root, "h0", "thumb") is True
    assert is_build_active(root, "h0", "thumb") is False


def test_build_one_relocks_and_shortcircuits(tmp_path):
    from dronedb_spark.catalog.build import build_one
    from dronedb_spark.sources.gsplat import _gs_spec, encode_splat_binary

    data = encode_splat_binary([_gs_spec(i) for i in range(3)])
    assert build_one(str(tmp_path), "a.splat", "h1", "gsplat", data) == "built"
    # complete artifact → the locked re-check short-circuits
    assert build_one(str(tmp_path), "a.splat", "h1", "gsplat", data) == "already_built"


def test_cleanup_drops_vanished_entries_and_orphan_artifacts(spark, tmp_path):
    import os

    from dronedb_spark.catalog.build import build_all, cleanup
    from dronedb_spark.catalog.store import DatasetCatalog
    from dronedb_spark.sources.gsplat import _gs_spec, encode_splat_binary

    (tmp_path / "a.splat").write_bytes(encode_splat_binary([_gs_spec(i) for i in range(4)]))
    (tmp_path / "b.splat").write_bytes(encode_splat_binary([_gs_spec(i) for i in range(9)]))
    cat = DatasetCatalog.init(spark, str(tmp_path))
    cat.add()
    assert build_all(cat) == {"gsplat": 2}
    build_root = tmp_path / ".ddb_spark" / "build"
    assert len(os.listdir(build_root)) == 2

    # nothing to clean yet
    assert cleanup(cat) == {"removed_entries": 0, "removed_artifacts": 0}

    # delete one file → its entry AND its artifact are swept
    os.remove(tmp_path / "b.splat")
    out = cleanup(cat)
    assert out == {"removed_entries": 1, "removed_artifacts": 1}
    assert len(os.listdir(build_root)) == 1
    paths = {r["path"] for r in cat.entries().collect()}
    assert "b.splat" not in paths and "a.splat" in paths
