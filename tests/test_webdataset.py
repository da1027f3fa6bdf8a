"""WebDataset shards: byte-reproducibility, key grouping, member
order, and the malformed-input boundary."""

from __future__ import annotations

import io
import tarfile

from dronedb_spark.sources.webdataset import read_shard, write_shard


def _samples():
    return [
        ("000002", {"gif": b"\x47\x49imgB", "txt": b"beta"}),
        ("000001", {"txt": b"alpha", "gif": b"\x47\x49imgA"}),
    ]


def test_roundtrip_members():
    data = write_shard(_samples())
    got = read_shard(data)
    assert got == [
        ("000001", "gif", b"\x47\x49imgA"),
        ("000001", "txt", b"alpha"),
        ("000002", "gif", b"\x47\x49imgB"),
        ("000002", "txt", b"beta"),
    ]


def test_byte_reproducible():
    """Same samples in any dict/list order → identical shard bytes
    (zeroed mtimes/owners, sorted members) — the property shard-level
    sync hashes rely on."""
    a = write_shard(_samples())
    b = write_shard(list(reversed(_samples())))
    assert a == b
    # and stable across calls
    assert write_shard(_samples()) == a


def test_members_are_valid_posix_tar():
    data = write_shard(_samples())
    with tarfile.open(fileobj=io.BytesIO(data)) as tf:
        names = tf.getnames()
    assert names == ["000001.gif", "000001.txt", "000002.gif", "000002.txt"]


def test_consecutive_key_grouping():
    """The WebDataset contract: a sample's members are CONSECUTIVE in
    the stream so loaders never buffer across samples."""
    data = write_shard(_samples())
    keys = [k for k, _, _ in read_shard(data)]
    seen, prev = set(), None
    for k in keys:
        if k != prev:
            assert k not in seen, f"key {k} split across the stream"
            seen.add(k)
        prev = k


def test_extensionless_member():
    data = write_shard([("k", {"": b"raw"})])
    # "k." member: rpartition gives key "k", ext ""
    [(k, ext, payload)] = read_shard(data)
    assert (k, payload) == ("k", b"raw")


def test_truncated_shard_raises_cleanly():
    data = write_shard(_samples())[:-700]
    try:
        read_shard(data)
    except Exception:
        pass  # any clean exception is fine — the Spark kernel skips per file
