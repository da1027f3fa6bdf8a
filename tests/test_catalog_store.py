"""End-to-end tests for the Parquet-backed DatasetCatalog write path
(SURVEY W1-W8, J7) over a real temp directory tree."""

from __future__ import annotations

import os
import time

import pytest

from dronedb_spark.catalog.derive import ENTRY_TYPES
from dronedb_spark.catalog.store import DatasetCatalog
from dronedb_spark.sources.fingerprint import fingerprint


@pytest.fixture()
def tree(tmp_path):
    (tmp_path / "images").mkdir()
    (tmp_path / "docs").mkdir()
    (tmp_path / "README.md").write_text("# dataset\n")
    (tmp_path / "docs" / "notes.txt").write_text("hello world\n")
    # fake JPEG: correct magic so the sniffer accepts it
    (tmp_path / "images" / "a.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    (tmp_path / "images" / "b.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x01" * 64)
    # fake LAS point cloud
    (tmp_path / "cloud.las").write_bytes(b"LASF" + b"\x00" * 128)
    return tmp_path


def test_fingerprint_unit():
    assert fingerprint("x/a.jpg", b"\xff\xd8\xff\xe0") == ENTRY_TYPES["Image"]
    assert fingerprint("a.jpg", b"NOTJPEG") == ENTRY_TYPES["Generic"]
    assert fingerprint("r.tif") == ENTRY_TYPES["GeoRaster"]
    assert fingerprint("c.las", b"LASF") == ENTRY_TYPES["PointCloud"]
    assert fingerprint("m.md") == ENTRY_TYPES["Markdown"]
    assert fingerprint("v.geojson") == ENTRY_TYPES["Vector"]
    assert fingerprint("s.ply", b"ply\nformat ascii\nelement vertex 5\nproperty float f_dc_0\n") == ENTRY_TYPES["GaussianSplat"]
    assert fingerprint("p.ply", b"ply\nformat ascii\nelement vertex 5\n") == ENTRY_TYPES["PointCloud"]
    assert fingerprint("d", is_dir=True) == ENTRY_TYPES["Directory"]
    assert fingerprint("x.unknownext") == ENTRY_TYPES["Generic"]


def test_init_add_search(spark, tree):
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    e = cat.entries()
    by_path = {r["path"]: r for r in e.collect()}
    assert set(by_path) == {
        "README.md", "docs", "docs/notes.txt", "images", "images/a.jpg",
        "images/b.jpg", "cloud.las",
    }
    assert by_path["README.md"]["type"] == ENTRY_TYPES["Markdown"]
    assert by_path["images/a.jpg"]["type"] == ENTRY_TYPES["Image"]
    assert by_path["cloud.las"]["type"] == ENTRY_TYPES["PointCloud"]
    assert by_path["images"]["type"] == ENTRY_TYPES["Directory"]
    assert by_path["images"]["hash"] == ""
    assert by_path["docs/notes.txt"]["depth"] == 1
    # sha256 of content is present and stable
    import hashlib

    assert by_path["docs/notes.txt"]["hash"] == hashlib.sha256(b"hello world\n").hexdigest()


def test_add_mtime_shortcircuit(spark, tree):
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    h0 = {r["path"]: r["hash"] for r in cat.entries().collect()}
    # touch with same mtime → content NOT re-read even though bytes changed
    p = tree / "docs" / "notes.txt"
    st = p.stat()
    p.write_text("changed!\n")
    os.utime(p, (st.st_atime, st.st_mtime))
    cat.add()
    h1 = {r["path"]: r["hash"] for r in cat.entries().collect()}
    assert h1["docs/notes.txt"] == h0["docs/notes.txt"]  # short-circuited
    # now bump mtime → re-hashed
    os.utime(p, (st.st_atime, st.st_mtime + 10))
    cat.add()
    h2 = {r["path"]: r["hash"] for r in cat.entries().collect()}
    assert h2["docs/notes.txt"] != h0["docs/notes.txt"]


def test_remove_subtree(spark, tree):
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    n = cat.remove("images")
    assert n == 3  # the folder row + 2 jpgs
    paths = {r["path"] for r in cat.entries().collect()}
    assert paths == {"README.md", "docs", "docs/notes.txt", "cloud.las"}


def test_move_subtree(spark, tree):
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    cat.move("images", "archive/img")
    paths = {r["path"]: r["depth"] for r in cat.entries().collect()}
    assert "archive/img/a.jpg" in paths
    assert paths["archive/img/a.jpg"] == 2
    assert "images/a.jpg" not in paths


def test_status_and_sync(spark, tree):
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    (tree / "new.txt").write_text("new\n")
    os.remove(tree / "cloud.las")
    p = tree / "README.md"
    os.utime(p, (time.time(), time.time() + 99))
    st = {r["path"]: r["status"] for r in cat.status().collect()}
    assert st["new.txt"] == "NotIndexed"
    assert st["cloud.las"] == "Deleted"
    assert st["README.md"] == "Modified"
    assert st["docs/notes.txt"] == "NotModified"
    cat.sync()
    paths = {r["path"] for r in cat.entries().collect()}
    assert "new.txt" in paths and "cloud.las" not in paths


def test_meta_manager(spark, tree):
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    cat.meta_set("name", '"my dataset"')
    cat.meta_set("name", '"renamed"')  # singular: replace
    assert cat.meta_get("name") == ['"renamed"']
    cat.meta_add("tags", '"aerial"')
    cat.meta_add("tags", '"2026"')  # plural: append
    assert len(cat.meta_get("tags")) == 2
    with pytest.raises(ValueError):
        cat.meta_set("tags", "x")
    with pytest.raises(ValueError):
        cat.meta_add("name", "x")
    assert cat.meta_unset("tags") == 2
    assert cat.meta_get("tags") == []


def test_stamp_and_delta(spark, tree, tmp_path_factory):
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    s1 = cat.stamp()
    assert len(s1) == 64
    # identical tree → identical stamp (content-addressed)
    other_root = tmp_path_factory.mktemp("other")
    import shutil

    for item in os.listdir(tree):
        if item == ".ddb_spark":
            continue
        src = tree / item
        dst = other_root / item
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy2(src, dst)
    cat2 = DatasetCatalog.init(spark, str(other_root))
    cat2.add()
    # same paths+hashes and no meta on either side → identical stamps
    assert cat2.stamp() == s1
    # mutate other: delta must see it
    (other_root / "extra.txt").write_text("x")
    cat2.add()
    d = cat2.delta(cat)
    adds = {r["path"] for r in d["adds"].collect()}
    assert adds == {"extra.txt"}


def test_snapshot_history_and_vacuum(spark, tmp_path):
    from dronedb_spark.catalog.store import DatasetCatalog

    root = tmp_path / "vacds"
    root.mkdir()
    (root / "a.txt").write_text("a")
    cat = DatasetCatalog.init(spark, str(root))
    cat.add()
    (root / "b.txt").write_text("b")
    cat.add()
    (root / "c.txt").write_text("c")
    cat.add()
    hist = cat.history()
    assert len(hist["entries"]) >= 4  # init + 3 adds
    victims = cat.vacuum(keep=2)
    assert victims["entries"], "expected old snapshots to be removed"
    hist2 = cat.history()
    assert len(hist2["entries"]) == 2
    # CURRENT still readable after vacuum
    paths = {r["path"] for r in cat.entries().collect()}
    assert {"a.txt", "b.txt", "c.txt"} <= paths


def test_partial_add_keeps_rest_of_index(spark, tree):
    """ADVICE r1 (high): add(rel_paths) must upsert ONLY those paths and
    keep every other indexed entry — the reference's addToIndex never
    deletes (deletion is sync's job)."""
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    before = {r["path"] for r in cat.entries().collect()}
    (tree / "docs" / "late.txt").write_text("late\n")
    cat.add(rel_paths=["docs/late.txt"])
    after = {r["path"] for r in cat.entries().collect()}
    assert after == before | {"docs/late.txt"}
    # add() with files deleted from disk also keeps them (sync removes)
    os.remove(tree / "cloud.las")
    cat.add()
    assert "cloud.las" in {r["path"] for r in cat.entries().collect()}
    cat.sync()
    assert "cloud.las" not in {r["path"] for r in cat.entries().collect()}


def test_move_rejects_wildcards(spark, tree):
    """ADVICE r1 (medium): move is exact-path; a wildcard src would match
    variable-length paths and corrupt the fixed-offset suffix rewrite."""
    cat = DatasetCatalog.init(spark, str(tree))
    cat.add()
    with pytest.raises(ValueError):
        cat.move("ima*", "archive")
    with pytest.raises(ValueError):
        cat.move("images", "arch%ive")


def test_remove_quote_bearing_pattern(spark, tmp_path):
    """ADVICE r1 (medium): patterns containing single quotes must neither
    crash nor inject SQL (predicates are built via the DSL, not f-string
    interpolation)."""
    root = tmp_path / "quoted"
    root.mkdir()
    (root / "o'brien.jpg").write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    (root / "plain.txt").write_text("x")
    cat = DatasetCatalog.init(spark, str(root))
    cat.add()
    assert cat.remove("o'brien.jpg") == 1
    assert {r["path"] for r in cat.entries().collect()} == {"plain.txt"}


def test_add_empty_directory(spark, tmp_path):
    """ADVICE r1 (low): add() on an empty dataset dir must not throw on
    empty-schema inference."""
    root = tmp_path / "emptyds"
    root.mkdir()
    cat = DatasetCatalog.init(spark, str(root))
    cat.add()
    assert cat.entries().count() == 0


def test_snapshot_time_travel_and_diff(spark, tmp_path):
    root = tmp_path / "ttds"
    root.mkdir()
    (root / "a.txt").write_text("a")
    cat = DatasetCatalog.init(spark, str(root))
    cat.add()
    v_old = cat.history()["entries"][-1]
    (root / "b.txt").write_text("b")
    cat.add()
    # pinned read sees the old state; current sees both
    assert {r["path"] for r in cat.entries(version=v_old).collect()} == {"a.txt"}
    assert {r["path"] for r in cat.entries().collect()} == {"a.txt", "b.txt"}
    d = cat.diff_versions(v_old)
    assert {r["path"] for r in d["adds"].collect()} == {"b.txt"}
    assert d["removes"].count() == 0
    with pytest.raises(ValueError):
        cat.entries(version="v999999")


def test_nested_dataset_dir_typed_dronedb(spark, tmp_path):
    """A directory carrying its own catalog indexes as EntryType DroneDB
    (entry.cpp:70-77), both for our .ddb_spark marker and a
    reference-format .ddb/dbase.sqlite."""
    (tmp_path / "plain").mkdir()
    (tmp_path / "plain" / "x.txt").write_text("x\n")
    (tmp_path / "ours").mkdir()
    (tmp_path / "ours" / ".ddb_spark").mkdir()
    (tmp_path / "theirs").mkdir()
    (tmp_path / "theirs" / ".ddb").mkdir()
    (tmp_path / "theirs" / ".ddb" / "dbase.sqlite").write_bytes(b"")
    cat = DatasetCatalog.init(spark, str(tmp_path))
    cat.add()
    types = {r["path"]: r["type"] for r in cat.entries().collect()}
    assert types["plain"] == ENTRY_TYPES["Directory"]
    assert types["ours"] == ENTRY_TYPES["DroneDB"]
    assert types["theirs"] == ENTRY_TYPES["DroneDB"]


def test_compact_plan_invariants(spark):
    """Groups are path-contiguous within a folder, never split a file,
    and only the file that CROSSES the target boundary can push a
    group past target bytes (the FilePartition-packing contract)."""
    from dronedb_spark.catalog.compact import TARGET_BYTES, compact_plan
    from dronedb_spark.catalog.derive import entries_df

    rows = compact_plan(entries_df(spark, "/root/testdata/sf0.001")).collect()
    by_folder: dict[str, list] = {}
    for r in rows:
        by_folder.setdefault(r["folder"], []).append(r)
    assert by_folder
    for folder, fr in by_folder.items():
        fr.sort(key=lambda r: r["path"])
        groups = [r["group_no"] for r in fr]
        assert groups == sorted(groups)  # contiguous in path order
        acc: dict[int, int] = {}
        for r in fr:
            acc[r["group_no"]] = acc.get(r["group_no"], 0) + r["size"]
        for g, total in acc.items():
            members = [r for r in fr if r["group_no"] == g]
            # removing the last member must bring the group under target
            assert total - members[-1]["size"] < TARGET_BYTES


def test_dataset_diff_statuses(spark):
    from dronedb_spark.catalog.datadiff import dataset_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "goes away")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed now"), (4, "brand new")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in dataset_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
