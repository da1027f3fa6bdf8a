"""Driver check for the catalog WRITE workflow (W1-W6: init → add →
move → sync → remove), end to end on a real scratch dataset directory.

The flow mirrors a reference user session (dbops.cpp): index a tree,
mutate the filesystem (modify / delete / create / rename a folder),
record the rename with ``move`` (moveEntry semantics: the index update
AFTER the user moved files, dbops.cpp:1361-1473), reconcile with
``sync`` (syncIndex, dbops.cpp:989-1032), then LIKE-``remove`` a
pattern (removeFromIndex, dbops.cpp:717-914).  The final entries table
is fully determined by the op sequence — any slip in the upsert
algebra, the mtime short-circuit (the renamed file keeps its mtime and
must NOT be re-ingested), the subtree path/depth rewrite, or the LIKE
semantics changes the values — and the oracle states them as literals
(sha256 of the fixture bytes, fixed mtimes).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check

_FILES = {
    "a.txt": (b"alpha\n", 1700000000),          # deleted before sync
    "b.txt": (b"bravo\n", 1700000010),          # rewritten before sync
    "notes.md": (b"# notes\n", 1700000020),
    "sub/c.txt": (b"charlie\n", 1700000030),    # folder renamed sub -> moved
    "e.bin": (b"\x00\x01\x02\x03", 1700000050),  # removed via pattern
}
_B2 = (b"bravo two\n", 1700000100)
_D = (b"delta\n", 1700000110)
_DIR_MTIME = 1700000040

_TYPE_GENERIC, _TYPE_MARKDOWN, _TYPE_DIR = 2, 8, 1


def _sha(b: bytes) -> str:
    return hashlib.sha256(b).hexdigest()


def _expected() -> list[tuple]:
    return [
        ("b.txt", _TYPE_GENERIC, 0, len(_B2[0]), _sha(_B2[0]), _B2[1]),
        ("d.txt", _TYPE_GENERIC, 0, len(_D[0]), _sha(_D[0]), _D[1]),
        ("moved", _TYPE_DIR, 0, 0, "", _DIR_MTIME),
        ("moved/c.txt", _TYPE_GENERIC, 1, 8, _sha(_FILES["sub/c.txt"][0]), 1700000030),
        ("notes.md", _TYPE_MARKDOWN, 0, 8, _sha(_FILES["notes.md"][0]), 1700000020),
    ]


def _oracle() -> str:
    values = ",\n            ".join(
        f"('{p}', {t}, {d}, {s}, '{h}', {m})" for p, t, d, s, h, m in _expected()
    )
    return f"""
        SELECT path, CAST(type AS INT) AS type, CAST(depth AS INT) AS depth,
               CAST(size AS BIGINT) AS size, hash, CAST(mtime AS BIGINT) AS mtime
        FROM (VALUES
            {values}) AS t(path, type, depth, size, hash, mtime)
        ORDER BY path"""


@check("catalog_workflow_lifecycle", oracle=_oracle())
def q_catalog_workflow_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dronedb_spark.catalog.store import DatasetCatalog

    root = tempfile.mkdtemp(prefix="wf_")
    try:
        for rel, (data, mtime) in _FILES.items():
            p = os.path.join(root, rel)
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "wb") as f:
                f.write(data)
            os.utime(p, (mtime, mtime))
        os.utime(os.path.join(root, "sub"), (_DIR_MTIME, _DIR_MTIME))

        cat = DatasetCatalog.init(spark, root)
        cat.add()

        # user session: edit, delete, create, rename a folder on disk
        with open(os.path.join(root, "b.txt"), "wb") as f:
            f.write(_B2[0])
        os.utime(os.path.join(root, "b.txt"), (_B2[1], _B2[1]))
        os.remove(os.path.join(root, "a.txt"))
        with open(os.path.join(root, "d.txt"), "wb") as f:
            f.write(_D[0])
        os.utime(os.path.join(root, "d.txt"), (_D[1], _D[1]))
        os.rename(os.path.join(root, "sub"), os.path.join(root, "moved"))
        os.utime(os.path.join(root, "moved", "c.txt"), (1700000030, 1700000030))
        os.utime(os.path.join(root, "moved"), (_DIR_MTIME, _DIR_MTIME))

        cat.move("sub", "moved")   # index follows the fs rename — no re-parse
        cat.sync()                 # reconcile: drop a.txt, upsert b/d
        cat.remove("*.bin")        # LIKE removal (sanitize: * -> %)

        rows = [
            (r["path"], int(r["type"]), int(r["depth"]), int(r["size"]),
             r["hash"], int(r["mtime"]))
            for r in cat.entries().collect()
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        sorted(rows),
        "path string, type int, depth int, size bigint, hash string, mtime bigint",
    ).orderBy("path")
