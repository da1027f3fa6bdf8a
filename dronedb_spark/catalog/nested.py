"""Nested DroneDB dataset roll-up (entry.cpp:961-980 parity).

When a scanned tree contains a child directory that is itself a DroneDB
dataset (it has a ``.ddb`` marker), the reference emits ONE entry for
that directory — type ``DroneDB``, ``size`` = sum of the subtree's file
sizes, properties rolled up — instead of listing its children.

Spark shape: marker detection is a driver-side directory probe (same
justification as ``dir_rows_df`` — directory counts are orders of
magnitude below file counts), but the roll-up itself is pure DataFrame
algebra: a broadcast join of entries against the (tiny) dataset-root
list on a path-prefix predicate, one aggregation per dataset, and an
anti-filter for the swallowed subtree.  At 100M files the per-dataset
sums are an ordinary partial+final aggregate; nothing rides the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import ENTRY_TYPES


def dataset_roots(root: str) -> list[str]:
    """Relative paths of child directories carrying a ``.ddb`` marker.
    Roots nested inside another dataset are dropped — the OUTERMOST
    dataset swallows its whole subtree, as the reference's recursive
    parse does."""
    root = os.path.abspath(root)
    found: list[str] = []
    for dirpath, dirnames, _files in os.walk(root):
        rel = os.path.relpath(dirpath, root).replace(os.sep, "/")
        if rel != "." and ".ddb" in dirnames:
            found.append(rel)
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
    found.sort()
    outer: list[str] = []
    for r in found:
        if not any(r.startswith(o + "/") for o in outer):
            outer.append(r)
    return outer


def rollup_nested(entries: DataFrame, roots: list[str]) -> DataFrame:
    """Collapse each dataset-root subtree into one DroneDB entry."""
    if not roots:
        return entries
    spark = entries.sparkSession
    roots_df = spark.createDataFrame([(r,) for r in roots], "ds_root string")
    owned = entries.join(
        F.broadcast(roots_df),
        F.col("path").startswith(F.concat(F.col("ds_root"), F.lit("/")))
        | (F.col("path") == F.col("ds_root")),
    )
    is_file = F.col("type") != F.lit(ENTRY_TYPES["Directory"])
    rolled = owned.groupBy("ds_root").agg(
        F.sum(F.when(is_file, F.col("size")).otherwise(0)).alias("size"),
        F.sum(F.when(is_file, 1).otherwise(0)).alias("n_entries"),
        F.max("mtime").alias("mtime"),
        F.min("bbox_minx").alias("bbox_minx"),
        F.min("bbox_miny").alias("bbox_miny"),
        F.max("bbox_maxx").alias("bbox_maxx"),
        F.max("bbox_maxy").alias("bbox_maxy"),
    )
    # adapt the rolled projection to the INPUT's entry schema (the ingest
    # schema carries capture_ms; the derived catalog schema does not)
    cols: dict[str, F.Column] = {
        "path": F.col("ds_root"),
        "hash": F.lit(""),
        "type": F.lit(ENTRY_TYPES["DroneDB"]),
        # sorted-key JSON, matching the ingest convention
        "properties": F.concat(
            F.lit('{"entries": '),
            F.col("n_entries").cast("string"),
            F.lit(', "totalSize": '),
            F.col("size").cast("string"),
            F.lit("}"),
        ),
        "mtime": F.col("mtime"),
        "size": F.col("size"),
        "depth": F.expr("size(split(ds_root, '/')) - 1"),
        "bbox_minx": F.col("bbox_minx"),
        "bbox_miny": F.col("bbox_miny"),
        "bbox_maxx": F.col("bbox_maxx"),
        "bbox_maxy": F.col("bbox_maxy"),
        "capture_ms": F.lit(0).cast("long"),
    }
    rolled_entries = rolled.select(
        *[
            (cols[f.name] if f.name in cols else F.lit(None).cast(f.dataType))
            .cast(f.dataType)
            .alias(f.name)
            for f in entries.schema.fields
        ]
    )
    kept = entries.join(
        F.broadcast(roots_df),
        F.col("path").startswith(F.concat(F.col("ds_root"), F.lit("/")))
        | (F.col("path") == F.col("ds_root")),
        "left_anti",
    )
    return kept.unionByName(rolled_entries)


def ingest_with_rollup(spark, root: str) -> DataFrame:
    """Full ingest + nested-dataset roll-up — the reference's default
    scan semantics for a tree containing sub-datasets."""
    from dronedb_spark.sources.fs import ingest

    return rollup_nested(ingest(spark, root), dataset_roots(root))


# ------------------------------------------------------------------ check

from dronedb_spark.suite import check  # noqa: E402


def _nested_fixture_root() -> str:
    """Two-level fixture: plain files + two .ddb-marked sub-datasets (one
    with a nested subdir, one containing a NESTED dataset that the outer
    roll-up must swallow)."""
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "nested_cat_v1")
    )
    spec: dict[str, int] = {
        "notes.txt": 10,
        "data/readme.txt": 20,
        "survey_a/img_0.bin": 100,
        "survey_a/img_1.bin": 110,
        "survey_a/img_2.bin": 120,
        "survey_a/img_3.bin": 130,
        "survey_a/img_4.bin": 140,
        "survey_b/tiles/t0.bin": 50,
        "survey_b/tiles/t1.bin": 60,
        "survey_b/inner/nested.bin": 70,
    }
    for rel, n in spec.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        payload = bytes((i * 7 + n) % 251 for i in range(n))
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    # .ddb markers: survey_a, survey_b, and survey_b/inner (nested — must
    # be swallowed by survey_b's roll-up)
    for marker in ("survey_a/.ddb", "survey_b/.ddb", "survey_b/inner/.ddb"):
        os.makedirs(os.path.join(root, marker), exist_ok=True)
    for d in ("", "data", "survey_a", "survey_b", "survey_b/tiles", "survey_b/inner"):
        os.utime(os.path.join(root, d), (1700000000, 1700000000))
    return root


@check(
    "nested_dataset_rollup",
    oracle=f"""
        SELECT * FROM (VALUES
            ('data',      CAST({ENTRY_TYPES["Directory"]} AS INT), CAST(0 AS BIGINT),
             CAST(-1 AS BIGINT), 0),
            ('data/readme.txt', CAST({ENTRY_TYPES["Generic"]} AS INT), CAST(20 AS BIGINT),
             CAST(-1 AS BIGINT), 1),
            ('notes.txt', CAST({ENTRY_TYPES["Generic"]} AS INT), CAST(10 AS BIGINT),
             CAST(-1 AS BIGINT), 0),
            ('survey_a',  CAST({ENTRY_TYPES["DroneDB"]} AS INT), CAST(600 AS BIGINT),
             CAST(5 AS BIGINT), 0),
            ('survey_b',  CAST({ENTRY_TYPES["DroneDB"]} AS INT), CAST(180 AS BIGINT),
             CAST(3 AS BIGINT), 0)
        ) AS t(path, type, size, n_entries, depth)
        ORDER BY path""",
)
def q_nested_rollup(spark, sf_dir: str) -> DataFrame:
    """Ingest over the two-level fixture: sub-dataset subtrees collapse to
    single DroneDB entries (size = child sum, entries counted), the nested
    dataset inside survey_b is swallowed by the outer roll-up, and plain
    files/dirs pass through untouched."""
    ent = ingest_with_rollup(spark, _nested_fixture_root())
    return ent.select(
        "path",
        F.col("type").cast("int").alias("type"),
        F.col("size").cast("bigint").alias("size"),
        F.coalesce(
            F.get_json_object("properties", "$.entries").cast("bigint"), F.lit(-1)
        ).alias("n_entries"),
        F.col("depth").cast("int").alias("depth"),
    ).orderBy("path")
