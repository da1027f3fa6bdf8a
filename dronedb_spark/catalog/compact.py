"""Small-file compaction planning — catalog maintenance at scale
(beyond the reference's CLI surface; the lakehouse ``OPTIMIZE`` /
Spark file-packing shape): a long-lived catalog accumulates many small
artifacts per folder, and scan efficiency at 100 TB depends on packing
them into target-sized groups.

The plan is the deterministic cumulative-sum packing Spark's own scan
planner uses for input splits (FilePartition packing): within each
folder, files in path order accumulate, and a file starts a new group
when the bytes BEFORE it already fill ``target`` — so every group
except possibly the last holds at least one byte short of target
before its final member, groups never split a file, and the grouping
is a pure window computation (no driver-side loop, no greedy state).

Scale shape: one shuffle (hash partition by folder) + an in-partition
prefix sum — the ``running_offsets`` discipline (text/packing.py)
applied to catalog maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_df, with_catalog
from dronedb_spark.suite import check

TARGET_BYTES = 4096


def compact_plan(entries: DataFrame, target: int = TARGET_BYTES) -> DataFrame:
    """(folder, path, size, group_no) for every FILE entry: the
    compaction group each file lands in.  group_no = cumulative size of
    PRECEDING files in the folder (path order) // target."""
    files = entries.filter(F.col("type") != 1).select(
        F.substring_index("path", "/", 1).alias("folder"), "path", "size"
    )
    w = (
        Window.partitionBy("folder")
        .orderBy("path")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("size").over(w), F.lit(0))
    # integer division (DIV): Spark's `/` on bigints is a double, whose
    # truncated quotient can disagree with the exact closed form once a
    # folder's cumulative bytes pass 2^53 — the 100 TB regime this plan
    # targets
    return files.select(
        "folder", "path", "size", before.alias("before_bytes")
    ).select(
        "folder",
        "path",
        "size",
        F.expr(f"CAST(before_bytes DIV {target} AS INT)").alias("group_no"),
    )


def compact_summary(entries: DataFrame, target: int = TARGET_BYTES) -> DataFrame:
    """(folder, n_files, n_groups, max_group_bytes) — the work estimate
    a maintenance job reports before rewriting."""
    plan = compact_plan(entries, target)
    per_group = plan.groupBy("folder", "group_no").agg(
        F.count(F.lit(1)).alias("nf"), F.sum("size").alias("bytes")
    )
    return per_group.groupBy("folder").agg(
        F.sum("nf").cast("bigint").alias("n_files"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.max("bytes").cast("bigint").alias("max_group_bytes"),
    )


@check(
    "compact_plan_groups",
    oracle=with_catalog(
        f"""SELECT folder, CAST(COUNT(*) AS BIGINT) AS n_files,
                   CAST(COUNT(DISTINCT group_no) AS BIGINT) AS n_groups,
                   CAST(MAX(gbytes) AS BIGINT) AS max_group_bytes
            FROM (
              SELECT folder, group_no,
                     SUM(size) OVER (PARTITION BY folder, group_no) AS gbytes
              FROM (
                SELECT string_split(path, '/')[1] AS folder, path, size,
                       CAST(COALESCE(SUM(size) OVER (
                           PARTITION BY string_split(path, '/')[1]
                           ORDER BY path
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                            // {TARGET_BYTES} AS INT) AS group_no
                FROM entries WHERE type <> 1) g) t
            GROUP BY folder ORDER BY folder"""
    ),
)
def q_compact_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-folder compaction accounting over the derived catalog —
    group count, file count, and the heaviest group's bytes all
    value-checked against the window closed form."""
    return compact_summary(entries_df(spark, sf_dir)).orderBy("folder")
