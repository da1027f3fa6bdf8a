"""Composed catalog maintenance — incremental z-order OPTIMIZE +
small-file compaction as ONE plan (the nightly lakehouse maintenance
job, composing ``catalog/zorder.py:zorder_rewrite_plan`` with
``catalog/compact.py:compact_plan``): the appended batch marks which
clustered files must be rewritten, and the rewrite set is immediately
packed into target-sized output groups so the rewrite job never
re-creates the small-file problem it is cleaning up.

Scale shape: the corpus is never read — the z-order assignment is a
zero-shuffle projection over the BATCH against the persisted layout
bounds, the dirty-file join is files-sized, and the packing window runs
over the rewrite set only (metadata-sized).  ``barrier_persist`` keeps
the shared rewrite plan from executing once per consumer branch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.compact import compact_plan
from dronedb_spark.catalog.zorder import (
    N_FILES,
    _interleave_sql,
    zorder_layout,
    zorder_rewrite_plan,
)
from dronedb_spark.suite import check
from dronedb_spark.tables import barrier_persist, load

ROW_BYTES = 100  # planning estimate: bytes per packed row
PACK_TARGET = 1 << 20  # 1 MiB output groups


def maintenance_plan(
    stats: DataFrame,
    new_batch: DataFrame,
    x: str,
    y: str,
    n_files: int = N_FILES,
    row_bytes: int = ROW_BYTES,
    target: int = PACK_TARGET,
) -> DataFrame:
    """(file_id, n_rows, n_new, action, group_no): the combined
    maintenance worklist — 'rewrite' files carry the compaction group
    their re-clustered output lands in (cumulative-size packing in
    file_id order), 'keep' files carry −1."""
    plan = barrier_persist(
        zorder_rewrite_plan(stats, new_batch, x, y, n_files)
    )
    pathed = plan.withColumn(
        "p", F.lpad(F.col("file_id").cast("string"), 6, "0")
    )
    rew_entries = pathed.filter(F.col("action") == "rewrite").select(
        F.concat(F.lit("zorder/"), F.col("p")).alias("path"),
        ((F.col("n_rows") + F.col("n_new")) * row_bytes).alias("size"),
        F.lit(0).alias("type"),
    )
    packed = compact_plan(rew_entries, target).select(
        F.substring("path", 8, 6).alias("p"),
        F.col("group_no").cast("bigint").alias("group_no"),
    )
    return pathed.join(packed, "p", "left").select(
        "file_id",
        "n_rows",
        "n_new",
        "action",
        F.coalesce("group_no", F.lit(-1)).cast("bigint").alias("group_no"),
    )


@check(
    "maintenance_compact_zorder",
    oracle=f"""
        WITH mm AS (
            SELECT CAST(MIN(l_partkey) AS BIGINT) AS xmin,
                   CAST(MAX(l_partkey) AS BIGINT) AS xmax,
                   CAST(MIN(l_suppkey) AS BIGINT) AS ymin,
                   CAST(MAX(l_suppkey) AS BIGINT) AS ymax
            FROM lineitem),
        laid AS (
            SELECT l_orderkey,
                   CAST(({_interleave_sql(
                       "((l_partkey - xmin) * 65535) // (xmax - xmin)",
                       "((l_suppkey - ymin) * 65535) // (ymax - ymin)",
                       "//")}) AS BIGINT) AS zval
            FROM lineitem, mm),
        assigned AS (
            SELECT l_orderkey,
                   CAST(zval * {N_FILES} // {1 << 32} AS BIGINT) AS file_id
            FROM laid),
        stats AS (
            SELECT file_id, CAST(COUNT(1) AS BIGINT) AS n_rows
            FROM assigned WHERE l_orderkey % 37 <> 0 GROUP BY file_id),
        new_counts AS (
            SELECT file_id, CAST(COUNT(1) AS BIGINT) AS n_new
            FROM assigned WHERE l_orderkey % 37 = 0 GROUP BY file_id),
        plan AS (
            SELECT s.file_id, s.n_rows,
                   CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
                   CASE WHEN COALESCE(n.n_new, 0) > 0 THEN 'rewrite'
                        ELSE 'keep' END AS action
            FROM stats s LEFT JOIN new_counts n ON n.file_id = s.file_id),
        rew AS (
            SELECT file_id, lpad(CAST(file_id AS VARCHAR), 6, '0') AS p,
                   (n_rows + n_new) * {ROW_BYTES} AS size
            FROM plan WHERE action = 'rewrite'),
        packed AS (
            SELECT file_id,
                   CAST(CAST(COALESCE(SUM(size) OVER (
                       ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) // {PACK_TARGET} AS BIGINT) AS group_no
            FROM rew)
        SELECT pl.file_id, pl.n_rows, pl.n_new, pl.action,
               CAST(COALESCE(pk.group_no, -1) AS BIGINT) AS group_no
        FROM plan pl LEFT JOIN packed pk ON pk.file_id = pl.file_id
        ORDER BY pl.file_id""",
)
def q_maintenance_compact_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nightly maintenance in one composed plan: the held-out batch
    (every 37th order) dirties z-clustered files; dirty files are
    rewritten and their outputs packed into 1 MiB compaction groups —
    corpus never re-read, packing window metadata-sized.  The oracle
    re-derives the layout, the dirty set, and the packing
    independently."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    batch = li.filter(F.col("l_orderkey") % 37 == 0)
    mm = li.agg(
        F.min("l_partkey").cast("bigint").alias("_xmin"),
        F.max("l_partkey").cast("bigint").alias("_xmax"),
        F.min("l_suppkey").cast("bigint").alias("_ymin"),
        F.max("l_suppkey").cast("bigint").alias("_ymax"),
    )
    laid = zorder_layout(li, "l_partkey", "l_suppkey").filter(
        F.col("l_orderkey") % 37 != 0
    )
    stats = laid.groupBy("file_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    return maintenance_plan(
        stats, batch.join(F.broadcast(mm)), "l_partkey", "l_suppkey"
    ).orderBy("file_id")
