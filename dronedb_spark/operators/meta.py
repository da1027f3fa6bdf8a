"""Metadata key-value store semantics (SURVEY §1.5, A6, A7, J1, W7).

Reference conventions (metamanager.cpp:30-45,101-104): keys are lowercase;
a PLURAL key (ends in 's') has list semantics (append-only, ``add``); a
singular key holds a single value (``set`` = delete-then-insert); restore
keeps the newest mtime for singular keys (metamanager.cpp:265-335).

Spark-first: the per-path meta roll-up (the reference's correlated
subquery, dbops.cpp:944-957) is a groupBy aggregation followed by a
broadcast-friendly left join — Catalyst decorrelates nothing because we
never write the correlated form (SURVEY X10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_df, entries_meta_df, with_catalog
from dronedb_spark.suite import check


def meta_rollup(meta: DataFrame) -> DataFrame:
    """Per (path, key): list count, plural flag, newest value (singular
    'latest wins', metamanager.cpp:295-319), and id-ordered value concat.

    ``latest_data`` uses max over (mtime, id, data) packed lexicographically:
    mtime zero-padded to 12 digits, id is a fixed 32-char md5 — so the max
    string's suffix after 44 chars is the payload of the (mtime, id)-max row.
    This keeps the aggregation a plain one-pass ``max`` (no window, no
    second shuffle) — the same trick the DuckDB oracle uses.
    """
    packed = F.concat(F.lpad(F.col("mtime").cast("string"), 12, "0"), F.col("id"), F.col("data"))
    return meta.groupBy("path", "key").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.col("key").endswith("s")).alias("is_list"),
        F.substring(F.max(packed), 45, 1 << 20).alias("latest_data"),
        F.array_join(
            F.transform(F.sort_array(F.collect_list(F.struct("id", "data"))), lambda x: x["data"]),
            "|",
        ).alias("datas"),
    )


def entries_with_meta(entries: DataFrame, meta: DataFrame) -> DataFrame:
    """J1: entries ⟕ aggregated meta on path (dbops.cpp:941-964).

    The aggregated meta side is small relative to entries at scale
    (bounded by the number of annotated paths), so Catalyst broadcast-joins
    it under the configured threshold; no shuffle of the entries side."""
    agg = meta.filter(F.col("path") != "").groupBy("path").agg(
        F.count(F.lit(1)).alias("n_meta"),
        F.array_join(F.sort_array(F.collect_set("key")), ",").alias("meta_keys"),
    )
    return entries.join(agg, "path", "left").select(
        entries["path"],
        "type",
        F.coalesce(F.col("n_meta"), F.lit(0)).cast("bigint").alias("n_meta"),
        F.coalesce(F.col("meta_keys"), F.lit("")).alias("meta_keys"),
    )


def meta_counts(meta: DataFrame) -> DataFrame:
    """A7: SELECT key, path, COUNT(id) GROUP BY path, key
    (metamanager.cpp:198-218)."""
    return meta.groupBy("path", "key").agg(F.count("id").alias("n"))


# ---------------------------------------------------------------- checks


@check(
    "meta_rollup",
    oracle=with_catalog(
        """SELECT path, key, CAST(COUNT(1) AS BIGINT) AS n,
                  MAX(key LIKE '%s') AS is_list,
                  substr(MAX(LPAD(CAST(mtime AS STRING), 12, '0') || id || data), 45) AS latest_data,
                  string_agg(data, '|' ORDER BY id) AS datas
           FROM entries_meta GROUP BY path, key""",
        variants=(),
        meta=True,
    ),
)
def q_meta_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return meta_rollup(entries_meta_df(spark, sf_dir))


@check(
    "entries_meta_join",
    oracle=with_catalog(
        """SELECT e.path, e.type,
                  CAST(COALESCE(m.n_meta, 0) AS BIGINT) AS n_meta,
                  COALESCE(m.meta_keys, '') AS meta_keys
           FROM entries e
           LEFT JOIN (
               SELECT path, COUNT(1) AS n_meta,
                      string_agg(DISTINCT key, ',' ORDER BY key) AS meta_keys
               FROM entries_meta WHERE path <> '' GROUP BY path
           ) m ON e.path = m.path""",
        variants=("a",),
        meta=True,
    ),
)
def q_entries_meta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entries_with_meta(entries_df(spark, sf_dir), entries_meta_df(spark, sf_dir))


def meta_restore_merge(ours: DataFrame, theirs: DataFrame) -> DataFrame:
    """W7 restore (metamanager.cpp:265-335): merge a dumped meta table
    into the local one — singular keys keep the NEWEST mtime row across
    both sides (ties broken by id), plural keys union all rows (dedup by
    id).  One union + one aggregation; the packed-max trick (see
    meta_rollup) keeps singular resolution a single map-side-combinable
    pass."""
    both = ours.unionByName(theirs).dropDuplicates(["id"])
    plural = both.filter(F.col("key").endswith("s"))
    singular = both.filter(~F.col("key").endswith("s"))
    packed = F.concat(
        F.lpad(F.col("mtime").cast("string"), 12, "0"), F.col("id"), F.col("data")
    )
    latest = (
        singular.groupBy("path", "key")
        .agg(F.max(packed).alias("p"))
        .select(
            "path",
            "key",
            F.substring(F.col("p"), 13, 32).alias("id"),
            F.substring(F.col("p"), 45, 1 << 20).alias("data"),
            F.substring(F.col("p"), 1, 12).cast("bigint").alias("mtime"),
        )
    )
    return plural.select("id", "path", "key", "data", "mtime").unionByName(
        latest.select("id", "path", "key", "data", "mtime")
    )


@check(
    "meta_restore_merge",
    oracle=with_catalog(
        """WITH theirs AS (
               SELECT md5('their:' || id) AS id, path, key,
                      '"restored"' AS data, mtime + 100 AS mtime
               FROM entries_meta WHERE key IN ('name', 'visibility', 'tags')
           ),
           merged AS (
               SELECT * FROM entries_meta
               UNION ALL
               SELECT * FROM theirs
           ),
           ded AS (SELECT DISTINCT ON (id) id, path, key, data, mtime FROM merged ORDER BY id),
           plural AS (SELECT id, path, key, data, mtime FROM ded WHERE key LIKE '%s'),
           latest AS (
               SELECT path, key,
                      substr(MAX(LPAD(CAST(mtime AS STRING), 12, '0') || id || data), 13, 32) AS id,
                      substr(MAX(LPAD(CAST(mtime AS STRING), 12, '0') || id || data), 45) AS data,
                      CAST(substr(MAX(LPAD(CAST(mtime AS STRING), 12, '0') || id || data), 1, 12) AS BIGINT) AS mtime
               FROM ded WHERE key NOT LIKE '%s' GROUP BY path, key
           )
           SELECT id, path, key, data, mtime FROM plural
           UNION ALL
           SELECT id, path, key, data, mtime FROM latest""",
        variants=(),
        meta=True,
    ),
)
def q_meta_restore_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ours = entries_meta_df(spark, sf_dir)
    theirs = ours.filter(F.col("key").isin("name", "visibility", "tags")).select(
        F.md5(F.concat(F.lit("their:"), F.col("id"))).alias("id"),
        "path",
        "key",
        F.lit('"restored"').alias("data"),
        (F.col("mtime") + 100).alias("mtime"),
    )
    return meta_restore_merge(ours, theirs)
