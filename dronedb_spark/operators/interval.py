"""Interval (range-containment) join — a temporal operator Spark lacks.

"Which events fall inside each time window" — the reference has no
range/interval joins at all (SURVEY §2.3 closes with exactly that note),
but any training-data pipeline needs one (session windows, promo windows,
maintenance windows, label horizons).  DuckDB executes inequality joins
natively (IEJoin), giving a true independent oracle.

Spark-first scale path: a naive theta-join (`ON e.ts BETWEEN w.start AND
w.end`) is a broadcast-nested-loop — O(|E|·|W|) and only survives while
one side is broadcastable.  Instead we discretize time into fixed-width
buckets: each window row is exploded to the buckets it covers (a window
of length L duplicates ceil(L/B)+1 rows — bounded and known up front),
each event lands in exactly ONE bucket, and the join becomes an
equi-join on bucket followed by the exact containment refinement.  One
shuffle on bucket for each side; because the event's bucket is unique,
every (window, event) pair meets in exactly one bucket — no dedup pass.
Hot buckets are ordinary equi-join skew (AQE splits them).  At 100 TB
both sides scale; nothing is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

BUCKET_S = 900  # 15-minute buckets: windows of ~2h explode to ≤9 rows


def interval_join(
    events: DataFrame,
    windows: DataFrame,
    ts_s: str,
    start_s: str,
    end_s: str,
    bucket_s: int = BUCKET_S,
) -> DataFrame:
    """events ⋈ windows on `start_s <= ts_s < end_s` (epoch-second cols).

    Returns the matched pairs (all columns of both inputs).  The exact
    predicate is re-applied after the bucket equi-join, so bucket width
    only affects cost, never results.
    """
    ev = events.withColumn("_bkt", (F.col(ts_s) / bucket_s).cast("bigint"))
    win = windows.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.col(start_s) / bucket_s).cast("bigint"),
                ((F.col(end_s) - 1) / bucket_s).cast("bigint"),
            )
        ),
    )
    return (
        ev.join(win, "_bkt")
        .filter((F.col(ts_s) >= F.col(start_s)) & (F.col(ts_s) < F.col(end_s)))
        .drop("_bkt")
    )


@check(
    "interval_join_windows",
    oracle="""
        WITH w AS (
            SELECT CAST(event_id AS BIGINT) AS window_id,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) - 3599 AS w_start_s,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) + 3600 AS w_end_s
            FROM events WHERE event_id % 997 = 0),
        e AS (SELECT event_id, CAST(FLOOR(epoch(ts)) AS BIGINT) AS e_s FROM events)
        SELECT w.window_id,
               COUNT(1) AS n_events,
               CAST(SUM(e.event_id) AS BIGINT) AS sum_event_id,
               MIN(e.e_s) AS min_s,
               MAX(e.e_s) AS max_s
        FROM w JOIN e ON e.e_s >= w.w_start_s AND e.e_s < w.w_end_s
        GROUP BY w.window_id
        ORDER BY window_id""",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load(spark, sf_dir, "events")
    e = events.select("event_id", F.unix_timestamp("ts").alias("e_s"))
    w = events.filter(F.col("event_id") % 997 == 0).select(
        F.col("event_id").cast("bigint").alias("window_id"),
        (F.unix_timestamp("ts") - 3599).alias("w_start_s"),
        (F.unix_timestamp("ts") + 3600).alias("w_end_s"),
    )
    pairs = interval_join(e, w, "e_s", "w_start_s", "w_end_s")
    return (
        pairs.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("event_id").cast("bigint").alias("sum_event_id"),
            F.min("e_s").alias("min_s"),
            F.max("e_s").alias("max_s"),
        )
        .orderBy("window_id")
    )
