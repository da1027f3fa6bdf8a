"""Time-grid resampling with forward fill — the telemetry primitive the
event-stream family (hourly aggregates, as-of joins, interval joins)
still lacked: put every series on a REGULAR grid, carrying the last
observation across gaps, so downstream joins and models see one row
per (key, bucket) with no holes (the drone-telemetry "sensor readback"
shape, and the classic feature-engineering resample).

Exactness discipline: buckets are INTEGER epoch-second arithmetic
(``unix_micros DIV bucket_us``, no timestamp rounding to disagree on),
the per-bucket observation is the deterministic LAST by (ts, event_id),
the grid materializes as a ``sequence`` over bigints, and values pass
through untouched (no float arithmetic at all).

Scale shape: per-bucket last is one map-side-combinable aggregate; the
grid is generated (never shuffled from data) and joins on the
(key, bucket) key; the forward fill is one window per key ordered by
bucket — the per-key rank shape, with the same two-phase caveat the
quota samplers document for extreme per-key volume (a day of buckets
per key is tiny by construction: grids are time-sized, not data-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

BUCKET_S = 3600  # 1-hour grid


def resample_ffill(
    events: DataFrame,
    key: str = "event_type",
    bucket_s: int = BUCKET_S,
) -> DataFrame:
    """(key, bucket_s_epoch, n_events, value_ffill): the full regular
    grid from the corpus' min to max bucket, every key, gaps carried
    forward (leading gaps before a key's first observation stay null)."""
    us = bucket_s * 1_000_000
    bucketed = events.select(
        F.col(key).alias("k"),
        (F.expr(f"unix_micros(ts) DIV {us}") * bucket_s).alias("bucket"),
        "ts",
        "event_id",
        "value",
    )
    w_last = Window.partitionBy("k", "bucket").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    obs = (
        bucketed.withColumn("rn", F.row_number().over(w_last))
        .filter(F.col("rn") == 1)
        .select("k", "bucket", F.col("value").alias("obs_value"))
    )
    counts = bucketed.groupBy("k", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    span = bucketed.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    grid = (
        bucketed.select("k")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "k",
            F.explode(
                F.sequence("lo", "hi", F.lit(bucket_s).cast("bigint"))
            ).alias("bucket"),
        )
    )
    j = grid.join(counts, ["k", "bucket"], "left").join(
        obs, ["k", "bucket"], "left"
    )
    w_fill = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col("k").alias(key),
        "bucket",
        F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
        F.last("obs_value", ignorenulls=True).over(w_fill).alias("value_ffill"),
    )


@check(
    "events_resample_ffill",
    oracle=f"""
        WITH b AS (
            SELECT event_type AS k,
                   (epoch_us(ts) // {BUCKET_S * 1_000_000}) * {BUCKET_S}
                       AS bucket,
                   ts, event_id, value
            FROM events),
        obs AS (
            SELECT k, bucket, value AS obs_value FROM (
                SELECT k, bucket, value,
                       ROW_NUMBER() OVER (PARTITION BY k, bucket
                           ORDER BY ts DESC, event_id DESC) AS rn
                FROM b) WHERE rn = 1),
        counts AS (
            SELECT k, bucket, COUNT(1) AS n_events FROM b GROUP BY k, bucket),
        span AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
        grid AS (
            SELECT k, g.bucket
            FROM (SELECT DISTINCT k FROM b), span,
                 LATERAL (SELECT unnest(range(lo, hi + 1, {BUCKET_S}))
                          AS bucket) g)
        SELECT g.k AS event_type, g.bucket,
               CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events,
               COALESCE(last_value(o.obs_value IGNORE NULLS) OVER (
                   PARTITION BY g.k ORDER BY g.bucket
                   ROWS UNBOUNDED PRECEDING), -999.0) AS value_ffill
        FROM grid g
        LEFT JOIN counts c ON c.k = g.k AND c.bucket = g.bucket
        LEFT JOIN obs o ON o.k = g.k AND o.bucket = g.bucket
        ORDER BY 1, 2""",
)
def q_events_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid over the events month, per event type: gap hours
    carry the previous hour's last value; counts are exact.  Leading
    gaps (before a key's first observation) sentinel to -999.0 on both
    sides — the driver comparator's NULL discipline."""
    out = resample_ffill(load(spark, sf_dir, "events"))
    return out.withColumn(
        "value_ffill", F.coalesce("value_ffill", F.lit(-999.0))
    ).orderBy("event_type", "bucket")
