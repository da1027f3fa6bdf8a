"""OHLC + weighted-average downsampling — the candlestick rollup for
telemetry series: per (series, time bucket) the first/last/extreme
observations and a volume-weighted mean.  Complements the grid
resampler (``operators/resample.py``: one value per bucket, gaps
filled) with the within-bucket SUMMARY a monitoring or feature
pipeline stores per sensor per window.  Beyond the reference (no
event-stream surface); the shape is the standard financial/telemetry
bar aggregation.

Exactness discipline:

* open/high/low/close are SELECTED values, never arithmetic — ties at
  equal timestamps resolve by event_id through ONE full-frame window
  (first_value/last_value over an explicit frame), deterministic on
  any engine.
* The weighted mean is INTEGER: values scale to micro units
  (``floor(value·10⁶)`` BIGINT), the weight is the integer ``props.k``
  payload, and ``vwap_micro = Σ(value_micro·k) DIV Σ(k)`` — no float
  summation order to drift.

Scale shape: the window and the aggregate share the same
(series, bucket) partitioning, so Catalyst plans ONE exchange; bucket
count is time-bounded, per-bucket row count is the stream's natural
rate — no skew beyond the stream's own hot series (AQE's problem,
like any groupBy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

BUCKET_S = 21600  # 6-hour bars
_US = 1_000_000


def ohlc_bars(
    events: DataFrame, key: str = "event_type", bucket_s: int = BUCKET_S
) -> DataFrame:
    """(key, bucket, n, open, high, low, close, vol, vwap_micro):
    per-bucket candlestick bars with an integer-exact weighted mean."""
    us = bucket_s * _US
    base = events.select(
        F.col(key).alias("k"),
        (F.expr(f"unix_micros(ts) DIV {us}") * bucket_s).alias("bucket"),
        "ts",
        "event_id",
        "value",
        F.expr("CAST(FLOOR(value * 1000000.0) AS BIGINT)").alias("value_micro"),
        F.get_json_object("props", "$.k").cast("bigint").alias("w"),
    )
    frame = (
        Window.partitionBy("k", "bucket")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    with_ends = base.select(
        "k",
        "bucket",
        "value",
        "value_micro",
        "w",
        F.first_value("value").over(frame).alias("open"),
        F.last_value("value").over(frame).alias("close"),
    )
    return (
        with_ends.groupBy("k", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("open").alias("open"),  # constant per group
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max("close").alias("close"),
            F.sum("w").cast("bigint").alias("vol"),
            # zero-weight bars (every event's k payload 0) sentinel to -1
            F.expr(
                "CASE WHEN SUM(w) = 0 THEN CAST(-1 AS BIGINT)"
                " ELSE CAST(SUM(value_micro * w) DIV SUM(w) AS BIGINT) END"
            ).alias("vwap_micro"),
        )
        .select(
            F.col("k").alias(key),
            "bucket",
            "n",
            "open",
            "high",
            "low",
            "close",
            "vol",
            "vwap_micro",
        )
    )


@check(
    "ohlc_downsample",
    oracle=f"""
        WITH base AS (
            SELECT event_type AS k,
                   (epoch_us(ts) // {BUCKET_S * _US}) * {BUCKET_S} AS bucket,
                   ts, event_id, value,
                   CAST(FLOOR(value * 1000000.0) AS BIGINT) AS value_micro,
                   CAST(json_extract(props, '$.k') AS BIGINT) AS w
            FROM events),
        ends AS (
            SELECT k, bucket, value, value_micro, w,
                   first_value(value) OVER fr AS op,
                   last_value(value) OVER fr AS cl
            FROM base
            WINDOW fr AS (PARTITION BY k, bucket ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING))
        SELECT k AS event_type, CAST(bucket AS BIGINT) AS bucket,
               CAST(COUNT(1) AS BIGINT) AS n,
               MAX(op) AS open, MAX(value) AS high, MIN(value) AS low,
               MAX(cl) AS close,
               CAST(SUM(w) AS BIGINT) AS vol,
               CASE WHEN SUM(w) = 0 THEN CAST(-1 AS BIGINT)
                    ELSE CAST(SUM(value_micro * w) // SUM(w) AS BIGINT) END
                   AS vwap_micro
        FROM ends GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q_ohlc_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-hour candlestick bars per event type over the events month:
    selected endpoints, integer-exact k-weighted mean."""
    return ohlc_bars(load(spark, sf_dir, "events")).orderBy(
        "event_type", "bucket"
    )
