"""Autocorrelation of event-rate series — "does this stream have a
daily rhythm / is yesterday's rate predictive" — the seasonality probe
a telemetry pipeline runs before forecasting or anomaly thresholds.
Complements CUSUM (``operators/outliers.py``: level shifts) with the
PERIODIC structure.  Beyond the reference (no event analytics).

Exactness discipline: the series is the full hourly count grid (empty
hours count, generated like ``event_rate_cusum`` — a stream that goes
quiet at night IS the seasonality).  At lag L the Pearson statistic is
assembled from INTEGER sufficient statistics (n, Σx, Σy, Σxy, Σx²,
Σy² over the (x_t, x_{t+L}) pairs) and evaluated as
``(n·Σxy − Σx·Σy) / (sqrt(n·Σx² − (Σx)²) · sqrt(n·Σy² − (Σy)²))`` —
every op on identical integer operands, and IEEE sqrt/division are
correctly rounded, so the double is bit-identical across engines with
NO rounding step.  Degenerate (constant) series sentinel to −999.0.

Scale shape: one map-side-combined count aggregate (the only
data-sized shuffle), a generated grid, lag pairing as one window
``lead`` per type over TIME-sized rows, and the lag spine is a
broadcast constant — K lags cost K window columns, not K passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

BUCKET_S = 3600
LAGS = (1, 2, 24)  # hour-over-hour, 2h, and the daily rhythm


def hourly_series(events: DataFrame, bucket_s: int = BUCKET_S) -> DataFrame:
    """(event_type, bucket, cnt): the gap-free hourly count grid."""
    us = bucket_s * 1_000_000
    bucketed = events.select(
        "event_type",
        (F.expr(f"unix_micros(ts) DIV {us}") * bucket_s).alias("bucket"),
    )
    counts = bucketed.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    span = bucketed.agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
    grid = (
        bucketed.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.lit(bucket_s).cast("bigint"))
            ).alias("bucket"),
        )
    )
    return grid.join(counts, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )


def autocorrelation(
    events: DataFrame, lags=LAGS, bucket_s: int = BUCKET_S
) -> DataFrame:
    """(event_type, lag, n_pairs, sum_xy, sum_x, sum_y, sum_x2, sum_y2,
    r): exact sufficient statistics + the Pearson autocorrelation of
    the hourly rate series at each lag."""
    series = hourly_series(events, bucket_s)
    w = Window.partitionBy("event_type").orderBy("bucket")
    with_leads = series.select(
        "event_type",
        "cnt",
        *[F.lead("cnt", int(l)).over(w).alias(f"_y{l}") for l in lags],
    )
    spine = F.broadcast(
        series.sparkSession.createDataFrame(
            [(int(l),) for l in lags], "lag int"
        )
    )
    pairs = (
        with_leads.join(spine)
        .select(
            "event_type",
            "lag",
            F.col("cnt").alias("x"),
            F.coalesce(
                *[
                    F.when(F.col("lag") == int(l), F.col(f"_y{l}"))
                    for l in lags
                ]
            ).alias("y"),
        )
        .filter(F.col("y").isNotNull())
    )
    agg = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sum_xy"),
        F.sum("x").cast("bigint").alias("sum_x"),
        F.sum("y").cast("bigint").alias("sum_y"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_x2"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_y2"),
    )
    vx = "(n_pairs * sum_x2 - sum_x * sum_x)"
    vy = "(n_pairs * sum_y2 - sum_y * sum_y)"
    return agg.withColumn(
        "r",
        F.expr(
            f"CASE WHEN {vx} = 0 OR {vy} = 0 THEN -999.0"
            f" ELSE CAST(n_pairs * sum_xy - sum_x * sum_y AS DOUBLE)"
            f" / (sqrt(CAST({vx} AS DOUBLE)) * sqrt(CAST({vy} AS DOUBLE)))"
            " END"
        ),
    )


@check(
    "event_autocorrelation",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   (epoch_us(ts) // {BUCKET_S * 1_000_000}) * {BUCKET_S}
                       AS bucket
            FROM events),
        counts AS (
            SELECT event_type, bucket, COUNT(1) AS cnt
            FROM b GROUP BY 1, 2),
        span AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
        grid AS (
            SELECT event_type, g.bucket
            FROM (SELECT DISTINCT event_type FROM b), span,
                 LATERAL (SELECT unnest(range(lo, hi + 1, {BUCKET_S}))
                          AS bucket) g),
        series AS (
            SELECT g.event_type, g.bucket, COALESCE(c.cnt, 0) AS cnt
            FROM grid g LEFT JOIN counts c
              ON c.event_type = g.event_type AND c.bucket = g.bucket),
        lags(lag) AS (VALUES (1), (2), (24)),
        pairs AS (
            SELECT s.event_type, l.lag, s.cnt AS x,
                   lead(s.cnt, l.lag) OVER (PARTITION BY s.event_type, l.lag
                       ORDER BY s.bucket) AS y
            FROM series s CROSS JOIN lags l),
        agg AS (
            SELECT event_type, lag,
                   CAST(COUNT(1) AS BIGINT) AS n_pairs,
                   CAST(SUM(x * y) AS BIGINT) AS sum_xy,
                   CAST(SUM(x) AS BIGINT) AS sum_x,
                   CAST(SUM(y) AS BIGINT) AS sum_y,
                   CAST(SUM(x * x) AS BIGINT) AS sum_x2,
                   CAST(SUM(y * y) AS BIGINT) AS sum_y2
            FROM pairs WHERE y IS NOT NULL GROUP BY 1, 2)
        SELECT event_type, lag, n_pairs, sum_xy, sum_x, sum_y, sum_x2,
               sum_y2,
               CASE WHEN (n_pairs * sum_x2 - sum_x * sum_x) = 0
                      OR (n_pairs * sum_y2 - sum_y * sum_y) = 0 THEN -999.0
                    ELSE CAST(n_pairs * sum_xy - sum_x * sum_y AS DOUBLE)
                         / (sqrt(CAST(n_pairs * sum_x2 - sum_x * sum_x
                                      AS DOUBLE))
                            * sqrt(CAST(n_pairs * sum_y2 - sum_y * sum_y
                                        AS DOUBLE)))
               END AS r
        FROM agg ORDER BY 1, 2""",
)
def q_event_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly-rate autocorrelation at lags 1, 2, 24 per event type —
    integer sufficient statistics, bit-identical unrounded r."""
    return autocorrelation(load(spark, sf_dir, "events")).orderBy(
        "event_type", "lag"
    )
