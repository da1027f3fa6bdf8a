"""Robust outlier detection by median absolute deviation — the
telemetry QA op (Hampel filter family): flag values more than
k·MAD from their group median.  Means and standard deviations are
exactly what heavy-tailed event values break (one spike drags the
mean toward itself and inflates sigma until nothing flags); medians
and MAD are the robust pair every monitoring stack reaches for.

Exactness: both the median and the MAD are TYPE-1 order statistics
(ties by event_id), the deviation |v − med| and the k·MAD threshold
are the identical IEEE double expressions in both engines, so every
flag decision is bit-reproducible — no distributional assumption, no
float drift.

Shape: two rank windows per group (median, then MAD over the
deviations — per-group data, the quota-sampler caveat applies at
extreme per-group volume) + one map-side-combinable rollup.  The
summed outlier event_ids pin WHICH rows flagged, not just how many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

K_MAD = 5


def _type1_median(df: DataFrame, key: str, col: str, out: str) -> DataFrame:
    w = Window.partitionBy(key)
    rk = F.row_number().over(w.orderBy(col, "event_id"))
    pick = F.expr(f"(count(*) OVER (PARTITION BY {key}) + 1) DIV 2")
    return (
        df.withColumn("_rk", rk)
        .withColumn("_pk", pick)
        .filter(F.col("_rk") == F.col("_pk"))
        .select(key, F.col(col).alias(out))
    )


def mad_outlier_rollup(
    events: DataFrame, key: str = "event_type", k: int = K_MAD
) -> DataFrame:
    """(key, med, mad, n, n_outliers, sum_outlier_ids): the Hampel
    verdict per group at the k·MAD fence."""
    v = events.select(key, "event_id", "value")
    med = _type1_median(v, key, "value", "med")
    dev = v.join(F.broadcast(med), key).withColumn(
        "d", F.abs(F.col("value") - F.col("med"))
    )
    mad = _type1_median(dev, key, "d", "mad")
    j = dev.join(F.broadcast(mad), key).withColumn(
        "is_out", (F.col("d") > F.lit(float(k)) * F.col("mad")).cast("bigint")
    )
    return j.groupBy(key).agg(
        F.first("med").alias("med"),
        F.first("mad").alias("mad"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("is_out").cast("bigint").alias("n_outliers"),
        F.sum(F.col("is_out") * F.col("event_id")).cast("bigint").alias("sum_outlier_ids"),
    )


@check(
    "mad_outliers",
    oracle=f"""
        WITH v AS (SELECT event_type, event_id, value FROM events),
        med AS (
            SELECT event_type, value AS med FROM (
                SELECT event_type, value,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM v) WHERE rn = (n + 1) // 2),
        dev AS (
            SELECT v.event_type, v.event_id, v.value, med.med,
                   abs(v.value - med.med) AS d
            FROM v JOIN med USING (event_type)),
        mad AS (
            SELECT event_type, d AS mad FROM (
                SELECT event_type, d,
                       ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY d, event_id) AS rn,
                       COUNT(*) OVER (PARTITION BY event_type) AS n
                FROM dev) WHERE rn = (n + 1) // 2),
        flagged AS (
            SELECT dev.*, mad.mad,
                   CASE WHEN dev.d > {float(K_MAD)} * mad.mad
                        THEN 1 ELSE 0 END AS is_out
            FROM dev JOIN mad USING (event_type))
        SELECT event_type,
               ANY_VALUE(med) AS med, ANY_VALUE(mad) AS mad,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(is_out) AS BIGINT) AS n_outliers,
               CAST(SUM(is_out * event_id) AS BIGINT) AS sum_outlier_ids
        FROM flagged GROUP BY event_type ORDER BY event_type""",
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel fence at 5·MAD per event type: medians, MADs, and the
    flagged rows' id checksum (~85 outliers per type on the fixture's
    heavy-tailed values)."""
    return mad_outlier_rollup(load(spark, sf_dir, "events")).orderBy("event_type")


# ---------------------------------------------------- CUSUM changepoint --

CUSUM_BUCKET_S = 3600


def event_rate_cusum(events: DataFrame, bucket_s: int = CUSUM_BUCKET_S) -> DataFrame:
    """(event_type, n_buckets, total, max_cusum, max_at_s, min_cusum):
    CUSUM drift detection on per-type event rates — the classic
    changepoint statistic (Page 1954): the running sum of deviations
    from the type's mean rate peaks exactly where the rate regime
    shifts; a flat series random-walks near zero.

    EXACT INTEGERS end to end: with B buckets and T total events, the
    prefix CUSUM scaled by B is ``S_i = B·(Σ_{j≤i} cnt_j) − i·T`` —
    no mean division ever happens, so both engines agree bit-for-bit.
    Empty hours COUNT (the grid generates like ``resample_ffill``):
    a type that stops emitting drifts downward, which observed-bucket-
    only statistics are blind to.  max_at_s is the earliest bucket
    attaining the max (deterministic ties).

    Shape: the count aggregate is map-side-combinable; the grid is
    generated, never shuffled from data; the prefix sum is one window
    per type over TIME-sized rows (hours, not events)."""
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
    filled = grid.join(counts, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    cusum = filled.select(
        "event_type",
        "bucket",
        (
            F.count(F.lit(1)).over(wall) * F.sum("cnt").over(w)
            - F.row_number()
            .over(Window.partitionBy("event_type").orderBy("bucket"))
            * F.sum("cnt").over(wall)
        ).alias("s"),
        F.count(F.lit(1)).over(wall).alias("nb"),
        F.sum("cnt").over(wall).alias("total"),
    )
    flagged = cusum.withColumn("max_s", F.max("s").over(wall))
    return flagged.groupBy("event_type").agg(
        F.first("nb").cast("bigint").alias("n_buckets"),
        F.first("total").cast("bigint").alias("total"),
        F.first("max_s").cast("bigint").alias("max_cusum"),
        F.min(F.when(F.col("s") == F.col("max_s"), F.col("bucket")))
        .cast("bigint")
        .alias("max_at_s"),
        F.min("s").cast("bigint").alias("min_cusum"),
    )


@check(
    "event_rate_cusum",
    oracle=f"""
        WITH b AS (
            SELECT event_type,
                   (epoch_us(ts) // {CUSUM_BUCKET_S * 1_000_000})
                       * {CUSUM_BUCKET_S} AS bucket
            FROM events),
        counts AS (
            SELECT event_type, bucket, COUNT(*) AS cnt
            FROM b GROUP BY event_type, bucket),
        span AS (SELECT MIN(bucket) AS lo, MAX(bucket) AS hi FROM b),
        grid AS (
            SELECT t.event_type, CAST(g.g AS BIGINT) AS bucket
            FROM (SELECT DISTINCT event_type FROM b) t,
                 span,
                 LATERAL (SELECT unnest(range(span.lo, span.hi + 1,
                                              {CUSUM_BUCKET_S})) AS g) g),
        filled AS (
            SELECT g.event_type, g.bucket, COALESCE(c.cnt, 0) AS cnt
            FROM grid g LEFT JOIN counts c
              ON c.event_type = g.event_type AND c.bucket = g.bucket),
        cusum AS (
            SELECT event_type, bucket,
                   COUNT(*) OVER (PARTITION BY event_type)
                       * SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bucket)
                       * SUM(cnt) OVER (PARTITION BY event_type) AS s,
                   COUNT(*) OVER (PARTITION BY event_type) AS nb,
                   SUM(cnt) OVER (PARTITION BY event_type) AS total
            FROM filled),
        mx AS (
            SELECT event_type, MAX(s) AS max_s FROM cusum GROUP BY event_type)
        SELECT c.event_type,
               CAST(ANY_VALUE(c.nb) AS BIGINT) AS n_buckets,
               CAST(ANY_VALUE(c.total) AS BIGINT) AS total,
               CAST(ANY_VALUE(m.max_s) AS BIGINT) AS max_cusum,
               CAST(MIN(CASE WHEN c.s = m.max_s THEN c.bucket END) AS BIGINT)
                   AS max_at_s,
               CAST(MIN(c.s) AS BIGINT) AS min_cusum
        FROM cusum c JOIN mx m ON m.event_type = c.event_type
        GROUP BY c.event_type ORDER BY c.event_type""",
)
def q_event_rate_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type CUSUM drift statistics over the hourly event grid
    (empty hours included): scaled max/min cumulative deviation and the
    earliest hour attaining the max — all exact integer arithmetic."""
    return event_rate_cusum(load(spark, sf_dir, "events")).orderBy("event_type")
