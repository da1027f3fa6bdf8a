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
