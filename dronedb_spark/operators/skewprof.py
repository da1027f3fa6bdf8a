"""Join-key skew profiling — the diagnostic a 100 TB pipeline runs
BEFORE a big join or groupBy: how unbalanced is this key, which keys
are hot, and what salt factor would flatten them.  AQE splits skewed
partitions at runtime, but a persistent profile drives design choices
(broadcast vs shuffle, salting factor, bucketing column) and regression
alerts when a key's distribution drifts.  Beyond the reference (no
relational tuning surface); the statistic set follows the skew sizing
Spark's own AQE uses (max/median partition factors).

Exactness discipline: everything integer — the mean never
materializes; comparisons cross-multiply (``cnt·n_keys > k·total``),
the imbalance factor is ``max·n_keys·10⁶ DIV total`` (micro units of
max/avg) and the suggested salt is its ceiling
(``(max·n_keys + total − 1) DIV total``).  The top key reports the
SMALLEST key among argmax counts (deterministic ties).

Scale shape: ONE map-side-combined groupBy(key) per profiled column —
the same shuffle the join itself would do — then every statistic is an
aggregate over the key-count table (keys-sized).  Profiling k columns
unions k independent pipelines; nothing is collected."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

HEAVY_X = 2  # a key is heavy when its count exceeds 2x the mean


def key_skew_profile(df: DataFrame, key: str, label: str) -> DataFrame:
    """One row: (key_col, n_rows, n_keys, max_count, top_key,
    heavy_keys, imbalance_micro, suggested_salt) for ``df[key]``.
    The key-count table aggregates once to a 1-row stats frame, which
    broadcasts back for the argmax/heavy passes — keys-sized work,
    fully map-side after the one count shuffle."""
    counts = df.groupBy(F.col(key).cast("string").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    stats = counts.agg(
        F.sum("cnt").cast("bigint").alias("_tot"),
        F.count(F.lit(1)).cast("bigint").alias("_nk"),
        F.max("cnt").cast("bigint").alias("_mx"),
    )
    return (
        counts.join(F.broadcast(stats))
        .agg(
            F.lit(label).alias("key_col"),
            F.max("_tot").alias("n_rows"),
            F.max("_nk").alias("n_keys"),
            F.max("_mx").alias("max_count"),
            F.min(F.when(F.col("cnt") == F.col("_mx"), F.col("k"))).alias(
                "top_key"
            ),
            F.sum(
                (
                    F.col("cnt") * F.col("_nk")
                    > F.lit(HEAVY_X) * F.col("_tot")
                ).cast("bigint")
            ).alias("heavy_keys"),
            F.max(F.expr("_mx * _nk * 1000000 DIV _tot")).alias(
                "imbalance_micro"
            ),
            F.max(F.expr("(_mx * _nk + _tot - 1) DIV _tot")).alias(
                "suggested_salt"
            ),
        )
    )


@check(
    "join_skew_profile",
    oracle=f"""
        WITH prof AS (
            SELECT 'events.user_id' AS key_col,
                   CAST(user_id AS VARCHAR) AS k FROM events
            UNION ALL
            SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR)
            FROM lineitem
            UNION ALL
            SELECT 'documents.source', source FROM documents),
        counts AS (
            SELECT key_col, k, COUNT(1) AS cnt
            FROM prof GROUP BY 1, 2),
        stats AS (
            SELECT key_col,
                   SUM(cnt) AS tot, COUNT(1) AS nk, MAX(cnt) AS mx
            FROM counts GROUP BY 1),
        top AS (
            SELECT c.key_col, MIN(c.k) AS top_key
            FROM counts c JOIN stats s
              ON s.key_col = c.key_col AND c.cnt = s.mx
            GROUP BY 1),
        heavy AS (
            SELECT c.key_col,
                   SUM(CASE WHEN c.cnt * s.nk > {HEAVY_X} * s.tot
                            THEN 1 ELSE 0 END) AS heavy_keys
            FROM counts c JOIN stats s ON s.key_col = c.key_col
            GROUP BY 1)
        SELECT s.key_col,
               CAST(s.tot AS BIGINT) AS n_rows,
               CAST(s.nk AS BIGINT) AS n_keys,
               CAST(s.mx AS BIGINT) AS max_count,
               t.top_key,
               CAST(h.heavy_keys AS BIGINT) AS heavy_keys,
               CAST(s.mx * s.nk * 1000000 // s.tot AS BIGINT)
                   AS imbalance_micro,
               CAST((s.mx * s.nk + s.tot - 1) // s.tot AS BIGINT)
                   AS suggested_salt
        FROM stats s
        JOIN top t ON t.key_col = s.key_col
        JOIN heavy h ON h.key_col = s.key_col
        ORDER BY 1""",
)
def q_join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of three real join keys (events.user_id,
    lineitem.l_partkey, documents.source): hot-key counts, integer
    imbalance factor, and the salt a skew mitigation would use."""
    parts = [
        key_skew_profile(
            load(spark, sf_dir, "events"), "user_id", "events.user_id"
        ),
        key_skew_profile(
            load(spark, sf_dir, "lineitem"), "l_partkey", "lineitem.l_partkey"
        ),
        key_skew_profile(
            load(spark, sf_dir, "documents"), "source", "documents.source"
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_col")
