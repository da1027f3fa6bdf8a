"""Per-dimension distribution drift between two embedding populations —
the monitoring primitive a production embedding pipeline runs between
yesterday's corpus and today's (model regressions, upstream decode
changes, and domain shift all show up as per-dimension histogram
drift long before downstream recall collapses).

The artifact is the DECILE CONTINGENCY TABLE: reference-population
decile edges per dimension (TYPE-1 order statistics — engine-exact,
the ``text/lengths.py`` discipline; never interpolated quantiles),
then both populations bucketed against those same edges.  Population
Stability Index or KL can be folded from the counts downstream; the
counts themselves stay integer-exact and oracle-checkable, with no
transcendental crossing an engine boundary.

Scale shape: edges come from one window pass over the exploded
reference (at extreme scale the histogram-collapse trick applies: few
distinct float values per dim is rare, but SAMPLED reference edges are
the standard practice and change nothing downstream); the 64×9 edge
table broadcasts; bucketing is a map-only 9-element fold per value;
the contingency rollup is one map-side-combined groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

N_BUCKETS = 10


def _pts(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("val"))


def decile_edges(reference: DataFrame) -> DataFrame:
    """(pos, edges array<double>): the 9 type-1 decile edges per
    dimension — edge k = ceil(k·n/10)-th smallest, ties by vec_id."""
    pts = _pts(reference)
    w = Window.partitionBy("pos")
    staged = pts.select(
        "pos",
        "val",
        F.row_number().over(w.orderBy("val", "vec_id")).alias("rk"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    picks = staged.filter(
        F.expr(
            "exists(sequence(1, 9), "
            "k -> rk = CAST((k * n + 9) DIV 10 AS BIGINT))"
        )
    )
    return picks.groupBy("pos").agg(F.array_sort(F.collect_list("val")).alias("edges"))


def drift_decile_counts(
    reference: DataFrame, candidate: DataFrame
) -> DataFrame:
    """(pos, bucket, n_ref, n_cand): both populations bucketed against
    the REFERENCE decile edges (bucket = #edges strictly below val)."""
    edges = decile_edges(reference)

    def bucketed(df: DataFrame, name: str) -> DataFrame:
        return (
            _pts(df)
            .join(F.broadcast(edges), "pos")
            .select(
                "pos",
                F.size(F.filter("edges", lambda e: e < F.col("val"))).alias(
                    "bucket"
                ),
            )
            .groupBy("pos", "bucket")
            .agg(F.count(F.lit(1)).cast("bigint").alias(name))
        )
    r = bucketed(reference, "n_ref")
    c = bucketed(candidate, "n_cand")
    return r.join(c, ["pos", "bucket"], "full_outer").select(
        "pos",
        "bucket",
        F.coalesce("n_ref", F.lit(0)).cast("bigint").alias("n_ref"),
        F.coalesce("n_cand", F.lit(0)).cast("bigint").alias("n_cand"),
    )


@check(
    "embedding_drift_deciles",
    oracle=f"""
        WITH pts AS (
            SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings),
        ref AS (SELECT * FROM pts WHERE vec_id % 2 = 0),
        cand AS (SELECT * FROM pts WHERE vec_id % 2 = 1),
        staged AS (
            SELECT pos, val,
                   ROW_NUMBER() OVER (PARTITION BY pos ORDER BY val, vec_id) AS rk,
                   COUNT(*) OVER (PARTITION BY pos) AS n
            FROM ref),
        edges AS (
            SELECT pos, list_sort(list(val)) AS edges
            FROM staged
            WHERE EXISTS (SELECT 1 FROM range(1, 10) t(k)
                          WHERE rk = (k * n + 9) // 10)
            GROUP BY pos),
        rb AS (
            SELECT p.pos,
                   len(list_filter(e.edges, x -> x < p.val)) AS bucket,
                   COUNT(*) AS n_ref
            FROM ref p JOIN edges e ON e.pos = p.pos
            GROUP BY 1, 2),
        cb AS (
            SELECT p.pos,
                   len(list_filter(e.edges, x -> x < p.val)) AS bucket,
                   COUNT(*) AS n_cand
            FROM cand p JOIN edges e ON e.pos = p.pos
            GROUP BY 1, 2)
        SELECT COALESCE(rb.pos, cb.pos) AS pos,
               CAST(COALESCE(rb.bucket, cb.bucket) AS INT) AS bucket,
               CAST(COALESCE(rb.n_ref, 0) AS BIGINT) AS n_ref,
               CAST(COALESCE(cb.n_cand, 0) AS BIGINT) AS n_cand
        FROM rb FULL OUTER JOIN cb
          ON rb.pos = cb.pos AND rb.bucket = cb.bucket
        ORDER BY pos, bucket""",
)
def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Even vec_ids as the reference population, odd as the candidate:
    the 64×10 decile contingency table, integer-exact."""
    emb = load(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cand = emb.filter(F.col("vec_id") % 2 == 1)
    return drift_decile_counts(ref, cand).orderBy("pos", "bucket")
