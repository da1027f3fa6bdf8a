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


# --------------------------------------------------------- KS flagging --

# flag when D = max |CDF_ref - CDF_cand| exceeds NUM/DEN (0.2): the
# comparison runs as the integer cross-multiplication
# |cum_ref*n_cand - cum_cand*n_ref| * DEN > NUM * n_ref * n_cand
KS_NUM, KS_DEN = 1, 5


def drift_ks_flags(
    reference: DataFrame, candidate: DataFrame
) -> DataFrame:
    """(pos, d_num, d_den, drifted): the two-sample Kolmogorov-Smirnov
    D-statistic per dimension, computed EXACTLY over the decile
    contingency table — cumulative counts are integers, the max |CDF
    difference| is the integer pair (d_num = max |cum_ref·n_cand −
    cum_cand·n_ref|, d_den = n_ref·n_cand), and the flag compares
    rationals by cross-multiplication.  No float ever crosses the
    decision boundary, so the flag set is engine-exact — the property
    a nightly drift alert needs (a last-ulp flip is a paging storm).

    The decile edges quantize the CDF, so this is the KS statistic OF
    THE BUCKETED distributions — the standard monitoring practice
    (finer grids sharpen it; the machinery is bucket-count-agnostic).
    """
    counts = drift_decile_counts(reference, candidate)
    w = (
        Window.partitionBy("pos")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("pos")
    staged = counts.select(
        "pos",
        "bucket",
        F.sum("n_ref").over(w).alias("cum_ref"),
        F.sum("n_cand").over(w).alias("cum_cand"),
        F.sum("n_ref").over(tot).alias("n_ref_tot"),
        F.sum("n_cand").over(tot).alias("n_cand_tot"),
    )
    diff = F.abs(
        F.col("cum_ref") * F.col("n_cand_tot")
        - F.col("cum_cand") * F.col("n_ref_tot")
    )
    return (
        staged.withColumn("diff", diff)
        .groupBy("pos")
        .agg(
            F.max("diff").cast("bigint").alias("d_num"),
            (F.first("n_ref_tot") * F.first("n_cand_tot"))
            .cast("bigint")
            .alias("d_den"),
        )
        .select(
            "pos",
            "d_num",
            "d_den",
            (F.col("d_num") * KS_DEN > KS_NUM * F.col("d_den"))
            .cast("bigint")
            .alias("drifted"),
        )
    )


@check(
    "embedding_drift_ks",
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
            SELECT p.pos, len(list_filter(e.edges, x -> x < p.val)) AS bucket,
                   COUNT(*) AS n_ref
            FROM ref p JOIN edges e ON e.pos = p.pos GROUP BY 1, 2),
        cb AS (
            SELECT p.pos, len(list_filter(e.edges, x -> x < p.val)) AS bucket,
                   COUNT(*) AS n_cand
            FROM cand p JOIN edges e ON e.pos = p.pos GROUP BY 1, 2),
        tbl AS (
            SELECT COALESCE(rb.pos, cb.pos) AS pos,
                   COALESCE(rb.bucket, cb.bucket) AS bucket,
                   COALESCE(rb.n_ref, 0) AS n_ref,
                   COALESCE(cb.n_cand, 0) AS n_cand
            FROM rb FULL OUTER JOIN cb
              ON rb.pos = cb.pos AND rb.bucket = cb.bucket),
        cum AS (
            SELECT pos, bucket,
                   SUM(n_ref) OVER (PARTITION BY pos ORDER BY bucket
                       ROWS UNBOUNDED PRECEDING) AS cum_ref,
                   SUM(n_cand) OVER (PARTITION BY pos ORDER BY bucket
                       ROWS UNBOUNDED PRECEDING) AS cum_cand,
                   SUM(n_ref) OVER (PARTITION BY pos) AS nr,
                   SUM(n_cand) OVER (PARTITION BY pos) AS nc
            FROM tbl)
        SELECT pos,
               CAST(MAX(abs(cum_ref * nc - cum_cand * nr)) AS BIGINT) AS d_num,
               CAST(ANY_VALUE(nr * nc) AS BIGINT) AS d_den,
               CAST(CASE WHEN MAX(abs(cum_ref * nc - cum_cand * nr)) * {KS_DEN}
                              > {KS_NUM} * ANY_VALUE(nr * nc)
                         THEN 1 ELSE 0 END AS BIGINT) AS drifted
        FROM cum GROUP BY pos ORDER BY pos""",
)
def q_embedding_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension exact KS over the even/odd split — same-distribution
    halves must NOT flag at D > 0.2 (the law a false-alarm-free monitor
    rests on); the planted-shift pytest proves the flag fires."""
    emb = load(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    cand = emb.filter(F.col("vec_id") % 2 == 1)
    return drift_ks_flags(ref, cand).orderBy("pos")
