"""Matryoshka dimension-truncation evaluation (Kusupati et al. 2022,
"Matryoshka Representation Learning") — serving stacks truncate MRL
embeddings to a prefix (16 of 64 dims = 4× less memory and bandwidth)
and need the measured answer to "how much ranking do I lose at this
budget?".  This op produces the top-k neighbor lists under each prefix
budget so the recall-vs-budget curve is a value-checked artifact, not a
hope.

Exactness and shape:

  * distances are the package's decimal-exact L2 (per-term
    DECIMAL(38,15) casts — order-independent sums, ROUND(...,6) at the
    edge), so every ranking is engine-reproducible;
  * ALL budgets are scored in ONE aggregation pass — the per-(vec,dim)
    term feeds one conditional sum per budget (a prefix budget is just
    a predicate on ``pos``), so evaluating B budgets costs one corpus
    scan, not B;
  * top-k per budget is a row_number window over the小 (n_vecs × B)
    distance table, then the fixed-size result.

At 100 TB the same plan holds: the scan is the cost, budgets are
predicates, and the distance table that shuffles is (corpus × B) rows
of three numeric columns.  The recall@10-vs-full curve on the fixture
is pytest-pinned (prefix budgets must degrade gracefully, and the full
budget must reproduce the exact top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

BUDGETS = (16, 32, 64)
K = 10


def matryoshka_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = K,
    budgets: tuple[int, ...] = BUDGETS,
) -> DataFrame:
    """(dim_budget, vec_id, l2_dist): top-k per prefix budget, one pass."""
    pts = embeddings.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("val"))
    q = pts.filter(F.col("vec_id") == query_vec_id).select(
        "pos", F.col("val").alias("qval")
    )
    term = (
        ((F.col("val") - F.col("qval")) * (F.col("val") - F.col("qval")))
        .cast("decimal(38,15)")
    )
    agg = (
        pts.filter(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), "pos")
        .groupBy("vec_id")
        .agg(
            *[
                F.round(F.sum(F.when(F.col("pos") < d, term)), 6)
                .cast("double")
                .alias(f"d{d}")
                for d in budgets
            ]
        )
    )
    stacked = agg.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim_budget"), F.col(f"d{d}").alias("l2_dist")
                    )
                    for d in budgets
                ]
            )
        ).alias("s"),
    ).select("vec_id", "s.dim_budget", "s.l2_dist")
    w = Window.partitionBy("dim_budget").orderBy("l2_dist", "vec_id")
    return (
        stacked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("dim_budget", "vec_id", "l2_dist")
    )


@check(
    "matryoshka_topk",
    oracle=f"""
        WITH pts AS (
            SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings),
        q AS (SELECT pos, val AS qval FROM pts WHERE vec_id = 0),
        dist AS (
            SELECT p.vec_id,
                   {", ".join(
                       "ROUND(SUM(CAST((p.val - q.qval) * (p.val - q.qval) "
                       "AS DECIMAL(38,15))) FILTER (WHERE p.pos < "
                       + str(d) + "), 6) AS d" + str(d)
                       for d in BUDGETS)}
            FROM pts p JOIN q ON q.pos = p.pos
            WHERE p.vec_id <> 0 GROUP BY p.vec_id),
        stacked AS (
            {" UNION ALL ".join(
                "SELECT CAST(" + str(d) + " AS INT) AS dim_budget, vec_id, "
                "CAST(d" + str(d) + " AS DOUBLE) AS l2_dist FROM dist"
                for d in BUDGETS)}),
        ranked AS (
            SELECT dim_budget, vec_id, l2_dist,
                   ROW_NUMBER() OVER (PARTITION BY dim_budget
                       ORDER BY l2_dist, vec_id) AS rk
            FROM stacked)
        SELECT dim_budget, vec_id, l2_dist FROM ranked
        WHERE rk <= {K} ORDER BY dim_budget, l2_dist, vec_id""",
)
def q_matryoshka_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 of vec 0 at 16/32/64-dim prefix budgets, decimal-exact —
    the recall-vs-budget curve's raw material."""
    emb = load(spark, sf_dir, "embeddings")
    return matryoshka_topk(emb).orderBy("dim_budget", "l2_dist", "vec_id")
