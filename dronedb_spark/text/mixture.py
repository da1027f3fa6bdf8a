"""Temperature-based mixture budgeting — the multilingual/multi-source
rebalancing step (beyond the reference; the mT5/XLM-R "temperature
sampling" recipe, Conneau et al. 2019): low-resource sources are
upsampled by flattening the source distribution, budget_i ∝ c_i^(1/T).

Exactness discipline: weights are INTEGERIZED before any division —
w_i = floor(sqrt(c_i · 10^6)) for T = 2 (IEEE sqrt is correctly
rounded, so both engines floor the same double), and the allocation is
the largest-remainder method in pure integer arithmetic:
base_i = N·w_i // W, then the R = N − Σbase leftover seats go to the R
largest remainders N·w_i mod W (ties by source name).  No float ever
crosses an ordering boundary, so the oracle matches seat for seat.

Scale shape: per-source counts are one partial-aggregated pass; the
allocation itself runs on the SOURCE table (a handful of rows) via a
window rank — model-state-sized, like the BPE merge scalars."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

TOTAL_BUDGET = 10000


def temperature_budgets(docs: DataFrame, total: int = TOTAL_BUDGET) -> DataFrame:
    """(source, n_docs, weight, budget): per-source sample budgets under
    T=2 temperature flattening, exact largest-remainder allocation."""
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.floor(F.sqrt(F.col("n_docs") * F.lit(1000000.0))).cast("bigint")
    weighted = counts.select("source", "n_docs", w.alias("weight"))
    tot_w = weighted.agg(F.sum("weight").alias("w_sum"))
    j = weighted.join(F.broadcast(tot_w))
    # integer DIV, not `/`: the double quotient's truncation can
    # disagree with the oracle's exact `//` once total·weight nears 2^53
    base = F.expr(f"CAST({total} AS BIGINT) * weight DIV w_sum")
    rem = (F.lit(total) * F.col("weight")) % F.col("w_sum")
    staged = j.select(
        "source", "n_docs", "weight",
        base.alias("base"), rem.alias("rem"),
        (F.lit(total) - F.sum(base).over(Window.partitionBy())).alias("leftover"),
    )
    rank = F.row_number().over(Window.partitionBy().orderBy(F.desc("rem"), "source"))
    return staged.select(
        "source", "n_docs", "weight",
        (F.col("base") + F.when(rank <= F.col("leftover"), 1).otherwise(0))
        .cast("bigint")
        .alias("budget"),
    )


@check(
    "temperature_mixture_budgets",
    oracle=f"""
        WITH counts AS (
            SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source),
        weighted AS (
            SELECT source, n_docs,
                   CAST(FLOOR(SQRT(n_docs * 1000000.0)) AS BIGINT) AS weight
            FROM counts),
        tot AS (SELECT SUM(weight) AS w_sum FROM weighted),
        staged AS (
            SELECT source, n_docs, weight,
                   CAST(({TOTAL_BUDGET}::BIGINT * weight) // w_sum AS BIGINT) AS base,
                   ({TOTAL_BUDGET}::BIGINT * weight) % w_sum AS rem
            FROM weighted CROSS JOIN tot),
        lo AS (SELECT {TOTAL_BUDGET} - SUM(base) AS leftover FROM staged)
        SELECT s.source, CAST(s.n_docs AS BIGINT) AS n_docs, s.weight,
               CAST(s.base + CASE WHEN ROW_NUMBER() OVER
                        (ORDER BY s.rem DESC, s.source) <= lo.leftover
                    THEN 1 ELSE 0 END AS BIGINT) AS budget
        FROM staged s CROSS JOIN lo
        ORDER BY s.source""",
)
def q_temperature_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source budgets at T=2 over the corpus — weights, bases, and
    every leftover seat value-checked (budgets must sum to the total —
    pytest pins the conservation law)."""
    docs = load(spark, sf_dir, "documents").select("source")
    return temperature_budgets(docs).orderBy("source")
