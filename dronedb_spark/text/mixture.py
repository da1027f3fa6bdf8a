"""Training-data mixture planning — temperature-weighted source
sampling (the GPT-3 / DoReMi-style mixture: source weight ∝ tokens^α
with α < 1 so small sources up-weight), the step between corpus
curation and shard writing: given a per-epoch document budget, how many
documents does each source contribute?

Exactness discipline: the α = ½ weight is ``floor(√tokens · 10⁶)`` — a
micro-integer assembled from one correctly-rounded IEEE sqrt of an
exact integer, so both engines pick the identical BIGINT; every
downstream quantity (share, budget, per-source rate) is pure integer
arithmetic (``DIV``), never a float sum whose order could differ.

Scale shape: one map-side-combined groupBy(source) over the corpus —
the only data-sized pass is the token count; the plan itself is
sources-sized.  A rate over 10⁶ ppm means the source repeats
(epoch-repeat territory, ``text/epochs.py``); under 10⁶ it subsamples.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

BUDGET_DOCS = 100_000


def mixture_plan(docs: DataFrame, budget_docs: int = BUDGET_DOCS) -> DataFrame:
    """(source, n_docs, n_tokens, weight_micro, share_ppm, docs_budget,
    rate_ppm): the per-source sampling plan under a √tokens temperature
    weighting."""
    toks = docs.select(
        "source",
        F.size(F.filter(F.split("text", " "), lambda t: t != "")).alias("nt"),
    )
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nt").cast("bigint").alias("n_tokens"),
    )
    weighted = per_src.withColumn(
        "weight_micro",
        F.expr("CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0) AS BIGINT)"),
    )
    total = weighted.agg(
        F.sum("weight_micro").cast("bigint").alias("w_total")
    )
    return (
        weighted.join(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "weight_micro",
            F.expr("weight_micro * 1000000 DIV w_total").alias("share_ppm"),
            F.expr(f"{budget_docs} * weight_micro DIV w_total").alias(
                "docs_budget"
            ),
            F.expr(
                f"({budget_docs} * weight_micro DIV w_total) * 1000000"
                " DIV n_docs"
            ).alias("rate_ppm"),
        )
    )


@check(
    "mixture_temperature_plan",
    oracle=f"""
        WITH per_src AS (
            SELECT source,
                   CAST(COUNT(1) AS BIGINT) AS n_docs,
                   CAST(SUM(len(list_filter(string_split(text, ' '),
                                            x -> x <> ''))) AS BIGINT)
                       AS n_tokens
            FROM documents GROUP BY source),
        weighted AS (
            SELECT *,
                   CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
                        AS BIGINT) AS weight_micro
            FROM per_src),
        tot AS (SELECT CAST(SUM(weight_micro) AS BIGINT) AS w_total
                FROM weighted)
        SELECT source, n_docs, n_tokens, weight_micro,
               CAST(weight_micro * 1000000 // w_total AS BIGINT) AS share_ppm,
               CAST({BUDGET_DOCS} * weight_micro // w_total AS BIGINT)
                   AS docs_budget,
               CAST(CAST({BUDGET_DOCS} * weight_micro // w_total AS BIGINT)
                    * 1000000 // n_docs AS BIGINT) AS rate_ppm
        FROM weighted, tot ORDER BY source""",
)
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The √tokens-temperature sampling plan for a 100k-document epoch
    over the 20 corpus sources — weights, shares, per-source budgets
    and rates all integer-exact."""
    return mixture_plan(load(spark, sf_dir, "documents")).orderBy("source")
