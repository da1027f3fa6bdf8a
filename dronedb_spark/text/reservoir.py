"""Deterministic fixed-size corpus sampling — the "reservoir" primitive
every audit/eval/calibration stage draws from (quality spot checks,
LSH-calibration inputs, human-review batches), made REPRODUCIBLE: the
sample of N is the N smallest ``md5(seed || key)`` rows, so the same
(seed, N) always names the same documents regardless of partitioning,
ingestion order, or cluster size — unlike ``rand()`` reservoirs, two
runs (or two engines) agree row-for-row, and growing the corpus only
evicts by hash order (a consistent-hashing property: adding data
changes the sample minimally, ~N·new/(old+new) rows swap).

Scale shape: ORDER BY hash LIMIT N plans as TakeOrderedAndProject —
per-partition top-N heaps then one N-row merge on the driver side of
the exchange; nothing resembling a global sort materializes
(plan-pinned in tests/test_plans.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

SAMPLE_N = 100
SEED = "audit-v1"


def reservoir_sample(
    docs: DataFrame, n: int = SAMPLE_N, seed: str = SEED
) -> DataFrame:
    """(rank, doc_id, source): the n smallest-hash documents, ranked."""
    hashed = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    )
    top = hashed.orderBy("h", "doc_id").limit(n)
    w = Window.orderBy("h", "doc_id")
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id",
        "source",
    )


@check(
    "reservoir_sample_fixed",
    oracle=f"""
        WITH hashed AS (
            SELECT doc_id, source,
                   md5('{SEED}:' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents),
        top AS (
            SELECT doc_id, source, h FROM hashed
            ORDER BY h, doc_id LIMIT {SAMPLE_N})
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS rank,
               doc_id, source
        FROM top ORDER BY rank""",
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 100-document audit sample: same (seed, N) →
    same rows on any engine, any partitioning — ranked by hash order."""
    return reservoir_sample(load(spark, sf_dir, "documents")).orderBy("rank")
