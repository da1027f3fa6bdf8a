"""Misra-Gries heavy-hitter laws: the pigeonhole recall guarantee under
adversarial partition layouts, the bounded summary size, exactness of
the verified output, and merge soundness."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.heavyhitters import (
    heavy_hitters_exact,
    merge_summaries,
    mg_partition_summaries,
)


def _corpus(spark, n_parts):
    # 1000 filler docs of unique junk tokens + two planted heavy tokens:
    # N = 3000 + 600 + 500 = 4100, threshold N/9 ~ 456 for k=8, so
    # "hot" (600) clears it comfortably and "warm" (500) just clears it.
    rows = [(i, f"junk{i}a junk{i}b junk{i}c") for i in range(1000)]
    rows += [(10_000 + i, "hot hot hot hot") for i in range(150)]
    rows += [(20_000 + i, "warm warm warm warm warm") for i in range(100)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(n_parts)


def _exact_counts(docs):
    return {
        r["tok"]: r["cnt"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }


def test_pigeonhole_recall_any_layout(spark):
    """Every token above N/(k+1) appears in the candidate union no
    matter how the rows are laid out across partitions."""
    k = 8
    for n_parts in (1, 3, 16):
        docs = _corpus(spark, n_parts)
        counts = _exact_counts(docs)
        n = sum(counts.values())
        heavies = {t for t, c in counts.items() if c * (k + 1) > n}
        assert heavies == {"hot", "warm"}
        cands = {
            r["tok"]
            for r in mg_partition_summaries(docs, k).filter(F.col("tok") != "").collect()
        }
        assert heavies <= cands


def test_summary_bounded_per_partition(spark):
    """Pass 1 emits at most k candidate rows + 1 sentinel per partition
    however many distinct tokens the partition holds."""
    k = 8
    docs = _corpus(spark, 4)
    per_part = (
        mg_partition_summaries(docs, k)
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    assert all(r["rows"] <= k + 1 for r in per_part)


def test_exact_output_is_layout_independent(spark):
    k = 8
    expected = None
    for n_parts in (1, 5, 16):
        docs = _corpus(spark, n_parts)
        got = sorted(tuple(r) for r in heavy_hitters_exact(docs, k).collect())
        if expected is None:
            expected = got
        assert got == expected
    counts = _exact_counts(_corpus(spark, 3))
    n = sum(counts.values())
    assert dict(expected) == {t: c for t, c in counts.items() if c * (k + 1) > n}


def test_merge_keeps_heavy_and_bounds_rows(spark):
    """Merging per-partition summaries re-strikes to <= k rows and the
    planted heavy tokens survive the subtraction."""
    k = 8
    docs = _corpus(spark, 16)
    merged = merge_summaries(mg_partition_summaries(docs, k), k).collect()
    assert len(merged) <= k
    toks = {r["tok"] for r in merged}
    assert {"hot", "warm"} <= toks


def test_sentinel_carries_exact_token_count(spark):
    docs = _corpus(spark, 7)
    n_sentinel = (
        mg_partition_summaries(docs, 8)
        .filter(F.col("tok") == "")
        .agg(F.sum("cnt"))
        .collect()[0][0]
    )
    assert n_sentinel == sum(_exact_counts(docs).values())
