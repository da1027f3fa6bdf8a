"""Scale smoke: run the heavy training-data operators on a corpus inflated
well past the bench SF, asserting they complete with sane outputs.  This is
the 'would it survive a 100× scale-up' canary — the operators must not
collect to the driver, explode memory, or degrade superlinearly."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.heavy  # builder full-pass material (SPARK_GRAFT_FULL_TESTS=1)

from pyspark.sql import functions as F

from dronedb_spark.tables import load

REPS = 10  # sf0.1 documents ×10 = 50k docs; embeddings ×10 = 20k vectors


def _big_docs(spark):
    docs = load(spark, "/root/testdata/sf0.1", "documents")
    return docs.crossJoin(spark.range(REPS).select(F.col("id").alias("rep"))).select(
        (F.col("doc_id") * REPS + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
        "source",
    )


def test_lsh_neardup_inflated_corpus(spark):
    from dronedb_spark.text.dedup import neardup_pairs

    pairs = neardup_pairs(_big_docs(spark))
    n = pairs.count()
    # every replica family (10 near-identical docs) must bucket together:
    # at least C(10,2) pairs per family for a large share of families
    assert n >= 5000 * 45 * 0.5


def test_ivf_assign_inflated_embeddings(spark):
    from dronedb_spark.vectors.ivf import N_CENTROIDS, ivf_cell_counts

    emb = load(spark, "/root/testdata/sf0.1", "embeddings")
    # id scheme keeps vec_id 0..7 as the ORIGINAL distinct vectors (they
    # seed the centroids); replicas get ids beyond the original range
    big = emb.crossJoin(spark.range(REPS).select(F.col("id").alias("rep"))).select(
        (F.col("vec_id") + F.lit(2000) * F.col("rep")).alias("vec_id"), "embedding", "label"
    )
    cells = ivf_cell_counts(big).collect()
    assert len(cells) == N_CENTROIDS
    assert sum(r["n"] for r in cells) == 2000 * REPS


def test_segment_dedup_barrier_invariant(spark):
    """tokens_barrier changes the plan (linear tokenize via exchange), never
    the result; on the inflated corpus every base segment occurs ≥10×, so
    the dup tally must reflect the inflation."""
    from dronedb_spark.text.segdedup import segment_dedup_tally

    docs = _big_docs(spark)
    inline = {r["doc_id"]: tuple(r)[1:] for r in segment_dedup_tally(docs).collect()}
    barrier = {
        r["doc_id"]: tuple(r)[1:]
        for r in segment_dedup_tally(docs, tokens_barrier=True).collect()
    }
    assert inline == barrier
    assert len(inline) == 50000
    # all segments except the doc's trailing ("... repN") one are shared
    # by the 10 replicas, so nearly every doc has dup segments
    n_with_dups = sum(1 for v in inline.values() if v[1] > 0)
    assert n_with_dups > 45000
