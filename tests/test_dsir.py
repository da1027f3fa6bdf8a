"""DSIR importance resampling: model math, target preference, and the
deterministic Gumbel draw."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dronedb_spark.text.dsir import (
    N_BUCKETS,
    dsir_bucket_model,
    dsir_doc_logweights,
    dsir_resample,
    hashed_gram_counts,
)


def _corpus(spark):
    # two dialects: "target-like" docs reuse a small vocabulary, raw
    # docs add off-target words
    rows = []
    for i in range(20):
        rows.append((i, "the table scans rows fast " * 6, "en"))
    for i in range(20, 40):
        rows.append((i, "zebra quark nebula oxide plinth " * 6, "de"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_gram_counts_mass(spark):
    docs = _corpus(spark).limit(1)
    n_tok = len(docs.collect()[0]["text"].split(" "))
    total = hashed_gram_counts(docs).agg(F.sum("c")).collect()[0][0]
    assert total == n_tok + (n_tok - 1)  # unigrams + bigrams


def test_model_totals_and_formula(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("lang") == "en")
    m = dsir_bucket_model(docs, target, spark).collect()
    assert len(m) == N_BUCKETS
    t_tot = sum(r["t_n"] for r in m)
    r_tot = sum(r["r_n"] for r in m)
    # every bucket's lw matches the closed form
    for r in m:
        want = (
            math.log(r["t_n"] + 1)
            - math.log(r["r_n"] + 1)
            + math.log(r_tot + N_BUCKETS)
            - math.log(t_tot + N_BUCKETS)
        )
        assert abs(r["lw"] - want) < 1e-12


def test_target_docs_outscore_offtarget(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("lang") == "en")
    lw = dsir_doc_logweights(docs, target, spark).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    means = {
        r["lang"]: r["m"]
        for r in lw.groupBy("lang").agg(F.avg("logw").alias("m")).collect()
    }
    assert means["en"] > means["de"]


def test_resample_prefers_target_and_is_deterministic(spark):
    docs = _corpus(spark)
    target = docs.filter(F.col("lang") == "en")
    a = [r["doc_id"] for r in dsir_resample(docs, target, spark, 10).collect()]
    b = [r["doc_id"] for r in dsir_resample(docs, target, spark, 10).collect()]
    assert a == b and len(a) == 10
    # with a 30+ nat log-weight gap the Gumbel noise (~±3 nats) cannot
    # promote an off-target doc
    assert all(i < 20 for i in a)
