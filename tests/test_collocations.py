"""Collocation laws: exact lift on a closed-form corpus, the hapax
floor, and a planted phrase outranking chance pairs."""

from __future__ import annotations

from dronedb_spark.text.collocations import bigram_lift_topk


def test_planted_phrase_wins_and_lift_is_exact(spark):
    # "hong kong" always co-occurs; "the cat/dog/..." pairs are diffuse
    rows = []
    for i in range(10):
        rows.append((i, "hong kong visit " + " ".join(f"f{i}a f{i}b the x{j}" for j in range(3))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_lift_topk(docs, k=5, min_count=5).collect()
    top = out[0]
    assert (top["w1"], top["w2"]) == ("hong", "kong")
    # closed form: lift = c_ab * N / (c_a * c_b)
    assert top["lift"] == top["c_ab"] * sum_bigrams(docs) / (top["c_a"] * top["c_b"])


def sum_bigrams(docs):
    from pyspark.sql import functions as F

    return (
        docs.select(
            F.greatest(
                F.size(F.filter(F.split("text", " "), lambda w: w != "")) - 1,
                F.lit(0),
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )


def test_min_count_floor(spark):
    docs = spark.createDataFrame(
        [(1, "rare pair only once here"), (2, "common duo common duo common duo common duo common duo")],
        "doc_id long, text string",
    )
    out = bigram_lift_topk(docs, k=10, min_count=5).collect()
    pairs = {(r["w1"], r["w2"]) for r in out}
    assert ("rare", "pair") not in pairs
    assert ("common", "duo") in pairs
