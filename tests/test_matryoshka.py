"""Matryoshka truncation laws: the full budget reproduces exact top-k,
prefix budgets degrade but stay sane, and one pass scores all budgets."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.vectors.matryoshka import matryoshka_topk


def test_full_budget_is_exact_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    rows = matryoshka_topk(emb, 0, 10).collect()
    per = {}
    for r in rows:
        per.setdefault(r["dim_budget"], []).append((r["l2_dist"], r["vec_id"]))
    # exact reference at the full dimension
    pts = emb.select("vec_id", F.posexplode("embedding").alias("pos", "v")).select(
        "vec_id", "pos", F.col("v").cast("double").alias("val")
    )
    q = pts.filter(F.col("vec_id") == 0).select("pos", F.col("val").alias("qval"))
    exact = (
        pts.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), "pos")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(
                    ((F.col("val") - F.col("qval")) * (F.col("val") - F.col("qval")))
                    .cast("decimal(38,15)")
                ),
                6,
            ).cast("double").alias("d")
        )
        .orderBy("d", "vec_id")
        .limit(10)
        .collect()
    )
    assert sorted(per[64]) == sorted((r["d"], r["vec_id"]) for r in exact)


def test_budgets_monotone_distance_and_size(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    rows = matryoshka_topk(emb, 0, 10).collect()
    per = {}
    for r in rows:
        per.setdefault(r["dim_budget"], []).append(r["l2_dist"])
    assert set(per) == {16, 32, 64} and all(len(v) == 10 for v in per.values())
    # a prefix L2 is a partial sum of squares: per-vector distance grows
    # with the budget, so the best-of-corpus at a smaller budget cannot
    # exceed the best at a larger one
    assert min(per[16]) <= min(per[32]) <= min(per[64])
