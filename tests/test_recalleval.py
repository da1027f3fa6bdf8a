"""IVF recall-calibration laws (vectors/recalleval.py)."""

from __future__ import annotations

from dronedb_spark.vectors.recalleval import ivf_recall_curve


def test_recall_curve_laws(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = {r["nprobe"]: r for r in ivf_recall_curve(emb).collect()}
    assert set(rows) == {1, 2, 4, 8}
    # probing every cell IS brute force: recall exactly 1.0
    assert rows[8]["recall_micro"] == 1_000_000
    assert rows[8]["sum_hits"] == rows[8]["n_queries"] * 10
    # monotone: more cells probed can only add candidates
    hits = [rows[p]["sum_hits"] for p in (1, 2, 4, 8)]
    assert hits == sorted(hits)
    # recall_micro is the integer quotient of its own sufficient stats
    for r in rows.values():
        assert r["recall_micro"] == r["sum_hits"] * 1_000_000 // (
            r["n_queries"] * 10
        )


def test_query_sample_is_enforced(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = ivf_recall_curve(emb, n_queries=4).collect()
    assert all(r["n_queries"] == 4 for r in out)
    assert max(r["sum_hits"] for r in out) <= 4 * 10
