"""Epoch-materialization laws: per-source conservation, downsampling,
the explode identity, and layout-independent fractional selection."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.mixture import epoch_copies, materialize_epochs


def _docs(spark, per_source):
    rows = []
    i = 0
    for src, n in per_source.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def _budgets(spark, rows):
    return spark.createDataFrame(rows, "source string, n_docs long, budget long")


def test_conservation_per_source(spark):
    docs = _docs(spark, {"a": 10, "b": 7})
    budgets = _budgets(spark, [("a", 10, 43), ("b", 7, 7)])
    got = (
        epoch_copies(docs, budgets)
        .groupBy("source")
        .agg(F.sum("n_copies").alias("total"))
        .collect()
    )
    assert {r["source"]: r["total"] for r in got} == {"a": 43, "b": 7}


def test_downsample_gives_zero_or_one(spark):
    docs = _docs(spark, {"a": 20})
    budgets = _budgets(spark, [("a", 20, 6)])
    copies = epoch_copies(docs, budgets).collect()
    assert sorted({r["n_copies"] for r in copies}) == [0, 1]
    assert sum(r["n_copies"] for r in copies) == 6


def test_materialize_explodes_exactly(spark):
    docs = _docs(spark, {"a": 4})
    budgets = _budgets(spark, [("a", 4, 11)])
    rows = materialize_epochs(epoch_copies(docs, budgets)).collect()
    assert len(rows) == 11
    # copy_no is 1..n_copies per doc
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["copy_no"])
    for copies in per_doc.values():
        assert sorted(copies) == list(range(1, len(copies) + 1))


def test_fractional_subset_is_layout_independent(spark):
    docs = _docs(spark, {"a": 50})
    budgets = _budgets(spark, [("a", 50, 17)])
    picked = None
    for n_parts in (1, 4, 13):
        got = sorted(
            r["doc_id"]
            for r in epoch_copies(docs.repartition(n_parts), budgets)
            .filter(F.col("n_copies") > 0)
            .collect()
        )
        if picked is None:
            picked = got
        assert got == picked
    assert len(picked) == 17
