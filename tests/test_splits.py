"""Leakage-free split laws (text/splits.py)."""

from __future__ import annotations

from dronedb_spark.text.splits import leakage_free_split, split_report


def _docs(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")


def _clusters(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id bigint, cluster_id bigint")


def test_clusters_move_whole(spark):
    docs = _docs(spark, 40)
    # two 10-member clusters + 20 singletons
    clusters = _clusters(
        spark,
        [(i, 0) for i in range(10)] + [(i, 10) for i in range(10, 20)],
    )
    sp = leakage_free_split(docs, clusters).collect()
    by_unit = {}
    for r in sp:
        by_unit.setdefault(r["unit"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_unit.values())
    # cluster members share their unit's split
    c0 = {r["split"] for r in sp if r["unit"] == 0}
    assert len(c0) == 1 and sum(1 for r in sp if r["unit"] == 0) == 10


def test_report_audit_is_zero_and_partitions(spark):
    docs = _docs(spark, 100)
    clusters = _clusters(spark, [(i, i // 5 * 5) for i in range(50)])
    rep = {r["split"]: r for r in split_report(
        leakage_free_split(docs, clusters)
    ).collect()}
    assert sum(r["n_docs"] for r in rep.values()) == 100
    assert all(r["spanning_units"] == 0 for r in rep.values())
    assert sum(r["sum_doc_id"] for r in rep.values()) == sum(range(100))


def test_split_is_deterministic_and_seed_sensitive(spark):
    docs = _docs(spark, 200)
    clusters = _clusters(spark, [])
    a = {r["doc_id"]: r["split"]
         for r in leakage_free_split(docs, clusters, seed="s1").collect()}
    b = {r["doc_id"]: r["split"]
         for r in leakage_free_split(docs, clusters, seed="s1").collect()}
    c = {r["doc_id"]: r["split"]
         for r in leakage_free_split(docs, clusters, seed="s2").collect()}
    assert a == b
    assert a != c  # a different seed reshuffles
    assert 0 < sum(1 for v in a.values() if v == "val") < 200
