"""Round-12 breadth: the composed eval-decontamination report (planted
leakage attributed on every channel) and the containment 10× load twin
(replica accounting), plus the plan pins their docstrings claim."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dronedb_spark.plans.inspect import (
    has_broadcast_join,
    has_cartesian,
    physical_plan,
)
from dronedb_spark.tables import load


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


@pytest.fixture(scope="module")
def vecs(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


# ----------------------------------------- composed decontam report --


def test_report_attributes_planted_leakage(docs, vecs):
    """Every eval set must show leakage on every channel: the in-corpus
    eval items self-flag on n-gram and cosine, the planted excerpts
    flag on containment — and the union is at least each channel."""
    from dronedb_spark.text.decontamreport import decontam_report

    rows = decontam_report(docs, vecs).orderBy("set_id").collect()
    assert [r["set_id"] for r in rows] == [0, 1, 2]
    for r in rows:
        assert r["n_eval_docs"] > 0
        # eval members are corpus members → each self-flags via 4-grams
        assert r["n_ngram"] >= r["n_eval_docs"]
        # each eval member's planted excerpt is ≥80% contained in it
        assert r["n_contain"] > 0
        # each eval member's own vector sits at cos 1.0 ≥ 0.99
        assert r["n_cosine"] >= r["n_eval_docs"]
        assert r["n_any"] >= max(r["n_ngram"], r["n_contain"], r["n_cosine"])


def test_excerpts_flag_their_hosts_set(docs):
    """The planted excerpt of eval item d lands in d's OWN eval set on
    the containment channel — per-set attribution, not a global flag."""
    from dronedb_spark.text.decontamreport import (
        EXCERPT_OFFSET,
        containment_flags,
        eval_members,
        training_corpus,
    )

    bench = eval_members(docs)
    flags = containment_flags(training_corpus(docs), bench)
    sets = {r["doc_id"]: r["set_id"] for r in bench.collect()}
    excerpt_rows = [
        r
        for r in flags.collect()
        if r["item_id"] >= EXCERPT_OFFSET
        and (r["item_id"] - EXCERPT_OFFSET) in sets
    ]
    assert excerpt_rows
    assert any(
        sets[r["item_id"] - EXCERPT_OFFSET] == r["set_id"]
        for r in excerpt_rows
    )


def test_ngram_channel_broadcasts_the_bench_side(docs):
    """The corpus never shuffles before its per-item distinct: the
    bench-gram join is a broadcast hash join, and nothing in the
    channel is a cartesian product."""
    from dronedb_spark.text.decontamreport import (
        eval_members,
        ngram_flags,
        training_corpus,
    )

    q = ngram_flags(training_corpus(docs), eval_members(docs))
    assert has_broadcast_join(q)
    assert not has_cartesian(q)


def test_cosine_channel_is_one_arrow_pass(docs, vecs):
    """The cosine channel is mapInPandas over the vector table — no
    join of any kind in its plan (the eval matrices ride in the
    closure)."""
    from dronedb_spark.text.decontamreport import _set_col, cosine_flags

    ev = vecs.filter(F.col("vec_id") % 17 == 3).select(
        _set_col("vec_id").alias("set_id"), "embedding"
    )
    plan = physical_plan(cosine_flags(vecs, ev))
    assert "MapInPandas" in plan
    assert "Join" not in plan


# ------------------------------------------- containment 10x twin --


def test_inflated_corpus_shape(docs):
    from dronedb_spark.text.containment import _INFLATE, _inflated_corpus

    small = docs.limit(30)
    base = small.count() + small.filter(F.col("doc_id") % 10 == 0).count()
    assert _inflated_corpus(small).count() == base * _INFLATE


def test_10x_twin_replica_accounting(spark, sf_dir):
    """Every source replica band reports pairs; same-base-document
    replica hits dominate (each replica is 100%-contained in its 9
    siblings) and the planted excerpt→host hits survive inflation."""
    from dronedb_spark.text.containment import (
        q_containment_subset_pairs_10x,
    )

    rows = q_containment_subset_pairs_10x(spark, sf_dir).collect()
    assert len(rows) == 10
    for r in rows:
        assert r["n_pairs"] >= r["n_replica_self"] > 0
        assert r["n_excerpt_hits"] > 0
        assert r["sum_contain_micro"] > 0
    # replication is symmetric: every replica band sees the same counts
    assert len({r["n_pairs"] for r in rows}) == 1


def test_10x_twin_no_corpus_cartesian(spark, sf_dir):
    """The only cross join in the plan is the deliberate 10-row replica
    broadcast; the pair join itself is an equi-join on the shingle key,
    never a corpus×corpus product."""
    from dronedb_spark.text.containment import (
        _inflated_corpus,
        containment_pairs,
    )

    import re

    plan = physical_plan(
        containment_pairs(_inflated_corpus(load(spark, sf_dir, "documents")))
    )
    assert "CartesianProduct" not in plan
    # pair join is an equi-join keyed on the shingle column
    assert re.search(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[s#", plan
    )
    # the only cross joins are the 10-row replica broadcasts
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "Cross" in line
    assert "k#" in plan  # the replica dimension really is in the plan


# --------------------------------- milestone-3 ops: law tests --------


def test_multiclass_f1_conservation(spark, sf_dir):
    """Support conservation: Σ n_true = Σ n_pred = corpus size, every
    class row satisfies tp ≤ min(n_true, n_pred) and 0 ≤ f1 ≤ 1."""
    from dronedb_spark.text.mclasseval import q_multiclass_f1_report

    rows = q_multiclass_f1_report(spark, sf_dir).collect()
    n = load(spark, sf_dir, "documents").count()
    assert sum(r["n_true"] for r in rows) == n
    assert sum(r["n_pred"] for r in rows) == n
    for r in rows:
        assert 0 <= r["tp"] <= min(r["n_true"], r["n_pred"])
        assert r["fp"] == r["n_pred"] - r["tp"]
        assert r["fn"] == r["n_true"] - r["tp"]
        assert 0 <= r["f1_num"] <= r["f1_den"]


def test_removal_plan_conservation(spark, sf_dir):
    """n_flagged + n_kept = n_corpus; exclusive-channel counts + multi
    = n_flagged; char masses conserve; the planted excerpts guarantee
    flagged mass exists."""
    from dronedb_spark.text.decontamreport import removal_plan

    r = removal_plan(
        load(spark, sf_dir, "documents"), load(spark, sf_dir, "embeddings")
    ).collect()[0]
    assert r["n_flagged"] + r["n_kept"] == r["n_corpus"]
    assert (
        r["n_only_ngram"]
        + r["n_only_contain"]
        + r["n_only_cosine"]
        + r["n_multi"]
        == r["n_flagged"]
    )
    assert r["n_flagged"] > 0 and r["n_multi"] > 0
    assert r["chars_removed"] > 0 and r["chars_kept"] > 0
