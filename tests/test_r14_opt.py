"""Round-14 optimization-round pins: grain guards, robustness fixes
(ADVICE r13) and equivalence pins for the rewritten operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------- btrank


def _games(spark, rows):
    return spark.createDataFrame(
        rows, "s1 string, s2 string, n_games bigint, w1 bigint"
    )


def test_bradley_terry_over_cap_raises(spark, monkeypatch):
    from dronedb_spark.text import btrank

    games = _games(
        spark,
        [("a", "b", 3, 2), ("b", "c", 2, 1), ("c", "d", 4, 2), ("a", "d", 1, 1)],
    )
    monkeypatch.setattr(btrank, "MAX_PLAYERS", 3)
    with pytest.raises(ValueError, match="model-state cap"):
        btrank.bradley_terry(games, n_iter=1)


def test_bradley_terry_derives_id_type_from_input(spark):
    from dronedb_spark.text.btrank import bradley_terry

    games = spark.createDataFrame(
        [(1, 2, 3, 2), (2, 3, 2, 1)],
        "s1 bigint, s2 bigint, n_games bigint, w1 bigint",
    )
    out = bradley_terry(games, n_iter=1)
    assert out.schema["i"].dataType.simpleString() == "bigint"
    rows = out.collect()
    assert {r["i"] for r in rows} == {1, 2, 3}  # joins matched, none dropped


# -------------------------------------------------------------- linkgraph


def test_hits_null_weight_total_degrades_to_null_scores(spark):
    """A NULL normalization total (all-NULL weights) must degrade to NULL
    scores like the pre-r13 column-based DIV did, not raise a parse
    error from a ``DIV None`` literal (ADVICE r13)."""
    from dronedb_spark.text.linkgraph import hits_over_edges

    edges = spark.createDataFrame(
        [("a", "b", None), ("b", "a", None)], "src string, dst string, w bigint"
    )
    rows = hits_over_edges(edges, n_iter=1).collect()
    assert len(rows) == 2
    assert all(r["hub"] is None and r["authority"] is None for r in rows)


# --------------------------------------------------------- decontamreport


def test_containment_dst_pred_matches_eval_members(spark):
    """containment_flags derives eval membership from an id predicate;
    it must select exactly the ids eval_members() selects, over a corpus
    that includes planted-excerpt ids (ADVICE r13)."""
    from dronedb_spark.text.decontamreport import (
        EVAL_EVERY,
        EVAL_OFFSET,
        EXCERPT_OFFSET,
        eval_members,
        training_corpus,
    )

    docs = spark.createDataFrame(
        [(i, f"t {i}") for i in range(0, 120)], "doc_id bigint, text string"
    )
    corpus = training_corpus(docs)
    pred = f"doc_id % {EVAL_EVERY} = {EVAL_OFFSET} AND doc_id < {EXCERPT_OFFSET}"
    via_pred = {
        r["doc_id"] for r in corpus.filter(F.expr(pred)).collect()
    }
    via_members = {r["doc_id"] for r in eval_members(docs).collect()}
    assert via_pred == via_members


# ----------------------------------------------------------------- packing


def test_pack_sequences_total_equals_max_span_end(spark):
    """The corpus token total used for the short-last-chunk fill is now
    SUM(n_tok); pin its equivalence to the old MAX(start + n_tok) on a
    scrambled input."""
    import random

    from dronedb_spark.text.packing import doc_spans, pack_sequences

    rng = random.Random(11)
    docs = spark.createDataFrame(
        [(i, " ".join("w" * 1 for _ in range(rng.randint(1, 9))))
         for i in range(200)],
        "doc_id bigint, text string",
    ).repartition(7)
    spans = doc_spans(docs).collect()
    max_end = max(r["start"] + r["n_tok"] for r in spans)
    total = sum(r["n_tok"] for r in spans)
    assert max_end == total
    # and the packed roster's short last chunk reflects that total
    out = pack_sequences(docs, 64).collect()
    assert sum(r["n_tokens"] for r in out) == total
