"""Paragraph dedup laws: keep-first, order-preserving rewrite,
all-duplicate docs, and the two-exchange plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.paradedup import (
    paragraph_dedup_rewrite,
    paragraph_occurrences,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_keep_first_across_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha unique one\n\nshared footer text\n\nbody of doc one"),
            (2, "beta unique two\n\nshared footer text"),
            (3, "shared footer text\n\ngamma unique three"),
        ],
    )
    occ = {
        (r["doc_id"], r["pos"]): r["is_first"]
        for r in paragraph_occurrences(docs).collect()
    }
    # footer first occurs in doc 1 pos 1; later occurrences are dups
    assert occ[(1, 1)] is True
    assert occ[(2, 1)] is False
    assert occ[(3, 0)] is False
    # uniques all survive
    assert occ[(1, 0)] and occ[(1, 2)] and occ[(2, 0)] and occ[(3, 1)]


def test_rewrite_preserves_order_and_separator(spark):
    docs = _docs(
        spark,
        [
            (1, "first para here\n\nsecond para here\n\nthird para here"),
            (2, "second para here\n\nnew tail paragraph"),
        ],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup_rewrite(docs).collect()}
    assert out[1]["cleaned_text"] == (
        "first para here\n\nsecond para here\n\nthird para here"
    )
    assert out[2]["cleaned_text"] == "new tail paragraph"
    assert out[2]["n_dup_paras"] == 1


def test_all_duplicate_doc_yields_empty_text(spark):
    docs = _docs(
        spark,
        [
            (1, "only paragraph there is"),
            (2, "only paragraph there is"),
        ],
    )
    out = {r["doc_id"]: r for r in paragraph_dedup_rewrite(docs).collect()}
    assert out[2]["cleaned_text"] == "" and out[2]["n_dup_paras"] == 1
    assert out[1]["cleaned_text"] == "only paragraph there is"


def test_blank_paragraphs_ignored(spark):
    docs = _docs(spark, [(1, "real content paragraph\n\n\n\n  \n\nmore content")])
    out = paragraph_dedup_rewrite(docs).collect()[0]
    assert out["n_paras"] == 2
    assert out["cleaned_text"] == "real content paragraph\n\nmore content"


def test_two_exchange_plan(spark, sf_dir):
    from dronedb_spark.plans.inspect import physical_plan
    from dronedb_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    p = physical_plan(paragraph_dedup_rewrite(docs))
    # one exchange for the paragraph window, one for the doc_id regroup
    assert p.count("Exchange hashpartitioning") == 2, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p


def test_incremental_store_verdict_wins(spark):
    from dronedb_spark.text.paradedup import (
        incremental_paragraph_dedup,
        paragraph_store,
    )

    store_docs = _docs(spark, [(1, "indexed paragraph one\n\nindexed paragraph two")])
    store = paragraph_store(store_docs)
    batch = _docs(
        spark,
        [
            # store dup + fresh + internal repeat of the fresh one
            (10, "indexed paragraph one\n\nfresh content here"),
            (11, "fresh content here\n\nindexed paragraph two\n\nanother new one"),
        ],
    )
    out = {r["doc_id"]: r for r in incremental_paragraph_dedup(batch, store).collect()}
    assert (out[10]["n_store_dups"], out[10]["n_batch_dups"]) == (1, 0)
    assert out[10]["kept_chars"] == len("fresh content here")
    # doc 11: "fresh content here" repeats doc 10's (batch dup),
    # "indexed paragraph two" is a store dup, "another new one" survives
    assert (out[11]["n_store_dups"], out[11]["n_batch_dups"]) == (1, 1)
    assert out[11]["kept_chars"] == len("another new one")


def test_incremental_store_dup_not_double_counted(spark):
    from dronedb_spark.text.paradedup import (
        incremental_paragraph_dedup,
        paragraph_store,
    )

    store = paragraph_store(_docs(spark, [(1, "shared everywhere")]))
    batch = _docs(spark, [(10, "shared everywhere"), (11, "shared everywhere")])
    out = {r["doc_id"]: r for r in incremental_paragraph_dedup(batch, store).collect()}
    # both occurrences are STORE dups (store verdict wins over batch rank)
    assert out[10]["n_store_dups"] == 1 and out[10]["n_batch_dups"] == 0
    assert out[11]["n_store_dups"] == 1 and out[11]["n_batch_dups"] == 0
    assert out[10]["kept_chars"] == 0 and out[11]["kept_chars"] == 0
