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
