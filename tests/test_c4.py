"""C4 line/page rule laws on hand-built pages + the zero-shuffle plan pin."""

from __future__ import annotations

from dronedb_spark.text.c4 import MIN_KEPT_LINES, c4_line_clean


def _clean_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return c4_line_clean(df).collect()[0]


def test_line_rules(spark):
    page = "\n".join(
        [
            "A perfectly fine sentence with many words.",  # kept
            "Too short.",                                  # < 3 words
            "No terminal punctuation at all here",         # no punct
            "Please enable JavaScript to view this page.",  # nag
            'He said "stop right there."',                 # kept (period)
            "Is this a question with enough words?",       # kept
            "Quoted ending works fine indeed.\"",          # kept (end quote)
            "Exclaimed loudly with plenty of words!",      # kept
        ]
    )
    r = _clean_one(spark, page)
    assert r["n_lines_total"] == 8
    assert r["n_lines_kept"] == 5
    assert r["keep_page"] is True
    assert "JavaScript" not in r["cleaned_text"]
    assert "Too short." not in r["cleaned_text"]


def test_page_rules(spark):
    good_lines = "\n".join(
        [f"This is retained sentence number {i} with words." for i in range(MIN_KEPT_LINES)]
    )
    assert _clean_one(spark, good_lines)["keep_page"] is True
    # lorem ipsum anywhere kills the page even if lines are fine
    assert _clean_one(spark, good_lines + "\nSome lorem ipsum filler text here.")[
        "keep_page"
    ] is False
    # a curly brace anywhere kills the page
    assert _clean_one(spark, good_lines + "\nfunction f() { return 1; }")[
        "keep_page"
    ] is False
    # one kept line below the minimum kills the page
    few = "\n".join(
        [f"This is retained sentence number {i} with words." for i in range(MIN_KEPT_LINES - 1)]
    )
    assert _clean_one(spark, few)["keep_page"] is False


def test_zero_shuffle_plan(spark, sf_dir):
    from dronedb_spark.plans.inspect import physical_plan
    from dronedb_spark.tables import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    p = physical_plan(c4_line_clean(docs))
    assert "Exchange" not in p, p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, p
