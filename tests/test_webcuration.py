"""Composition law: boilerplate that passes the C4 page gate survives
exactly once corpus-wide after the line dedup; the javascript nag and
poisoned pages never reach the dedup stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.text.c4 import c4_line_clean
from dronedb_spark.text.paradedup import paragraph_dedup_rewrite
from dronedb_spark.text.webcuration import _SUB, web_curation_rollup


def _pages(spark):
    body = "many words in this body sentence make it pass easily"
    rows = []
    for i in range(6):
        lines = [
            f"{body} number {i}.",
            _SUB,
            "Please enable javascript to continue browsing.",
            f"another fine body sentence for page {i}!",
            f"a third retained sentence on page {i}?",
            f"and a fourth closing sentence for page {i}.",
        ]
        if i == 5:
            lines.append("lorem ipsum dolor sit amet.")
        rows.append((i, "srcA" if i % 2 == 0 else "srcB", "\n".join(lines)))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_boilerplate_survives_exactly_once(spark):
    pages = _pages(spark)
    c = c4_line_clean(pages)
    kept = c.filter(F.col("keep_page")).select("doc_id", "cleaned_text")
    final = paragraph_dedup_rewrite(kept, text_col="cleaned_text", sep="\n")
    texts = [r["cleaned_text"] for r in final.collect()]
    assert sum(t.count(_SUB) for t in texts) == 1
    assert all("javascript" not in t for t in texts)


def test_rollup_accounts_poisoned_pages(spark):
    out = {r["source"]: r for r in web_curation_rollup(_pages(spark)).collect()}
    # doc 5 (srcB) carries lorem -> page dropped, contributes no lines
    assert out["srcB"]["n_pages"] == 3 and out["srcB"]["n_pages_kept"] == 2
    assert out["srcA"]["n_pages_kept"] == 3
    # every kept page retains 5 lines (4 bodies + _SUB); dups = later _SUB copies
    total_kept = out["srcA"]["n_lines_kept"] + out["srcB"]["n_lines_kept"]
    total_dups = out["srcA"]["n_dup_lines"] + out["srcB"]["n_dup_lines"]
    assert total_kept == 25 and total_dups == 4
