"""C4-style line-level page cleaning (Raffel et al. 2020, the C4
corpus rules) — the first gate a crawled page passes in an LLM text
pipeline, before any dedup or model-based scoring:

  * a LINE is retained only if it ends in a terminal punctuation mark
    (period / exclamation / question mark / end quote), carries at
    least ``MIN_WORDS`` words, and does not mention "javascript"
    (boilerplate browser nags);
  * a PAGE is dropped outright if it contains "lorem ipsum" (template
    placeholder), a curly brace (leaked code/markup), or fewer than
    ``MIN_KEPT_LINES`` retained lines.  (C4 counts sentences; retained
    terminal-punctuation lines are the standard proxy when operating
    line-wise.)  C4's dirty-word page blocklist is a pluggable term
    list — the same shape as ``urls.host_blocklist`` — and is not
    hard-coded here.

Beyond the reference (no text pipeline there).  Scale design: the whole
operator is one narrow projection — ``split`` on newlines, a built-in
higher-order ``filter`` with JVM string predicates, ``array_join`` back
— zero Python, ZERO shuffles (plan-pinned in
``tests/test_c4.py``), so it composes with the scan and runs at full
read bandwidth on any corpus size.  The driver check derives
deterministic multi-line pages from the flat ``documents`` fixture (the
same derivation in the DuckDB oracle) and pushes them through the real
operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

MIN_WORDS = 3       # C4: "only retained lines that contained at least 3 words"
MIN_KEPT_LINES = 5  # C4: "discarded any page with fewer than 5 sentences"

# line predicate, shared by the operator and (dialect-translated) the
# oracle: terminal punctuation, >= MIN_WORDS words, no javascript nag
_LINE_KEEP = (
    "l -> right(trim(l), 1) IN ('.', '!', '?', '\"') "
    f"AND size(filter(split(trim(l), ' '), w -> w <> '')) >= {MIN_WORDS} "
    "AND NOT contains(lower(l), 'javascript')"
)


def c4_line_clean(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Apply the C4 line and page rules to newline-delimited pages.

    Adds ``kept_lines`` (array), ``cleaned_text`` (retained lines
    re-joined), ``n_lines_total`` / ``n_lines_kept``, the page flags
    ``has_lorem`` / ``has_brace``, and the final ``keep_page``.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.expr(f"filter(split({text_col}, '\\n'), {_LINE_KEEP})")
    return (
        pages.withColumn("kept_lines", kept)
        .withColumn("n_lines_total", F.size(lines).cast("bigint"))
        .withColumn("n_lines_kept", F.size("kept_lines").cast("bigint"))
        .withColumn("has_lorem", F.contains(F.lower(text_col), F.lit("lorem ipsum")))
        .withColumn("has_brace", F.contains(F.col(text_col), F.lit("{")))
        .withColumn(
            "keep_page",
            (~F.col("has_lorem"))
            & (~F.col("has_brace"))
            & (F.col("n_lines_kept") >= MIN_KEPT_LINES),
        )
        .withColumn("cleaned_text", F.array_join("kept_lines", "\n"))
    )


def _derived_pages(docs: DataFrame) -> DataFrame:
    """Deterministic multi-line pages from the flat documents fixture:
    a headline line, a too-short line, a javascript nag, a line whose
    terminal punctuation depends on doc_id parity, three punctuated
    body lines, and lorem/brace injections on doc_id mod 17 / 13."""
    line = "\n"
    page = F.concat(
        F.expr("substr(text, 1, 40)"), F.lit("." + line),
        F.lit("Short one." + line),
        F.lit("Please enable javascript to continue browsing." + line),
        F.expr("substr(text, 41, 60)"),
        F.expr("CASE WHEN doc_id % 2 = 0 THEN ' ok?' ELSE '' END"), F.lit(line),
        F.expr("substr(text, 101, 50)"), F.lit("!" + line),
        F.expr("substr(text, 151, 45)"), F.lit('."' + line),
        F.expr("substr(text, 196, 40)"), F.lit("."),
        F.expr(f"CASE WHEN doc_id % 17 = 0 THEN '{line}lorem ipsum dolor sit amet.' ELSE '' END"),
        F.expr(f"CASE WHEN doc_id % 13 = 0 THEN '{line}if (x) {{ run(); }}' ELSE '' END"),
    )
    return docs.select("doc_id", page.alias("text"))


@check(
    "c4_line_clean",
    oracle=f"""
        WITH pages AS (
            SELECT doc_id,
                   substr(text, 1, 40) || '.' || chr(10)
                   || 'Short one.' || chr(10)
                   || 'Please enable javascript to continue browsing.' || chr(10)
                   || substr(text, 41, 60)
                   || CASE WHEN doc_id % 2 = 0 THEN ' ok?' ELSE '' END || chr(10)
                   || substr(text, 101, 50) || '!' || chr(10)
                   || substr(text, 151, 45) || '."' || chr(10)
                   || substr(text, 196, 40) || '.'
                   || CASE WHEN doc_id % 17 = 0
                           THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
                   || CASE WHEN doc_id % 13 = 0
                           THEN chr(10) || 'if (x) {{ run(); }}' ELSE '' END
                   AS text
            FROM documents),
        cleaned AS (
            SELECT doc_id,
                   string_split(text, chr(10)) AS lines,
                   list_filter(string_split(text, chr(10)),
                       l -> right(trim(l), 1) IN ('.', '!', '?', '"')
                            AND len(list_filter(string_split(trim(l), ' '),
                                                w -> w <> '')) >= {MIN_WORDS}
                            AND NOT contains(lower(l), 'javascript')) AS kept,
                   contains(lower(text), 'lorem ipsum') AS has_lorem,
                   contains(text, '{{') AS has_brace
            FROM pages)
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines_total,
               CAST(len(kept) AS BIGINT) AS n_lines_kept,
               CAST(CASE WHEN NOT has_lorem AND NOT has_brace
                          AND len(kept) >= {MIN_KEPT_LINES}
                         THEN 1 ELSE 0 END AS BIGINT) AS keep_page,
               CAST(length(array_to_string(kept, chr(10))) AS BIGINT) AS kept_chars
        FROM cleaned ORDER BY doc_id""",
)
def q_c4_line_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived pages through the real C4 rules: per-page line totals,
    retained-line counts, the page verdict, and retained char mass."""
    docs = load(spark, sf_dir, "documents")
    out = c4_line_clean(_derived_pages(docs))
    return out.select(
        "doc_id",
        "n_lines_total",
        "n_lines_kept",
        F.col("keep_page").cast("bigint").alias("keep_page"),
        F.length("cleaned_text").cast("bigint").alias("kept_chars"),
    ).orderBy("doc_id")
