"""Web-page curation, composed end to end the way a crawl-to-corpus
run chains this round's stages: C4 line/page rules
(``text/c4.py``) gate each page, then the survivors' retained lines
pass CROSS-CORPUS keep-first dedup (``text/paradedup.py`` with
``sep="\\n"`` — the Dolma line-as-paragraph notion), so boilerplate
that survives the per-page rules (subscription nags, copyright
footers) still dies corpus-wide while its first occurrence is kept.

One driver row pins the COMPOSITION per source — pages in/kept, lines
retained by C4, duplicate lines removed, final char mass — each stage
is already pinned alone.  Scale shape: the C4 gate is the zero-shuffle
projection it always is; the dedup window and the per-source rollup
are the only exchanges (line bytes move once).

The derivation gives every doc punctuated body sentences (so C4 keeps
them), two shared boilerplate lines (one on every page, one on the
even half), a javascript nag (C4 drops it), and lorem/brace page
poisons on doc_id mod 17 / 13.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load
from dronedb_spark.text.c4 import MIN_KEPT_LINES, MIN_WORDS, c4_line_clean
from dronedb_spark.text.paradedup import paragraph_dedup_rewrite

_NL = "\n"

_SUB = "Subscribe to our newsletter for updates today."
_CPR = "All content copyright the site owner."
_JS = "Please enable javascript to continue browsing."


def _derived_pages(docs: DataFrame) -> DataFrame:
    page = F.concat(
        F.expr("substr(text, 1, 60)"), F.lit("." + _NL),
        F.lit(_SUB + _NL),
        F.lit(_JS + _NL),
        F.expr("substr(text, 61, 70)"), F.lit("!" + _NL),
        F.expr(
            f"CASE WHEN doc_id % 2 = 0 THEN '{_CPR}' "
            "ELSE substr(text, 131, 50) || '?' END"
        ),
        F.lit(_NL),
        F.expr("substr(text, 181, 40)"), F.lit("."),
        F.expr(
            f"CASE WHEN doc_id % 17 = 0 THEN '{_NL}lorem ipsum dolor sit amet.' "
            "ELSE '' END"
        ),
        F.expr(
            f"CASE WHEN doc_id % 13 = 0 THEN '{_NL}if (x) {{ run(); }}' ELSE '' END"
        ),
    )
    return docs.select("doc_id", "source", page.alias("text"))


def web_curation_rollup(pages: DataFrame) -> DataFrame:
    """pages(doc_id, source, text) → per-source accounting of the C4
    gate + corpus-wide line dedup composition."""
    from dronedb_spark.tables import barrier_persist

    # the C4 gate feeds both the dedup input and the verdict side —
    # materialize it once (r13; the line-filter HOFs re-ran per branch)
    c = barrier_persist(c4_line_clean(pages))
    kept_pages = c.filter(F.col("keep_page")).select("doc_id", "cleaned_text")
    deduped = paragraph_dedup_rewrite(kept_pages, text_col="cleaned_text", sep=_NL)
    verdicts = c.select("doc_id", "source", "keep_page")
    j = verdicts.join(deduped, "doc_id", "left")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pages"),
        F.sum(F.col("keep_page").cast("bigint")).alias("n_pages_kept"),
        F.sum(F.coalesce("n_paras", F.lit(0))).cast("bigint").alias("n_lines_kept"),
        F.sum(F.coalesce("n_dup_paras", F.lit(0)))
        .cast("bigint")
        .alias("n_dup_lines"),
        F.sum(F.coalesce(F.length("cleaned_text"), F.lit(0)))
        .cast("bigint")
        .alias("final_chars"),
    )


_LINE_KEEP_SQL = (
    "l -> right(trim(l), 1) IN ('.', '!', '?', '\"') "
    f"AND len(list_filter(string_split(trim(l), ' '), w -> w <> '')) >= {MIN_WORDS} "
    "AND NOT contains(lower(l), 'javascript')"
)


@check(
    "web_curation_rollup",
    oracle=f"""
        WITH pages AS (
            SELECT doc_id, source,
                   substr(text, 1, 60) || '.' || chr(10)
                   || '{_SUB}' || chr(10)
                   || '{_JS}' || chr(10)
                   || substr(text, 61, 70) || '!' || chr(10)
                   || CASE WHEN doc_id % 2 = 0 THEN '{_CPR}'
                           ELSE substr(text, 131, 50) || '?' END || chr(10)
                   || substr(text, 181, 40) || '.'
                   || CASE WHEN doc_id % 17 = 0
                           THEN chr(10) || 'lorem ipsum dolor sit amet.'
                           ELSE '' END
                   || CASE WHEN doc_id % 13 = 0
                           THEN chr(10) || 'if (x) {{ run(); }}' ELSE '' END
                   AS text
            FROM documents),
        cleaned AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, chr(10)),
                               {_LINE_KEEP_SQL}) AS kept,
                   contains(lower(text), 'lorem ipsum') AS has_lorem,
                   contains(text, '{{') AS has_brace
            FROM pages),
        verd AS (
            SELECT *,
                   (NOT has_lorem AND NOT has_brace
                    AND len(kept) >= {MIN_KEPT_LINES}) AS keep_page
            FROM cleaned),
        lines AS (
            SELECT doc_id, source, pos, kept[pos] AS line
            FROM verd, LATERAL (SELECT unnest(range(1, len(kept) + 1)) AS pos) p
            WHERE keep_page AND trim(kept[pos]) <> ''),
        flagged AS (
            SELECT doc_id, source, pos, line,
                   ROW_NUMBER() OVER (PARTITION BY line
                       ORDER BY doc_id, pos) = 1 AS is_first
            FROM lines),
        perdoc AS (
            SELECT doc_id,
                   COUNT(*) AS n_lines,
                   SUM(CASE WHEN is_first THEN 0 ELSE 1 END) AS n_dups,
                   length(COALESCE(
                       string_agg(CASE WHEN is_first THEN line END,
                                  chr(10) ORDER BY pos), '')) AS kept_chars
            FROM flagged GROUP BY doc_id)
        SELECT v.source,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(SUM(CASE WHEN v.keep_page THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pages_kept,
               CAST(SUM(COALESCE(p.n_lines, 0)) AS BIGINT) AS n_lines_kept,
               CAST(SUM(COALESCE(p.n_dups, 0)) AS BIGINT) AS n_dup_lines,
               CAST(SUM(COALESCE(p.kept_chars, 0)) AS BIGINT) AS final_chars
        FROM verd v LEFT JOIN perdoc p USING (doc_id)
        GROUP BY v.source ORDER BY v.source""",
)
def q_web_curation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived punctuated pages through C4 → corpus line dedup: the
    shared subscription line must survive exactly once corpus-wide,
    the javascript nag must never reach the dedup stage, and poisoned
    pages must not contribute lines at all."""
    docs = load(spark, sf_dir, "documents")
    return web_curation_rollup(_derived_pages(docs)).orderBy("source")


@check(
    "web_curation_rollup_10x",
    oracle=f"""
        WITH pages AS (
            SELECT doc_id, source,
                   substr(text, 1, 60) || '.' || chr(10)
                   || '{_SUB}' || chr(10)
                   || '{_JS}' || chr(10)
                   || substr(text, 61, 70) || '!' || chr(10)
                   || CASE WHEN doc_id % 2 = 0 THEN '{_CPR}'
                           ELSE substr(text, 131, 50) || '?' END || chr(10)
                   || substr(text, 181, 40) || '.'
                   || CASE WHEN doc_id % 17 = 0
                           THEN chr(10) || 'lorem ipsum dolor sit amet.'
                           ELSE '' END
                   || CASE WHEN doc_id % 13 = 0
                           THEN chr(10) || 'if (x) {{ run(); }}' ELSE '' END
                   AS text
            FROM (
                SELECT doc_id + k.k * 10000000 AS doc_id, source, text
                FROM documents, (SELECT unnest(range(0, 10)) AS k) k) corpus),
        cleaned AS (
            SELECT doc_id, source,
                   list_filter(string_split(text, chr(10)),
                               {_LINE_KEEP_SQL}) AS kept,
                   contains(lower(text), 'lorem ipsum') AS has_lorem,
                   contains(text, '{{') AS has_brace
            FROM pages),
        verd AS (
            SELECT *,
                   (NOT has_lorem AND NOT has_brace
                    AND len(kept) >= {MIN_KEPT_LINES}) AS keep_page
            FROM cleaned),
        lines AS (
            SELECT doc_id, source, pos, kept[pos] AS line
            FROM verd, LATERAL (SELECT unnest(range(1, len(kept) + 1)) AS pos) p
            WHERE keep_page AND trim(kept[pos]) <> ''),
        flagged AS (
            SELECT doc_id, source, pos, line,
                   ROW_NUMBER() OVER (PARTITION BY line
                       ORDER BY doc_id, pos) = 1 AS is_first
            FROM lines),
        perdoc AS (
            SELECT doc_id,
                   COUNT(*) AS n_lines,
                   SUM(CASE WHEN is_first THEN 0 ELSE 1 END) AS n_dups,
                   length(COALESCE(
                       string_agg(CASE WHEN is_first THEN line END,
                                  chr(10) ORDER BY pos), '')) AS kept_chars
            FROM flagged GROUP BY doc_id)
        SELECT v.source,
               CAST(COUNT(*) AS BIGINT) AS n_pages,
               CAST(SUM(CASE WHEN v.keep_page THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_pages_kept,
               CAST(SUM(COALESCE(p.n_lines, 0)) AS BIGINT) AS n_lines_kept,
               CAST(SUM(COALESCE(p.n_dups, 0)) AS BIGINT) AS n_dup_lines,
               CAST(SUM(COALESCE(p.kept_chars, 0)) AS BIGINT) AS final_chars
        FROM verd v LEFT JOIN perdoc p USING (doc_id)
        GROUP BY v.source ORDER BY v.source""",
)
def q_web_curation_rollup_10x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition at 10× page mass: every body line becomes a
    10-way corpus duplicate (the strided copies change NOTHING about a
    page's own C4 verdict but multiply the dedup window's duplicate
    mass) — the two pinned exchanges must absorb it."""
    from dronedb_spark.tables import load
    from dronedb_spark.text.segdedup import inflated_documents

    docs = load(spark, sf_dir, "documents")
    # the fixture assigns source = 'src' || (doc_id % 20); re-derive it
    # on the strided copies instead of joining the base table back
    big = inflated_documents(docs).withColumn(
        "source", F.expr("'src' || CAST((doc_id % 10000000) % 20 AS STRING)")
    )
    return web_curation_rollup(_derived_pages(big)).orderBy("source")
