"""Paragraph-level exact dedup with keep-first rewrite (the Dolma
toolkit's paragraph dedup, Soldaini et al. 2024 — there via a Bloom
filter, here exact and deterministic): boilerplate that repeats across
pages (footers, nav bars, subscription nags, license blocks) is removed
at PARAGRAPH granularity while each paragraph's first occurrence
corpus-wide survives, so no content is lost — only repetition.

Complements the neighbors: ``segdedup`` windows are fixed 8-word tiles
(they straddle paragraph boundaries), ``substring`` finds >=k-token
spans at any offset (heavier machinery), and doc-level exact dedup
misses pages that differ only in body.  Paragraph dedup is the cheap
middle: one shuffle, exact.

Beyond the reference (no text pipeline there).  Scale design:

  * paragraphs explode as a narrow projection (split on blank lines);
  * the dedup decision is ONE window over ``partitionBy(para)`` —
    first occurrence = min (doc_id, pos) struct; the single exchange
    carries each paragraph's bytes exactly once (the same shape as
    exact doc dedup, one granularity down);
  * the rewrite re-aggregates by doc_id — a second exchange on the
    compact (doc_id, kept paragraph) rows — and re-joins with the
    paragraph separator, preserving original order;
  * no driver-side state, no Python in the data path.

The driver check derives deterministic multi-paragraph pages from the
flat ``documents`` fixture — two unique body slices per doc plus a
footer shared by every third doc, a nav block shared by the even half,
and an exact paragraph planted in every 25th doc — and verifies page
totals, duplicate counts and rewritten char mass against the DuckDB
window oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

PARA_SEP = "\n\n"


def paragraph_occurrences(
    docs: DataFrame, text_col: str = "text", sep: str = PARA_SEP
) -> DataFrame:
    """(doc_id, pos, para, is_first): every non-blank paragraph with its
    keep-first verdict — first occurrence = smallest (doc_id, pos).
    ``sep="\\n"`` gives line-level dedup (the Dolma paragraph notion —
    its documents delimit paragraphs by single newlines)."""
    paras = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(text_col, sep)).alias("pos", "para"),
        )
        .filter(F.trim("para") != "")
    )
    w = Window.partitionBy("para")
    first = F.min(F.struct("doc_id", "pos")).over(w)
    return paras.withColumn(
        "is_first",
        (F.col("doc_id") == first["doc_id"]) & (F.col("pos") == first["pos"]),
    )


def paragraph_dedup_rewrite(
    docs: DataFrame, text_col: str = "text", sep: str = PARA_SEP
) -> DataFrame:
    """Per-doc rewrite: duplicate paragraphs removed, survivors re-joined
    in original order.  Docs whose every paragraph was seen earlier
    come back with an empty ``cleaned_text`` (row preserved)."""
    occ = paragraph_occurrences(docs, text_col, sep)
    return (
        occ.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_paras"),
            F.sum((~F.col("is_first")).cast("bigint")).alias("n_dup_paras"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("is_first"), F.struct("pos", "para"))
                        )
                    ),
                    lambda s: s["para"],
                ),
                sep,
            ).alias("cleaned_text"),
        )
    )


def _derived_pages(docs: DataFrame) -> DataFrame:
    sep = PARA_SEP
    page = F.concat(
        F.expr("substr(text, 1, 80)"), F.lit(sep),
        F.expr(
            "CASE doc_id % 3 WHEN 0 THEN 'Subscribe to our newsletter for updates.' "
            "WHEN 1 THEN 'All rights reserved by the site owner.' "
            "ELSE 'Follow us on social media today.' END"
        ),
        F.lit(sep),
        F.expr("substr(text, 81, 90)"), F.lit(sep),
        F.expr(
            "CASE WHEN doc_id % 2 = 0 THEN 'Home About Products Contact' "
            "ELSE substr(text, 171, 60) END"
        ),
        F.expr(
            f"CASE WHEN doc_id % 25 = 0 THEN '{sep}This exact paragraph appears "
            "in every twenty fifth document.' ELSE '' END"
        ),
    )
    return docs.select("doc_id", page.alias("text"))


# the derived-page text expression over (doc_id, text) — shared by the
# batch check, the 10x twin, and the incremental store/batch split
_PAGE_EXPR = """substr(text, 1, 80) || chr(10) || chr(10)
                   || CASE doc_id % 3
                        WHEN 0 THEN 'Subscribe to our newsletter for updates.'
                        WHEN 1 THEN 'All rights reserved by the site owner.'
                        ELSE 'Follow us on social media today.' END
                   || chr(10) || chr(10) || substr(text, 81, 90)
                   || chr(10) || chr(10)
                   || CASE WHEN doc_id % 2 = 0 THEN 'Home About Products Contact'
                           ELSE substr(text, 171, 60) END
                   || CASE WHEN doc_id % 25 = 0
                           THEN chr(10) || chr(10) || 'This exact paragraph appears in every twenty fifth document.'
                           ELSE '' END"""


def _derive_sql(src: str) -> str:
    return f"""
        WITH pages AS (
            SELECT doc_id, {_PAGE_EXPR} AS text
            FROM {src}),
        lists AS (
            SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l
            FROM pages),
        paras AS (
            SELECT doc_id, pos, l[pos] AS para
            FROM lists, LATERAL (SELECT unnest(range(1, len(l) + 1)) AS pos) p
            WHERE trim(l[pos]) <> ''),
        flagged AS (
            SELECT doc_id, pos, para,
                   ROW_NUMBER() OVER (PARTITION BY para ORDER BY doc_id, pos) = 1
                       AS is_first
            FROM paras)
"""


_ROLLUP_SQL = """
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_paras,
               CAST(SUM(CASE WHEN is_first THEN 0 ELSE 1 END) AS BIGINT)
                   AS n_dup_paras,
               CAST(length(COALESCE(
                   string_agg(CASE WHEN is_first THEN para END,
                              chr(10) || chr(10) ORDER BY pos),
                   '')) AS BIGINT) AS kept_chars
        FROM flagged GROUP BY doc_id ORDER BY doc_id"""


@check("paragraph_dedup", oracle=_derive_sql("documents") + _ROLLUP_SQL)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived boilerplate-laden pages through keep-first paragraph
    dedup: per-doc paragraph totals, duplicates removed, and the
    rewritten text's char mass."""
    docs = load(spark, sf_dir, "documents")
    out = paragraph_dedup_rewrite(_derived_pages(docs))
    return out.select(
        "doc_id",
        "n_paras",
        "n_dup_paras",
        F.length("cleaned_text").cast("bigint").alias("kept_chars"),
    ).orderBy("doc_id")


def _inflated_src() -> str:
    from dronedb_spark.text.segdedup import _INFLATE, _INFLATE_STRIDE

    return f"""(
            SELECT doc_id + k.k * {_INFLATE_STRIDE} AS doc_id, text
            FROM documents, (SELECT unnest(range(0, {_INFLATE})) AS k) k) corpus"""


@check("paragraph_dedup_10x", oracle=_derive_sql(_inflated_src()) + _ROLLUP_SQL)
def q_paragraph_dedup_10x(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10× inflated corpus through the same pipeline — every body
    paragraph now repeats across the 10 strided copies (parity and mod
    classes shift with the stride, so the page MIX changes too), the
    worst-case duplicate mass.  Kept sublinear by the same one-window
    shape."""
    from dronedb_spark.text.segdedup import inflated_documents

    docs = inflated_documents(load(spark, sf_dir, "documents"))
    out = paragraph_dedup_rewrite(_derived_pages(docs))
    return out.select(
        "doc_id",
        "n_paras",
        "n_dup_paras",
        F.length("cleaned_text").cast("bigint").alias("kept_chars"),
    ).orderBy("doc_id")


# ------------------------------------------- incremental store/probe ----


def paragraph_store(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The persisted corpus paragraph index: DISTINCT md5(paragraph)
    rows — what the daily pipeline writes once per ingested batch and
    keeps bucketed by hash on disk, so tomorrow's probe joins without
    reshuffling (or even reading) yesterday's text."""
    return (
        docs.select(F.explode(F.split(text_col, PARA_SEP)).alias("para"))
        .filter(F.trim("para") != "")
        .select(F.md5("para").alias("phash"))
        .distinct()
    )


def incremental_paragraph_dedup(
    batch: DataFrame, store: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Dedup a NEW batch against the persisted paragraph store AND
    within itself (keep-first): per batch doc, how many paragraphs were
    already indexed (``n_store_dups``), how many repeat earlier batch
    paragraphs (``n_batch_dups``), and the surviving char mass.

    Scale shape: only the batch's paragraphs hash and probe; the store
    side of the hash equi-join is pre-bucketed and never reshuffles.
    A paragraph both in the store and repeated in the batch counts as
    a store dup (the store verdict wins)."""
    occ = paragraph_occurrences(batch, text_col).withColumn(
        "phash", F.md5("para")
    )
    marked = occ.join(
        store.withColumn("in_store", F.lit(True)), "phash", "left"
    ).withColumn("in_store", F.col("in_store").isNotNull())
    keep = (~F.col("in_store")) & F.col("is_first")
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_paras"),
            F.sum(F.col("in_store").cast("bigint")).alias("n_store_dups"),
            F.sum(((~F.col("in_store")) & (~F.col("is_first"))).cast("bigint"))
            .alias("n_batch_dups"),
            F.length(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(keep, F.struct("pos", "para"))
                            )
                        ),
                        lambda s: s["para"],
                    ),
                    PARA_SEP,
                )
            ).cast("bigint").alias("kept_chars"),
        )
    )


@check(
    "paragraph_dedup_incremental",
    oracle=f"""
        WITH store_pages AS (
            SELECT doc_id, {_PAGE_EXPR} AS text
            FROM documents WHERE doc_id % 3 <> 0),
        batch_pages AS (
            SELECT doc_id, {_PAGE_EXPR} AS text
            FROM documents WHERE doc_id % 3 = 0),
        store AS (
            SELECT DISTINCT md5(l[pos]) AS phash
            FROM (SELECT string_split(text, chr(10) || chr(10)) AS l
                  FROM store_pages) s,
                 LATERAL (SELECT unnest(range(1, len(l) + 1)) AS pos) p
            WHERE trim(l[pos]) <> ''),
        bparas AS (
            SELECT doc_id, pos, l[pos] AS para
            FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l
                  FROM batch_pages) b,
                 LATERAL (SELECT unnest(range(1, len(l) + 1)) AS pos) p
            WHERE trim(l[pos]) <> ''),
        flagged AS (
            SELECT doc_id, pos, para,
                   ROW_NUMBER() OVER (PARTITION BY para
                       ORDER BY doc_id, pos) = 1 AS is_first,
                   md5(para) IN (SELECT phash FROM store) AS in_store
            FROM bparas)
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_paras,
               CAST(SUM(CASE WHEN in_store THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_store_dups,
               CAST(SUM(CASE WHEN NOT in_store AND NOT is_first
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_batch_dups,
               CAST(length(COALESCE(
                   string_agg(CASE WHEN NOT in_store AND is_first
                                   THEN para END,
                              chr(10) || chr(10) ORDER BY pos),
                   '')) AS BIGINT) AS kept_chars
        FROM flagged GROUP BY doc_id ORDER BY doc_id""",
)
def q_paragraph_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Store = derived pages of doc_id % 3 != 0; batch = the rest.  The
    batch's shared footers/nav blocks must register as STORE dups, its
    internal repeats as BATCH dups, and unique body slices survive."""
    docs = load(spark, sf_dir, "documents")
    pages = _derived_pages(docs)
    store = paragraph_store(pages.filter(F.col("doc_id") % 3 != 0))
    batch = pages.filter(F.col("doc_id") % 3 == 0)
    return incremental_paragraph_dedup(batch, store).orderBy("doc_id")
