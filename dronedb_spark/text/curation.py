"""Composed corpus-curation policies — the steps that TIE the pipeline
primitives together the way published pipelines do:

  * ``ccnet_perplexity_buckets`` — CCNet (Wenzek et al. 2020) splits
    each language's documents into head/middle/tail TERCILES by LM
    perplexity and trains preferentially on the head.  Composition of
    the language-ID heuristic (``text/quality.py:lang_id``) and the
    unigram LM scorer (``text/lm.py``), with the tercile as pure
    integer rank arithmetic (3·(rank−1) // n) so both engines agree on
    every boundary document.
  * ``cluster_quality_keep`` — near-dup clusters keep their HIGHEST
    QUALITY member (most distinct tokens; ties to the smallest id),
    not the arbitrary min-id representative: the survivor-selection
    policy real dedup applies.  Argmax via the packed-MIN map-side
    aggregate (no window), over the connected-component labels from
    ``text/dedup.py:neardup_clusters``.

Scale shape: buckets are a per-language rank (few languages — the
quota-sampling caveat and its two-phase refinement apply verbatim at
extreme per-language volume); survivor selection is one
map-side-combinable groupBy(cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load


def ccnet_perplexity_buckets(docs: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, cross_entropy, ppl_bucket 0|1|2) — per
    predicted language, tercile by cross entropy ascending (bucket 0 =
    head = most fluent under the LM), boundaries by exact integer rank
    arithmetic."""
    from dronedb_spark.text.lm import doc_cross_entropy, train_unigram
    from dronedb_spark.text.quality import lang_id

    lm = train_unigram(docs.filter(F.col("doc_id") % 2 == 0))
    scored = doc_cross_entropy(docs, lm).select("doc_id", "cross_entropy")
    langs = lang_id(docs).select("doc_id", "lang_pred")
    j = scored.join(langs, "doc_id")
    w = Window.partitionBy("lang_pred").orderBy("cross_entropy", "doc_id")
    n = Window.partitionBy("lang_pred")
    staged = j.select(
        "doc_id",
        "lang_pred",
        F.round("cross_entropy", 9).alias("cross_entropy"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(n).alias("nl"),
    )
    # integer DIV for the boundary documents (the compact.py rule)
    return staged.select(
        "doc_id",
        "lang_pred",
        "cross_entropy",
        F.expr("CAST((3 * (rk - 1)) DIV nl AS INT)").alias("ppl_bucket"),
    )


def cluster_quality_keep(docs: DataFrame) -> DataFrame:
    """(cluster_id, n_members, keep_id, keep_distinct) per near-dup
    cluster: the survivor is the member with the most DISTINCT tokens
    (lexical-diversity quality), ties to the smallest doc_id — argmax
    as MIN over a packed '<999999−n_distinct><doc_id>' string, a
    map-side-combinable aggregate."""
    from dronedb_spark.text.dedup import neardup_clusters

    clusters = neardup_clusters(docs)
    quality = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", " "))).cast("bigint").alias("n_dis"),
    )
    packed = F.concat(
        F.lpad((F.lit(999999) - F.col("n_dis")).cast("string"), 6, "0"),
        F.lpad(F.col("doc_id").cast("string"), 9, "0"),
    )
    return (
        clusters.join(quality, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min(packed).alias("_p"),
        )
        .select(
            "cluster_id",
            "n_members",
            F.substring("_p", 7, 9).cast("bigint").alias("keep_id"),
            (F.lit(999999) - F.substring("_p", 1, 6).cast("bigint")).alias(
                "keep_distinct"
            ),
        )
    )


# ----------------------------------------------------------- checks --


def _ccnet_oracle() -> str:
    from dronedb_spark.text.quality import _STOP_DE, _STOP_EN, _STOP_ES

    return f"""
        WITH train_toks AS (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE doc_id % 2 = 0),
        lm AS (SELECT tok, COUNT(*) AS n FROM train_toks GROUP BY tok),
        totals AS (SELECT SUM(n) AS n_total, COUNT(*) AS v_total FROM lm),
        probs AS (
            SELECT tok, ln((n + 1.0) / (n_total + v_total + 1.0)) AS logp
            FROM lm, totals),
        score_toks AS (
            SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        scored AS (
            SELECT s.doc_id,
                   COALESCE(p.logp,
                       (SELECT ln(1.0 / (n_total + v_total + 1.0)) FROM totals)) AS lp
            FROM score_toks s LEFT JOIN probs p ON s.tok = p.tok),
        ce AS (
            SELECT doc_id,
                   CAST(-SUM(CAST(lp AS DECIMAL(38,15))) AS DOUBLE) / COUNT(*) AS h
            FROM scored GROUP BY doc_id),
        langs AS (
            SELECT doc_id,
                   CASE WHEN {_STOP_EN} >= {_STOP_DE} AND {_STOP_EN} >= {_STOP_ES}
                        THEN 'en'
                        WHEN {_STOP_DE} >= {_STOP_ES} THEN 'de'
                        ELSE 'es' END AS lang_pred
            FROM documents),
        ranked AS (
            SELECT c.doc_id, l.lang_pred, c.h,
                   ROW_NUMBER() OVER (PARTITION BY l.lang_pred
                                      ORDER BY c.h, c.doc_id) AS rk,
                   COUNT(*) OVER (PARTITION BY l.lang_pred) AS nl
            FROM ce c JOIN langs l USING (doc_id))
        SELECT doc_id, lang_pred, ROUND(h, 9) AS cross_entropy,
               CAST((3 * (rk - 1)) // nl AS INT) AS ppl_bucket
        FROM ranked ORDER BY doc_id"""


@check("ccnet_perplexity_buckets", oracle=_ccnet_oracle())
def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's language tercile under the even-half unigram
    LM — head/middle/tail membership value-checked document by
    document (the CCNet training-mixture split)."""
    return ccnet_perplexity_buckets(load(spark, sf_dir, "documents")).orderBy(
        "doc_id"
    )


def _cluster_keep_oracle() -> str:
    from dronedb_spark.text.dedup import _DUCK_SIG_BANDS

    return f"""
        WITH RECURSIVE sig AS ({_DUCK_SIG_BANDS}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig a JOIN sig b
              ON (a.band0 = b.band0 OR a.band1 = b.band1) AND a.doc_id < b.doc_id),
        sym AS (SELECT doc_a AS node, doc_b AS peer FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(node, label) AS (
            SELECT node, node FROM (SELECT DISTINCT node FROM sym) s
            UNION
            SELECT s.node, r.label FROM sym s JOIN reach r ON r.node = s.peer),
        clusters AS (
            SELECT node AS doc_id, MIN(label) AS cluster_id
            FROM reach GROUP BY node),
        q AS (
            SELECT doc_id,
                   len(list_distinct(string_split(text, ' '))) AS n_dis
            FROM documents),
        packed AS (
            SELECT c.cluster_id,
                   lpad(CAST(999999 - q.n_dis AS VARCHAR), 6, '0')
                   || lpad(CAST(c.doc_id AS VARCHAR), 9, '0') AS p
            FROM clusters c JOIN q USING (doc_id))
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(substr(MIN(p), 7, 9) AS BIGINT) AS keep_id,
               CAST(999999 - CAST(substr(MIN(p), 1, 6) AS BIGINT) AS BIGINT)
                   AS keep_distinct
        FROM packed GROUP BY cluster_id ORDER BY cluster_id"""


@check("cluster_quality_keep", oracle=_cluster_keep_oracle())
def q_cluster_quality_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor selection over the near-dup components: highest
    distinct-token member wins, ties to the smallest id — every
    cluster's survivor and its quality value-checked."""
    return cluster_quality_keep(load(spark, sf_dir, "documents")).orderBy(
        "cluster_id"
    )
