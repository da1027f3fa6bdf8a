"""Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD
2003 — the MOSS algorithm): hash every word k-gram, slide a w-window
over the hash sequence, keep each window's minimum, dedupe.  Guarantee:
any shared passage of at least w + k - 1 words yields at least one
SHARED fingerprint regardless of where it sits in either document — the
position-robust complement to MinHash (whole-doc similarity) and
segment dedup (aligned 8-grams).

Beyond the reference (it has no text pipeline); part of the
training-data operator set.  Scale design:

  * fingerprints are per-row array expressions (k-gram hashes via four
    shifted ``slice``s + ``zip_with`` minima — the dedup.py idiom that
    keeps Catalyst's projection collapse from re-hashing per element);
    no shuffle until the overlap join.
  * overlap candidates come from an equi-self-join on the fingerprint
    value — only documents sharing a fingerprint are compared, never
    O(n²).  Ubiquitous fingerprints (boilerplate phrases) are dropped by
    a document-frequency cap BEFORE the join, the standard winnowing
    practice that also bounds join fan-out at corpus scale (a
    fingerprint shared by f docs contributes f² pair candidates).
  * portable hashing: md5 of the k-gram, minima lexicographic —
    identical in any engine with md5, so the DuckDB oracle verifies
    exact fingerprint values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

K = 3  # word k-gram size (shares dedup.py's 3-gram builder)
W = 4  # winnowing window: guarantee threshold = W + K - 1 = 6 words
MAX_DF = 10  # fingerprints in more docs than this are boilerplate: drop


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — each document's distinct winnowing fingerprint set.

    Documents with fewer than W k-grams (but at least one) contribute
    their single overall minimum (one degenerate window); empty ones
    contribute nothing.
    """
    from dronedb_spark.text.dedup import _shingle_df

    hs_df = _shingle_df(docs).select(
        "doc_id", F.expr("transform(sh, s -> md5(s))").alias("hs")
    )
    # barrier: ``hs`` feeds four shifted slices below — materialize so
    # projection collapse cannot re-inline the per-gram md5 into each
    # slice (see dedup.py:minhash_signatures for the measured cost).
    # ``barrier_persist``: columnar cache in a bounded keyed LRU whose
    # eviction unpersists — no storage leak in a long-running service.
    from dronedb_spark.tables import barrier_persist

    hs_df = barrier_persist(hs_df)
    wins = F.expr(
        f"""CASE
              WHEN size(hs) >= {W} THEN
                zip_with(
                  zip_with(
                    zip_with(slice(hs, 1, size(hs) - {W - 1}),
                             slice(hs, 2, size(hs) - {W - 1}), (a, b) -> least(a, b)),
                    slice(hs, 3, size(hs) - {W - 1}), (a, b) -> least(a, b)),
                  slice(hs, 4, size(hs) - {W - 1}), (a, b) -> least(a, b))
              WHEN size(hs) > 0 THEN array(array_min(hs))
              ELSE array()
            END"""
    )
    return hs_df.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fp")
    )


def winnow_overlap(docs: DataFrame, max_df: int = MAX_DF) -> DataFrame:
    """(doc_a, doc_b, n_shared) for document pairs sharing at least one
    non-boilerplate fingerprint — the passage-reuse candidates.

    r14 (guide §2.4): the df cap is ONE window pass over the fp
    partitioning (the ``winnow_store`` / ``lsh_calibration`` idiom) —
    the r13 shape materialized the exploded (doc_id, fp) table
    (``barrier_persist``) so a groupBy-df rollup + left-semi join could
    both read it, i.e. a data-sized columnar materialization plus two
    fp-grain exchanges.  The window computes the df IN PLACE after a
    single fp exchange, the filter drops boilerplate rows there, and
    the posting-list groupBy reuses the same partitioning (same key ⇒
    no second exchange).  No persist, no semi-join; the lm round's
    lesson (token-grain materialization loses to recompute) applied."""
    fps = winnow_fingerprints(docs)
    # (doc_id, fp) is distinct by construction (array_distinct upstream),
    # so a plain count over the fp window IS the distinct-doc df.
    capped = fps.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
    ).filter(F.col("df") <= max_df)
    # r13 optimization (the containment.py posting-list plan): collapse
    # the df-capped postings to per-fp doc lists (provably ≤ max_df —
    # the window filter ran first, so a boilerplate fp never
    # materializes a list) and explode the ordered pairs IN-ROW.
    posts = capped.groupBy("fp").agg(F.collect_list("doc_id").alias("ds"))
    pairs = posts.select(
        F.explode(
            F.expr(
                """flatten(transform(ds,
                       x -> transform(filter(ds, y -> x < y),
                                      y -> struct(x AS doc_a, y AS doc_b))))"""
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b")
    return pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("n_shared")
    )


# ----------------------------------------------------------- checks --

# The synthetic corpus has no repeated passages, so the check derives a
# non-vacuous input: every 7th document gets a re-keyed copy with a
# 3-word prefix spliced on — the copy's k-gram POSITIONS all shift by 3,
# which defeats any position-aligned scheme but not winnowing (the
# shared window minima are position-independent).
_WIN_OFFSET = 7000000

_DUCK_WINNOW = f"""
    corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_WIN_OFFSET} AS doc_id, 'xx yy zz ' || text AS text
        FROM documents WHERE doc_id % 7 = 0),
    words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
    hs AS (
        SELECT doc_id,
               list_transform(
                   list_transform(range(1, greatest(len(w) - 1, 1)),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
                   s -> md5(s)) AS hs
        FROM words),
    wins AS (
        SELECT doc_id,
               CASE WHEN len(hs) >= {W}
                    THEN list_transform(range(1, len(hs) - {W - 2}),
                                        i -> list_min(hs[i:i+{W - 1}]))
                    WHEN len(hs) > 0 THEN [list_min(hs)]
                    ELSE [] END AS wins
        FROM hs),
    fps AS (SELECT DISTINCT doc_id, unnest(wins) AS fp FROM wins),
    rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(DISTINCT doc_id) <= {MAX_DF}),
    kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare r ON f.fp = r.fp)
"""


@check(
    "winnow_overlap_pairs",
    oracle=f"""
        WITH {_DUCK_WINNOW}
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(1) AS BIGINT) AS n_shared
        FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
        HAVING COUNT(1) >= 3
        ORDER BY doc_a, doc_b""",
)
def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs sharing >= 3 fingerprints — each spliced copy must pair
    with its original (positions shifted by the prefix), single-
    fingerprint coincidences filtered out."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 7 == 0).select(
            (F.col("doc_id") + _WIN_OFFSET).alias("doc_id"),
            F.concat(F.lit("xx yy zz "), F.col("text")).alias("text"),
        )
    )
    return (
        winnow_overlap(corpus)
        .filter(F.col("n_shared") >= 3)
        .orderBy("doc_a", "doc_b")
    )


# --------------------------------------------- incremental store probe --


def winnow_store(docs: DataFrame, max_df: int = MAX_DF) -> DataFrame:
    """The persisted passage-reuse index: (fp, doc_id) fingerprint
    postings of the corpus with the boilerplate df cap applied AT WRITE
    (a fingerprint in more than ``max_df`` docs indexes nothing) —
    what the daily pipeline appends per ingested batch, bucketed by
    ``fp`` on disk so tomorrow's probe joins without reshuffling it."""
    fps = winnow_fingerprints(docs)
    capped = (
        fps.withColumn(
            "df",
            F.count(F.lit(1)).over(Window.partitionBy("fp")),
        )
        .filter(F.col("df") <= max_df)
        .select("fp", "doc_id")
    )
    return capped


def incremental_winnow_probe(
    batch: DataFrame, store: DataFrame, min_shared: int = 3
) -> DataFrame:
    """(batch_doc, doc_id, n_shared): which corpus documents each NEW
    batch document reuses passages from — only the batch fingerprints
    compute; the store side of the fp equi-join never reshuffles when
    bucketed.  Same ≥ ``min_shared`` coincidence floor as the batch
    overlap operator."""
    bf = winnow_fingerprints(batch).withColumnRenamed("doc_id", "batch_doc")
    return (
        bf.join(store, "fp")
        .groupBy("batch_doc", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


@check(
    "winnow_store_probe",
    oracle=f"""
        WITH store_docs AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
        batch_docs AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
            UNION ALL
            SELECT doc_id + {_WIN_OFFSET} AS doc_id, 'xx yy zz ' || text AS text
            FROM store_docs WHERE doc_id % 5 = 1),
        swords AS (SELECT doc_id, string_split(text, ' ') AS w FROM store_docs),
        shs AS (
            SELECT doc_id,
                   list_transform(
                       list_transform(range(1, greatest(len(w) - 1, 1)),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
                       s -> md5(s)) AS hs
            FROM swords),
        swins AS (
            SELECT doc_id,
                   CASE WHEN len(hs) >= {W}
                        THEN list_transform(range(1, len(hs) - {W - 2}),
                                            i -> list_min(hs[i:i+{W - 1}]))
                        WHEN len(hs) > 0 THEN [list_min(hs)]
                        ELSE [] END AS wins
            FROM shs),
        sfps AS (SELECT DISTINCT doc_id, unnest(wins) AS fp FROM swins),
        store AS (
            SELECT fp, doc_id FROM (
                SELECT fp, doc_id, COUNT(*) OVER (PARTITION BY fp) AS df
                FROM sfps) x
            WHERE df <= {MAX_DF}),
        bwords AS (SELECT doc_id, string_split(text, ' ') AS w FROM batch_docs),
        bhs AS (
            SELECT doc_id,
                   list_transform(
                       list_transform(range(1, greatest(len(w) - 1, 1)),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]),
                       s -> md5(s)) AS hs
            FROM bwords),
        bwins AS (
            SELECT doc_id,
                   CASE WHEN len(hs) >= {W}
                        THEN list_transform(range(1, len(hs) - {W - 2}),
                                            i -> list_min(hs[i:i+{W - 1}]))
                        WHEN len(hs) > 0 THEN [list_min(hs)]
                        ELSE [] END AS wins
            FROM bhs),
        bfps AS (SELECT DISTINCT doc_id AS batch_doc, unnest(wins) AS fp
                 FROM bwins)
        SELECT b.batch_doc, s.doc_id,
               CAST(COUNT(1) AS BIGINT) AS n_shared
        FROM bfps b JOIN store s ON s.fp = b.fp
        GROUP BY b.batch_doc, s.doc_id
        HAVING COUNT(1) >= 3
        ORDER BY batch_doc, doc_id""",
)
def q_winnow_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest shape for the passage-reuse family: store =
    df-capped fingerprint postings of doc_id % 3 != 0; batch = the rest
    PLUS prefix-spliced re-keyed copies of some store docs (positions
    shift by 3 — winnowing must still match).  Each copy must probe
    back to its original; genuinely new docs only where they reuse
    corpus passages."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    store_docs = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        store_docs.filter(F.col("doc_id") % 5 == 1).select(
            (F.col("doc_id") + _WIN_OFFSET).alias("doc_id"),
            F.concat(F.lit("xx yy zz "), F.col("text")).alias("text"),
        )
    )
    return incremental_winnow_probe(batch, winnow_store(store_docs)).orderBy(
        "batch_doc", "doc_id"
    )
