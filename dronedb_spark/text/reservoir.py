"""Deterministic fixed-size corpus sampling — the "reservoir" primitive
every audit/eval/calibration stage draws from (quality spot checks,
LSH-calibration inputs, human-review batches), made REPRODUCIBLE: the
sample of N is the N smallest ``md5(seed || key)`` rows, so the same
(seed, N) always names the same documents regardless of partitioning,
ingestion order, or cluster size — unlike ``rand()`` reservoirs, two
runs (or two engines) agree row-for-row, and growing the corpus only
evicts by hash order (a consistent-hashing property: adding data
changes the sample minimally, ~N·new/(old+new) rows swap).

Scale shape: ORDER BY hash LIMIT N plans as TakeOrderedAndProject —
per-partition top-N heaps then one N-row merge on the driver side of
the exchange; nothing resembling a global sort materializes
(plan-pinned in tests/test_plans.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

SAMPLE_N = 100
SEED = "audit-v1"


def reservoir_sample(
    docs: DataFrame, n: int = SAMPLE_N, seed: str = SEED
) -> DataFrame:
    """(rank, doc_id, source): the n smallest-hash documents, ranked."""
    hashed = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string"))).alias(
            "h"
        ),
    )
    top = hashed.orderBy("h", "doc_id").limit(n)
    w = Window.orderBy("h", "doc_id")
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "doc_id",
        "source",
    )


@check(
    "reservoir_sample_fixed",
    oracle=f"""
        WITH hashed AS (
            SELECT doc_id, source,
                   md5('{SEED}:' || CAST(doc_id AS VARCHAR)) AS h
            FROM documents),
        top AS (
            SELECT doc_id, source, h FROM hashed
            ORDER BY h, doc_id LIMIT {SAMPLE_N})
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS rank,
               doc_id, source
        FROM top ORDER BY rank""",
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 100-document audit sample: same (seed, N) →
    same rows on any engine, any partitioning — ranked by hash order."""
    return reservoir_sample(load(spark, sf_dir, "documents")).orderBy("rank")


# ----------------------------------------------- stratified sampling --

N_STRATA = 5
PER_STRATUM = 20


def stratified_length_sample(
    docs: DataFrame,
    n_strata: int = N_STRATA,
    per_stratum: int = PER_STRATUM,
    seed: str = SEED,
) -> DataFrame:
    """(stratum, rank, doc_id, n_chars): a length-matched eval/audit
    sample — ``per_stratum`` deterministic hash-order docs from each of
    ``n_strata`` length strata, so the sample's length distribution
    mirrors the corpus instead of over-representing the short-doc mass.

    Strata are VALUE-based exact quantile ranges over the collapsed
    ``n_chars`` histogram: ``stratum(v) = (docs_shorter_than_v ·
    n_strata) DIV N`` — every doc of one length lands in one stratum
    (no arbitrary tie split), integer arithmetic end to end, and the
    histogram (bounded by the length domain, not the corpus) is the
    only globally-ordered structure.  Per-stratum selection is the
    ``domain_cap`` hash-order rank; at extreme per-stratum volume the
    same two-phase cutoff-hash refinement applies."""
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    strata = hist.select(
        "n_chars",
        F.expr(
            f"((sum(cnt) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND CURRENT ROW) - cnt) * {n_strata}) DIV "
            f"sum(cnt) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND UNBOUNDED FOLLOWING)"
        ).cast("bigint").alias("stratum"),
    )
    tagged = docs.select("doc_id", "n_chars").join(
        F.broadcast(strata), "n_chars"
    )
    h = F.md5(F.concat(F.lit(seed + ":"), F.col("doc_id").cast("string")))
    ws = Window.partitionBy("stratum").orderBy(h, "doc_id")
    return (
        tagged.withColumn("rank", F.row_number().over(ws).cast("bigint"))
        .filter(F.col("rank") <= per_stratum)
        .select("stratum", "rank", "doc_id", F.col("n_chars").cast("bigint"))
    )


@check(
    "stratified_length_sample",
    oracle=f"""
        WITH hist AS (
            SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars),
        strata AS (
            SELECT n_chars,
                   CAST(((SUM(cnt) OVER (ORDER BY n_chars ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
                         * {N_STRATA})
                        // SUM(cnt) OVER () AS BIGINT) AS stratum
            FROM hist),
        tagged AS (
            SELECT d.doc_id, d.n_chars, s.stratum
            FROM documents d JOIN strata s ON s.n_chars = d.n_chars),
        ranked AS (
            SELECT stratum, doc_id, n_chars,
                   CAST(ROW_NUMBER() OVER (PARTITION BY stratum
                        ORDER BY md5('{SEED}:' || CAST(doc_id AS VARCHAR)),
                                 doc_id) AS BIGINT) AS rank
            FROM tagged)
        SELECT stratum, rank, doc_id, CAST(n_chars AS BIGINT) AS n_chars
        FROM ranked WHERE rank <= {PER_STRATUM}
        ORDER BY stratum, rank""",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-stratified deterministic sample: 20 hash-order docs from
    each of 5 exact length-quantile strata — the length-matched eval
    draw."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return stratified_length_sample(docs).orderBy("stratum", "rank")


# ------------------------------------------- eval-set construction --


def eval_set_pipeline(docs: DataFrame) -> DataFrame:
    """(stratum, n_candidates, n_kept, n_dedup_dropped, sample_ids_sum):
    the eval-set construction composition — exact dedup (keep-first by
    content hash) → length-stratified deterministic sample — with
    per-stage accounting per stratum, the corpus-card row an eval
    release ships with.  Composes library stages (the dedup window, the
    histogram strata, the hash-order rank): each piece is separately
    driver-gated; this check pins the COMPOSITION's bookkeeping."""
    hashed = docs.select("doc_id", "n_chars", F.md5("text").alias("ch"))
    w = Window.partitionBy("ch").orderBy("doc_id")
    flagged = hashed.withColumn(
        "is_first", F.row_number().over(w) == 1
    )
    kept = flagged.filter("is_first").select("doc_id", "n_chars")
    sample = stratified_length_sample(kept)
    # candidates per stratum = ALL docs (pre-dedup) whose length falls
    # in the stratum — strata edges come from the KEPT distribution
    # (the sampled population), so the accounting states both stages
    hist = kept.groupBy("n_chars").agg(F.count(F.lit(1)).alias("cnt"))
    strata = hist.select(
        "n_chars",
        F.expr(
            f"((sum(cnt) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND CURRENT ROW) - cnt) * {N_STRATA}) DIV "
            f"sum(cnt) OVER (ORDER BY n_chars ROWS BETWEEN UNBOUNDED "
            f"PRECEDING AND UNBOUNDED FOLLOWING)"
        ).cast("bigint").alias("stratum"),
    )
    staged = flagged.join(F.broadcast(strata), "n_chars", "left").select(
        F.coalesce("stratum", F.lit(-1)).alias("stratum"),
        F.col("is_first").cast("int").alias("kept"),
    )
    acct = staged.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.sum("kept").cast("bigint").alias("n_kept"),
        (F.count(F.lit(1)) - F.sum("kept")).cast("bigint").alias("n_dedup_dropped"),
    )
    samp = sample.groupBy("stratum").agg(
        F.sum("doc_id").cast("bigint").alias("sample_ids_sum")
    )
    return acct.join(samp, "stratum", "left").select(
        "stratum", "n_candidates", "n_kept", "n_dedup_dropped",
        F.coalesce("sample_ids_sum", F.lit(-1)).alias("sample_ids_sum"),
    )


@check(
    "eval_set_pipeline_rollup",
    oracle=f"""
        WITH corpus AS (
            SELECT doc_id, n_chars, text FROM documents
            UNION ALL
            SELECT doc_id + 10000 AS doc_id, n_chars, text
            FROM documents WHERE doc_id % 9 = 0),
        hashed AS (
            SELECT doc_id, n_chars, md5(text) AS ch FROM corpus),
        flagged AS (
            SELECT doc_id, n_chars,
                   ROW_NUMBER() OVER (PARTITION BY ch ORDER BY doc_id) = 1
                       AS is_first
            FROM hashed),
        kept AS (SELECT doc_id, n_chars FROM flagged WHERE is_first),
        hist AS (SELECT n_chars, COUNT(*) AS cnt FROM kept GROUP BY n_chars),
        strata AS (
            SELECT n_chars,
                   CAST(((SUM(cnt) OVER (ORDER BY n_chars ROWS BETWEEN
                          UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
                         * {N_STRATA})
                        // SUM(cnt) OVER () AS BIGINT) AS stratum
            FROM hist),
        tagged AS (
            SELECT k.doc_id, s.stratum
            FROM kept k JOIN strata s ON s.n_chars = k.n_chars),
        ranked AS (
            SELECT stratum, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY stratum
                        ORDER BY md5('{SEED}:' || CAST(doc_id AS VARCHAR)),
                                 doc_id) AS rank
            FROM tagged),
        samp AS (
            SELECT stratum, SUM(doc_id) AS sample_ids_sum
            FROM ranked WHERE rank <= {PER_STRATUM} GROUP BY stratum),
        acct AS (
            SELECT COALESCE(s.stratum, -1) AS stratum,
                   COUNT(*) AS n_candidates,
                   SUM(CASE WHEN f.is_first THEN 1 ELSE 0 END) AS n_kept
            FROM flagged f LEFT JOIN strata s ON s.n_chars = f.n_chars
            GROUP BY COALESCE(s.stratum, -1))
        SELECT a.stratum,
               CAST(a.n_candidates AS BIGINT) AS n_candidates,
               CAST(a.n_kept AS BIGINT) AS n_kept,
               CAST(a.n_candidates - a.n_kept AS BIGINT) AS n_dedup_dropped,
               CAST(COALESCE(m.sample_ids_sum, -1) AS BIGINT) AS sample_ids_sum
        FROM acct a LEFT JOIN samp m ON m.stratum = a.stratum
        ORDER BY a.stratum""",
)
def q_eval_set_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set construction end to end over a corpus with PLANTED
    re-keyed exact copies (doc_id % 9): keep-first dedup must drop every
    copy, then the length-stratified deterministic 5×20 sample draws
    from the survivors — per-stratum candidate/kept/dropped accounting
    plus the sampled-id checksum pinning WHICH docs were drawn."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") % 9 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "n_chars", "text"
        )
    )
    return eval_set_pipeline(corpus).orderBy("stratum")
