"""Dataset version diff — content-hash accounting between two corpus
versions (the dataset-level sibling of the file-level delta machinery
in ``operators/delta.py``, reference delta.cpp parity lives there):
which documents were ADDED, REMOVED, CHANGED (same id, different
bytes), or UNCHANGED between yesterday's snapshot and today's.  Every
training-data pipeline needs this ledger before it re-trains: "what
actually moved?" is a diff, not a re-scan of both corpora by eye.

Shape: one full-outer join on doc_id carrying md5(text) on each side —
content hashes, not text, cross the shuffle (the stamp/delta
discipline); the verdict is a pure column CASE; the rollup is
map-side combinable.  At 100 TB both sides are hash projections of
their parquet scans, so the join moves 16-byte digests.

The driver check derives version B from the fixture deterministically:
every 7th doc removed, every 5th surviving doc edited (a suffix
append), a block of fresh ids added — the oracle restates the same
derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load


def dataset_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(doc_id, status): added | removed | changed | unchanged."""
    o = old.select("doc_id", F.md5("text").alias("h_old"))
    n = new.select("doc_id", F.md5("text").alias("h_new"))
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("added"))
        .when(F.col("h_new").isNull(), F.lit("removed"))
        .when(F.col("h_old") == F.col("h_new"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select("doc_id", status.alias("status"))


def dataset_diff_rollup(old: DataFrame, new: DataFrame) -> DataFrame:
    return (
        dataset_diff(old, new)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("sum_ids"),
        )
    )


_NEW_IDS_FROM = 900000


def _version_b(docs: DataFrame) -> DataFrame:
    """Every 7th doc removed; every 5th survivor edited; 30 fresh docs."""
    survivors = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 5 = 0 THEN text || ' EDITED' ELSE text END"
        ).alias("text"),
    )
    fresh = docs.sparkSession.range(30).select(
        (F.col("id") + _NEW_IDS_FROM).alias("doc_id"),
        F.concat(F.lit("fresh document number "), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    return survivors.unionByName(fresh)


@check(
    "dataset_diff_rollup",
    oracle=f"""
        WITH old AS (SELECT doc_id, text FROM documents),
        newv AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' EDITED' ELSE text END
                       AS text
            FROM documents WHERE doc_id % 7 <> 0
            UNION ALL
            SELECT {_NEW_IDS_FROM} + i AS doc_id,
                   'fresh document number ' || i AS text
            FROM (SELECT unnest(range(0, 30)) AS i)),
        j AS (
            SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                   md5(o.text) AS h_old, md5(n.text) AS h_new
            FROM old o FULL OUTER JOIN newv n ON o.doc_id = n.doc_id),
        verdicts AS (
            SELECT doc_id,
                   CASE WHEN h_old IS NULL THEN 'added'
                        WHEN h_new IS NULL THEN 'removed'
                        WHEN h_old = h_new THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM j)
        SELECT status,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids
        FROM verdicts GROUP BY status ORDER BY status""",
)
def q_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture corpus vs its derived next version: added/removed/
    changed/unchanged accounting with id checksums."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return dataset_diff_rollup(docs, _version_b(docs)).orderBy("status")
