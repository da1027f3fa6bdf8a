"""Leakage-free train/validation splits — the split unit is the
NEAR-DUP CLUSTER, not the document: hashing documents independently
leaks a near-duplicate of a validation document into training (the
classic contamination bug; Lee et al. 2022 §6 measure exactly this
effect).  Composes the MinHash-LSH component ids
(``text/dedup.py:neardup_clusters``) with the deterministic-hash split
the sampling family uses.

Mechanics: unit = cluster id (the component's min doc_id), singleton
documents fall back to their own id; split =
``md5(seed‖unit) % 1000 < val_permille`` — every member of a cluster
shares the unit hash, so a cluster CANNOT straddle splits by
construction, and the output carries the measured
``spanning_units`` (pinned 0 by the oracle) so a refactor that breaks
the invariant fails the correctness gate, not just a code review.

Scale shape: the cluster pass is the existing LSH + HashMin machinery;
the split itself is one codegen projection; the audit and the
per-split rollup are two map-side-combined aggregates over
(unit, split) — corpus-sized work only where the dedup family already
pays it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load
from dronedb_spark.text.dedup import _DUCK_SIG_BANDS, neardup_clusters

SEED = "split42"
VAL_PERMILLE = 200  # ~20% validation


def leakage_free_split(
    docs: DataFrame,
    clusters: DataFrame,
    seed: str = SEED,
    val_permille: int = VAL_PERMILLE,
) -> DataFrame:
    """(doc_id, unit, split): every document tagged train/val with its
    whole near-dup cluster moving together."""
    tagged = (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("unit"),
        )
    )
    h = F.expr(
        f"CAST(conv(substr(md5(concat('{seed}:', CAST(unit AS STRING))),"
        f" 1, 8), 16, 10) AS BIGINT) % 1000"
    )
    return tagged.withColumn(
        "split", F.when(h < val_permille, F.lit("val")).otherwise(F.lit("train"))
    )


def split_report(split_df: DataFrame) -> DataFrame:
    """(split, n_docs, n_units, sum_doc_id, spanning_units): per-split
    rollup plus the corpus-level leakage audit (units whose members
    land in more than one split — 0 by construction)."""
    per_split = split_df.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("unit").cast("bigint").alias("n_units"),
        F.sum("doc_id").cast("bigint").alias("sum_doc_id"),
    )
    audit = (
        split_df.groupBy("unit")
        .agg(F.countDistinct("split").alias("ns"))
        .agg(
            F.sum(F.col("ns") - 1).cast("bigint").alias("spanning_units")
        )
    )
    return per_split.join(F.broadcast(audit)).select(
        "split", "n_docs", "n_units", "sum_doc_id", "spanning_units"
    )


@check(
    "leakage_free_split",
    oracle=f"""
        WITH RECURSIVE sig AS ({_DUCK_SIG_BANDS}),
        pairs AS (
            SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
            FROM sig a JOIN sig b
              ON (a.band0 = b.band0 OR a.band1 = b.band1)
             AND a.doc_id < b.doc_id),
        sym AS (SELECT doc_a AS node, doc_b AS peer FROM pairs
                UNION ALL SELECT doc_b, doc_a FROM pairs),
        reach(node, label) AS (
            SELECT node, node FROM (SELECT DISTINCT node FROM sym) s
            UNION
            SELECT s.node, r.label FROM sym s JOIN reach r ON r.node = s.peer),
        comp AS (
            SELECT node AS doc_id, MIN(label) AS cluster_id
            FROM reach GROUP BY node),
        tagged AS (
            SELECT d.doc_id,
                   COALESCE(c.cluster_id, d.doc_id) AS unit
            FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
        sp AS (
            SELECT doc_id, unit,
                   CASE WHEN CAST('0x' || substr(md5('{SEED}:' ||
                            CAST(unit AS VARCHAR)), 1, 8) AS BIGINT) % 1000
                            < {VAL_PERMILLE}
                        THEN 'val' ELSE 'train' END AS split
            FROM tagged),
        per_split AS (
            SELECT split, CAST(COUNT(1) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT unit) AS BIGINT) AS n_units,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id
            FROM sp GROUP BY split),
        audit AS (
            SELECT CAST(SUM(ns - 1) AS BIGINT) AS spanning_units
            FROM (SELECT unit, COUNT(DISTINCT split) AS ns
                  FROM sp GROUP BY unit))
        SELECT p.split, p.n_docs, p.n_units, p.sum_doc_id,
               a.spanning_units
        FROM per_split p, audit a ORDER BY p.split""",
)
def q_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~80/20 cluster-level split of the corpus: near-dup clusters move
    whole (spanning_units must be 0 — the leakage invariant is part of
    the checked result, with exact membership via doc_id sums)."""
    docs = load(spark, sf_dir, "documents")
    sp = leakage_free_split(docs, neardup_clusters(docs))
    return split_report(sp).orderBy("split")
