"""Deterministic global shuffle + sharding — the training-data ordering
step (beyond the reference): a training run needs the corpus in a
REPRODUCIBLE pseudo-random order, split into equal shards, such that
any re-run (or a resumed run on a different cluster size) sees exactly
the same sequence.  The standard recipe (e.g. the WebDataset/Megatron
data-order convention): order by a keyed hash of the document id.

  * shuffle key  = md5(seed || ':' || doc_id) — a fixed seed gives a
    fixed permutation; changing the seed reshuffles.
  * shard        = first 8 hex chars of the key mod n_shards — balanced
    in expectation, deterministic, independent of partitioning.
  * position     = rank of the key within the shard — the exact read
    order of that shard's loader.

Scale shape: ONE shuffle (hash partition on shard) + an in-partition
sort — exactly the physical plan a sharded write wants
(``partitionBy(shard)`` + ``sortWithinPartitions(key)``); nothing is
collected and no global sort exists anywhere."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

N_SHARDS = 8
SEED = "r7seed"


def shard_shuffle(
    docs: DataFrame, n_shards: int = N_SHARDS, seed: str = SEED
) -> DataFrame:
    """(doc_id, shard, pos): deterministic shard + in-shard order."""
    key = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string")))
    shard = (
        F.expr(f"CAST(conv(substr(md5('{seed}:' || CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT)")
        % n_shards
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("key")
    return (
        docs.select("doc_id", key.alias("key"), shard.alias("shard"))
        .select(
            "doc_id", "shard", F.row_number().over(w).alias("pos")
        )
    )


@check(
    "shard_shuffle_assign",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id,
                   md5('{SEED}:' || CAST(doc_id AS VARCHAR)) AS key,
                   CAST(CAST('0x' || substr(md5('{SEED}:' || CAST(doc_id AS VARCHAR)), 1, 8)
                             AS BIGINT) % {N_SHARDS} AS INT) AS shard
            FROM documents)
        SELECT doc_id, shard,
               CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key) AS INT) AS pos
        FROM keyed ORDER BY shard, pos""",
)
def q_shard_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full shard assignment + read order, value-checked row by row
    (same md5 keying in both engines ⇒ identical permutation)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    return shard_shuffle(docs).orderBy("shard", "pos")
