"""ORC dataset interchange — the third columnar container next to
Parquet (the house format) and the row-oriented JSONL/CSV sinks:
Hive-era warehouses hand datasets over as ORC, and Spark's built-in
ORC datasource reads/writes it with full pushdown (predicate +
column pruning reach the stripe level, same as parquet).

This module is the tested contract, not a reimplementation: write is
``df.write.orc`` (zlib-compressed stripes, splittable — unlike the
gzip text sinks, read parallelism does NOT depend on shard count),
read takes an explicit schema-on-read projection.  The round-trip
check writes the documents table with every column type the fixture
carries (bigint, string, and the text payload) and value-checks
per-source rollups against the pre-write corpus — DuckDB never needs
to read ORC; the roundtrip identity is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load


def write_orc(df: DataFrame, path: str, n_shards: int = 4) -> None:
    df.repartition(n_shards).write.mode("overwrite").option(
        "compression", "zlib"
    ).orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


@check(
    "orc_roundtrip",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
               CAST(SUM(n_chars) AS BIGINT) AS sum_n_chars
        FROM documents GROUP BY source ORDER BY source""",
)
def q_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → zlib ORC stripes → read back: per-source counts and
    value mass identical.  Scratch-dir check: collected in-function."""
    import tempfile

    docs = load(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as td:
        p = td + "/docs_orc"
        write_orc(docs, p)
        rows = (
            read_orc(spark, p)
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("doc_id").cast("bigint").alias("sum_ids"),
                F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
                F.sum("n_chars").cast("bigint").alias("sum_n_chars"),
            )
            .orderBy("source")
            .collect()
        )
    return spark.createDataFrame(
        rows,
        "source string, n_docs bigint, sum_ids bigint, sum_chars bigint, sum_n_chars bigint",
    )
