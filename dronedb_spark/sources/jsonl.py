"""JSONL(.gz) dataset interchange — the lingua franca of LLM text
datasets (HuggingFace dumps, RedPajama, Dolma all ship newline-
delimited JSON, usually gzipped).  Spark-first: ``spark.read.json`` IS
a distributed JSONL reader (one task per file/split, schema projected
at the scan, codec handled by the input format) and
``df.write.json(codec=gzip)`` the writer — this module is the thin,
tested contract on top, not a reimplementation:

  * ``write_jsonl``: documents → ``part-*.json.gz`` shards, one task
    per output partition;
  * ``read_jsonl``: explicit schema (never inference — a schema scan
    reads the whole corpus twice and silently widens types), corrupt
    lines routed to ``_corrupt_record`` (PERMISSIVE) instead of
    failing the job — the crawl-reality default;
  * round-trip law: write → read is value-identical for the documents
    shape (driver-checked).

Scale shape: both directions are the built-in JSON datasource — full
scan parallelism, predicate/column pruning on read (gzip is not
splittable, so shard counts set read parallelism — stated), zero
Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check
from dronedb_spark.tables import load

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(docs: DataFrame, path: str, n_shards: int = 4) -> None:
    """Documents → gzipped JSONL shards.  ``repartition(n_shards)``
    sets the shard count — and therefore the read parallelism of any
    downstream gzip consumer (gzip is not splittable)."""
    docs.repartition(n_shards).write.mode("overwrite").option(
        "compression", "gzip"
    ).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA) -> DataFrame:
    """JSONL shards → DataFrame with an EXPLICIT schema + corrupt-line
    capture (PERMISSIVE): one bad line yields one null row with the
    raw text in ``_corrupt_record``, never a failed job."""
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


@check(
    "jsonl_roundtrip",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(length(text)) AS BIGINT) AS sum_chars,
               CAST(0 AS BIGINT) AS n_corrupt
        FROM documents GROUP BY source ORDER BY source""",
)
def q_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → gzipped JSONL shards → read back with explicit
    schema: per-source counts/id-sums/char mass value-identical, zero
    corrupt records.  Scratch-dir check: collected in-function."""
    import tempfile

    docs = load(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as td:
        p = td + "/docs_jsonl"
        write_jsonl(docs, p)
        back = read_jsonl(spark, p)
        rows = (
            back.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("doc_id").cast("bigint").alias("sum_ids"),
                F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
                F.sum(
                    F.col("_corrupt_record").isNotNull().cast("bigint")
                ).cast("bigint").alias("n_corrupt"),
            )
            .orderBy("source")
            .collect()
        )
    return spark.createDataFrame(
        rows, "source string, n_docs bigint, sum_ids bigint, sum_chars bigint, n_corrupt bigint"
    )
