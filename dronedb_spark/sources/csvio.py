"""CSV(.gz) dataset interchange — the other lingua franca next to
JSONL (``sources/jsonl.py``): metadata tables, labeling exports, and
spreadsheet-born datasets arrive as CSV.  Spark-first: the built-in
CSV datasource IS the distributed reader/writer (one task per
file/split, quoting/escaping in the JVM, codec from the input format);
this module is the tested contract on top:

  * ``write_csv``: gzipped, HEADERED, RFC-4180-quoted shards — the
    shard count sets downstream read parallelism (gzip is not
    splittable, same statement as the JSONL sink);
  * ``read_csv``: EXPLICIT schema (no inference scan), PERMISSIVE mode
    with corrupt rows routed to ``_corrupt_record``, ``multiLine`` off
    by default (on = one task per file — stated, because quoted
    embedded newlines cannot split);
  * the driver check round-trips a derived column carrying commas,
    double quotes, and leading/trailing spaces — the cases naive CSV
    handling corrupts silently — and value-checks per-source rollups
    against the pre-write corpus.

Zero Python in the data path in either direction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check
from dronedb_spark.tables import load

CSV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("notes", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_csv(df: DataFrame, path: str, n_shards: int = 4) -> None:
    # Spark's CSV WRITER defaults ignore{Leading,Trailing}WhiteSpace to
    # TRUE — it silently trims value edges even under quoteAll.  Turn
    # both off: an interchange sink must write the bytes it was given
    # (the round-trip check plants edge whitespace to enforce this).
    (
        df.repartition(n_shards)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .option("header", True)
        .option("quoteAll", True)
        .option("ignoreLeadingWhiteSpace", False)
        .option("ignoreTrailingWhiteSpace", False)
        .csv(path)
    )


def read_csv(
    spark: SparkSession, path: str, schema: T.StructType = CSV_SCHEMA
) -> DataFrame:
    full = T.StructType(
        list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


@check(
    "csv_roundtrip",
    oracle="""
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
               CAST(SUM(length('a,"quoted", ' || source || ' trailing  ')
                        + n_chars) AS BIGINT) AS sum_payload,
               CAST(0 AS BIGINT) AS n_corrupt
        FROM documents GROUP BY source ORDER BY source""",
)
def q_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + a comma/quote/space-laden notes column → gzipped
    quoted CSV shards → read back: per-source counts and payload char
    mass value-identical, zero corrupt records.  Scratch-dir check:
    collected in-function."""
    import tempfile

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr("'a,\"quoted\", ' || source || ' trailing  '").alias("notes"),
        "n_chars",
    )
    with tempfile.TemporaryDirectory() as td:
        p = td + "/docs_csv"
        write_csv(docs, p)
        back = read_csv(spark, p)
        rows = (
            back.groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("doc_id").cast("bigint").alias("sum_ids"),
                F.sum(F.length("notes") + F.col("n_chars"))
                .cast("bigint")
                .alias("sum_payload"),
                F.sum(F.col("_corrupt_record").isNotNull().cast("bigint"))
                .cast("bigint")
                .alias("n_corrupt"),
            )
            .orderBy("source")
            .collect()
        )
    return spark.createDataFrame(
        rows,
        "source string, n_docs bigint, sum_ids bigint, sum_payload bigint, n_corrupt bigint",
    )
