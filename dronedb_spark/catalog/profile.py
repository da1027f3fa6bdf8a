"""Table profiling — the ANALYZE-style per-column statistics pass every
catalog runs before it can plan (join ordering, pruning, broadcast
decisions all read these numbers): per column, row/null counts,
distinct cardinality, and min/max.

One pass, one shuffle: the columns UNPIVOT into (col, value-as-string)
rows — min/max are computed in the NATIVE type first and only then
rendered (string min/max of numbers is lexicographic nonsense), and the
unpivot happens via a stack expression so the table scans ONCE for all
columns.  Distinct counts are exact here (the HLL sketch in
``text/sketch.py`` is the approximate drop-in when the column is a
billion-key URL set — stated).

The check profiles the documents table's exact-render types (bigint
and string), where native-then-render is engine-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col, n, n_null, ndv, min_s, max_s) per requested column — ONE
    aggregation pass over the table (4 accumulators per column, all
    map-side combinable except the exact distincts), min/max computed
    in the NATIVE type and rendered at the edge."""
    aggs = [F.count(F.lit(1)).alias("_total")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"_cnt_{c}"),
            F.countDistinct(c).alias(f"_ndv_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    row = df.agg(*aggs).collect()[0]
    total = row["_total"]
    out = [
        (
            c,
            int(total),
            int(total - row[f"_cnt_{c}"]),
            int(row[f"_ndv_{c}"]),
            row[f"_min_{c}"],
            row[f"_max_{c}"],
        )
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out, "col string, n bigint, n_null bigint, ndv bigint, min_s string, max_s string"
    )


@check(
    "table_stats_profile",
    oracle="""
        SELECT 'doc_id' AS col, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) - COUNT(doc_id) AS BIGINT) AS n_null,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS ndv,
               CAST(MIN(doc_id) AS VARCHAR) AS min_s,
               CAST(MAX(doc_id) AS VARCHAR) AS max_s
        FROM documents
        UNION ALL
        SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
               COUNT(DISTINCT lang),
               CAST(MIN(lang) AS VARCHAR), CAST(MAX(lang) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
               COUNT(DISTINCT n_chars),
               CAST(MIN(n_chars) AS VARCHAR), CAST(MAX(n_chars) AS VARCHAR)
        FROM documents
        UNION ALL
        SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
               COUNT(DISTINCT source),
               CAST(MIN(source) AS VARCHAR), CAST(MAX(source) AS VARCHAR)
        FROM documents
        ORDER BY col""",
)
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profile the documents table's bigint/string columns: exact
    counts, cardinalities, and native-then-rendered extrema."""
    docs = load(spark, sf_dir, "documents")
    return profile_columns(docs, ["doc_id", "lang", "n_chars", "source"]).orderBy(
        "col"
    )
