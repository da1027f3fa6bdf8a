"""Aspect-ratio bucketing + batch assembly — the image-training batch
layout step (beyond the reference; the SDXL/NovelAI "aspect bucket"
recipe): variable-sized images can't batch together, so each image is
assigned to the bucket whose target aspect ratio is nearest its own,
and batches are cut WITHIN a bucket; images left over after the last
full batch are dropped (the standard trade — padding wastes compute).

Determinism discipline: bucket aspects are PER-MILLE INTEGERS and the
distance is ``|1000·w − h·aspect_j|`` — exact integer arithmetic, so
the argmin (ties → smaller bucket index) is engine-exact and the whole
assignment + batch numbering oracle-checks value for value.  A float
``|log(w/h) − log(r_j)|`` would be the textbook form; the integer
cross-multiplied metric picks the same bucket wherever log-space and
ratio-space argmins agree and never diverges between engines.

Scale shape: assignment is a narrow projection (argmin over a constant
bucket list); batch numbering is ONE shuffle (hash partition by
bucket) + in-partition rank — the same plan a
``partitionBy(bucket)`` training-shard write wants."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import register_views

# target aspects, per-mille (w/h * 1000): 1:2 ... 2:1
BUCKET_ASPECTS = [500, 666, 750, 1000, 1333, 1500, 2000]
BATCH = 16

# deterministic image dimensions derived from documents — runs verbatim
# in Spark SQL and DuckDB (the GEORASTER_PROPS discipline)
_DIMS_SQL = """
    SELECT doc_id,
           CAST(512 + (doc_id * 7) % 1537 AS BIGINT) AS w,
           CAST(512 + (doc_id * 13) % 1025 AS BIGINT) AS h
    FROM documents WHERE doc_id % 3 = 0
"""


def assign_buckets(dims: DataFrame) -> DataFrame:
    """(doc_id, w, h, bucket): nearest-aspect bucket by the exact
    integer metric, ties to the smaller bucket index."""
    dists = F.array(
        *[F.abs(F.lit(1000) * F.col("w") - F.col("h") * F.lit(a)) for a in BUCKET_ASPECTS]
    )
    bucket = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return dims.select("doc_id", "w", "h", bucket.alias("bucket"))


def bucket_batches(dims: DataFrame, batch: int = BATCH) -> DataFrame:
    """(doc_id, bucket, batch_no, in_full_batch): batches cut per bucket
    in deterministic doc_id order; the trailing partial batch is
    flagged 0 (a loader drops it)."""
    assigned = assign_buckets(dims)
    w = Window.partitionBy("bucket").orderBy("doc_id")
    pos = F.row_number().over(w)
    n = F.count(F.lit(1)).over(Window.partitionBy("bucket"))
    return assigned.select(
        "doc_id",
        "bucket",
        ((pos - 1) / batch).cast("int").alias("batch_no"),
        (pos <= (n - n % batch)).cast("int").alias("in_full_batch"),
    )


@check(
    "aspect_bucket_batches",
    oracle=f"""
        WITH dims AS ({_DIMS_SQL}),
        assigned AS (
            SELECT doc_id, w, h,
                   CAST(list_position(d, list_min(d)) - 1 AS INT) AS bucket
            FROM (
                SELECT doc_id, w, h,
                       [{', '.join(f'abs(1000 * w - h * {a})' for a in BUCKET_ASPECTS)}] AS d
                FROM dims) t),
        ranked AS (
            SELECT doc_id, bucket,
                   ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS pos,
                   COUNT(*) OVER (PARTITION BY bucket) AS n
            FROM assigned)
        SELECT doc_id, bucket,
               CAST((pos - 1) // {BATCH} AS INT) AS batch_no,
               CAST(CASE WHEN pos <= n - n % {BATCH} THEN 1 ELSE 0 END AS INT)
                   AS in_full_batch
        FROM ranked ORDER BY bucket, doc_id""",
)
def q_aspect_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every third document becomes an image with deterministic (w, h);
    the full assignment + batch numbering + drop flags, row for row."""
    register_views(spark, sf_dir, ["documents"])
    dims = spark.sql(_DIMS_SQL)
    return bucket_batches(dims).orderBy("bucket", "doc_id")
