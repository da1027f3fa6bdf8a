"""Streaming deduplication — exact dedup as a continuous operator.

The batch twin (text/dedup.py:exact_dup_groups) answers "which documents
are duplicates"; this operator answers the pipeline question "emit each
document the FIRST time its content is seen" over an unbounded arriving
stream.  Built on ``dropDuplicatesWithinWatermark``: state holds one
entry per content hash and is evicted once the event-time watermark
passes, so state size is bounded by the dedup horizon — the property
that makes streaming dedup feasible at 100 TB/day (an unbounded
``dropDuplicates`` would accumulate state forever).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_dedup_exact(docs_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First-seen pass-through keyed on content hash, with watermark-bounded
    state.  ``docs_stream`` needs an event-time ``ts`` column."""
    return (
        docs_stream.withColumn("content_hash", F.md5("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )
