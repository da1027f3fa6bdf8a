"""Streaming containment probe — the containment family's continuous
daily-ingest runtime (the ``stream_substring_probe`` shape for
``text/containment.py``): arriving documents shingle per microbatch
(stateless narrow work — split, zip_with slices, ``array_distinct``
BEFORE the explode so per-doc shingle sets never need a streaming
aggregation), and shingles already in the persisted build-capped
postings store emit (src_id, dst_id, s) hit triples via a STREAM-STATIC
inner join — the stored corpus never re-shingles, and bucketed on the
shingle the store side never reshuffles per trigger.

The containment rollup (distinct-shared counts, the combined
store+batch df cap, the n_src denominator, the ≥80% verdict) is
corpus-level arithmetic over the triples and runs downstream in the
batch layer — exactly where ``incremental_containment`` computes it.
The batch-side df refinement (a shingle frequent only across tonight's
whole batch) is not applied per trigger — batch-wide frequency is not
streaming-expressible without unbounded state; the nightly batch probe
applies it, the same caveat the substring runtime documents.

tests/test_stream_containment.py pins stream triples == batch triples
across arbitrary microbatch splits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dronedb_spark.text.dedup import _shingle_df


def stream_containment_probe(
    batch_stream: DataFrame, postings: DataFrame
) -> DataFrame:
    """(src_id, dst_id, s): every (new doc, stored doc) pair sharing a
    stored shingle — the raw evidence rows of the containment probe,
    one stream-static join per trigger.  ``postings`` may be the
    containment store's postings table verbatim (``doc_id`` column) or
    an already-renamed ``dst_id`` frame — the two halves of the family
    compose without a manual rename."""
    if "dst_id" not in postings.columns:
        postings = postings.withColumnRenamed("doc_id", "dst_id")
    probe = _shingle_df(batch_stream).select(
        "doc_id", F.explode(F.array_distinct("sh")).alias("s")
    )
    return probe.join(postings, "s").select(
        F.col("doc_id").alias("src_id"),
        F.col("dst_id"),
        "s",
    )
