"""Streaming SimHash near-dup probe — the family's arrival-time
runtime, completing it next to the fuzzy/containment/decontam streams.

Shape difference, stated: the signature computation is a per-document
aggregate (64 bit-sums via groupBy(doc_id)), which in a raw streaming
DataFrame would demand a state store — but a document arrives WHOLE in
one row, so each microbatch is self-contained and the runtime is
``foreachBatch``: per trigger, compute the batch's signatures with the
EXACT batch code path, band-join the static persisted store
(partition-pruned via the ≤64 (band, b0) keys), emit match triples.
ZERO streaming state; the state store never engages.

tests/test_r13_wave4.py pins foreachBatch-accumulated triples == the
batch probe across arbitrary microbatch splits; the
``stream_simhash_probe_twin`` check gates the batch twin against the
brute-force DuckDB oracle.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load
from dronedb_spark.text.simhash import (
    HAM_MAX,
    _pair_hamming,
    _rekeyed_batch,
    _signature_select,
    incremental_simhash_probe,
    PROBE_OFFSET,
)


def stream_simhash_probe(
    spark: SparkSession,
    probe_stream: DataFrame,
    store_path: str,
    absorb: Callable[[DataFrame, int], None],
    checkpoint: str,
    max_dist: int = HAM_MAX,
):
    """Start the foreachBatch probe: per microbatch, the batch probe
    body runs verbatim (signatures → pruned store read → band join →
    Hamming verify) and ``absorb`` receives the match triples."""

    def _per_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        absorb(
            incremental_simhash_probe(spark, store_path, batch_df, max_dist),
            epoch_id,
        )

    return (
        probe_stream.writeStream.foreachBatch(_per_batch)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


_TWIN_ORACLE = f"""
    WITH sig AS ({_signature_select("duckdb")}),
    batch AS (
        SELECT doc_id + {PROBE_OFFSET} AS doc_id, simhash FROM sig
        WHERE doc_id % 10 = 0),
    pairs AS (
        SELECT b.doc_id AS src_id, s.doc_id AS dst_id,
               b.simhash AS ha, s.simhash AS hb
        FROM batch b, sig s),
    hits AS (
        SELECT src_id, dst_id,
               CAST({_pair_hamming("duckdb")} AS INT) AS hamming
        FROM pairs WHERE {_pair_hamming("duckdb")} <= {HAM_MAX})
    SELECT hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT src_id) AS BIGINT) AS n_src
    FROM hits GROUP BY hamming ORDER BY hamming"""


@check("stream_simhash_probe_twin", oracle=_TWIN_ORACLE)
def q_stream_simhash_probe_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The probe's batch twin (identical code path through the store):
    the Hamming histogram of all match triples — pair count and
    distinct arriving docs per distance.  Scratch-dir check."""
    import tempfile

    from dronedb_spark.text.simhash import write_simhash_store

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    with tempfile.TemporaryDirectory() as td:
        path = td + "/simhash_store"
        write_simhash_store(docs, path)
        out = (
            incremental_simhash_probe(spark, path, _rekeyed_batch(docs))
            .groupBy("hamming")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
                F.countDistinct("src_id").cast("bigint").alias("n_src"),
            )
        )
        rows = [
            (r["hamming"], r["n_pairs"], r["n_src"])
            for r in out.orderBy("hamming").collect()
        ]
    return spark.createDataFrame(rows, "hamming int, n_pairs bigint, n_src bigint")
