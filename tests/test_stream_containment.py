"""Streaming containment triples == batch triples (streaming/
containment.py vs the text/containment.py store probe's join), across
arbitrary microbatch splits."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.streaming.containment import stream_containment_probe
from dronedb_spark.tables import load
from dronedb_spark.text.containment import (
    _distinct_shingles,
    _excerpt_batch,
    write_containment_store,
)


def test_stream_triples_match_batch(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    store_path = str(tmp_path / "store")
    write_containment_store(docs, store_path)
    postings = spark.read.parquet(store_path + "/postings").select(
        "s", F.col("doc_id").alias("dst_id")
    )

    batch = _excerpt_batch(docs)
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    got = []

    def absorb(df, _eid):
        got.extend((r["src_id"], r["dst_id"], r["s"]) for r in df.collect())

    # three id-sliced appends, one availableNow run each (excerpt ids
    # are ≡ 0 mod 10, so slice on the tens digit)
    for sl in [0, 1, 2]:
        part = batch.filter(F.expr(f"(doc_id DIV 10) % 3 = {sl}"))
        if part.isEmpty():
            continue
        part.coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_containment_probe(
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                ).parquet(src),
                postings,
            )
            .writeStream.foreachBatch(absorb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    want = {
        (r["doc_id"], r["dst_id"], r["s"])
        for r in _distinct_shingles(batch)
        .join(postings, "s")
        .select("doc_id", "dst_id", "s")
        .collect()
    }
    assert set(got) == want and len(got) == len(want)
    assert want  # the planted excerpts genuinely hit the store
