"""Streaming decontam hit triples == batch triples (streaming/
decontam.py vs the same probe applied to the whole batch), across
arbitrary microbatch splits — the stream-static join carries no state,
so any split of the arrivals must produce exactly the same rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.streaming.decontam import stream_decontam_probe
from dronedb_spark.tables import load
from dronedb_spark.text.decontam import _grams
from dronedb_spark.text.decontamreport import eval_members


def test_stream_triples_match_batch(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = eval_members(load(spark, sf_dir, "documents"))
    bgrams = bench.select(
        "set_id",
        F.explode(_grams(F.split(F.col("text"), " "))).alias("gram"),
    ).distinct()

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    got = []

    def absorb(df, _eid):
        got.extend(
            (r["doc_id"], r["set_id"], r["gram"]) for r in df.collect()
        )

    for sl in [0, 1, 2]:
        part = docs.filter(F.expr(f"doc_id % 3 = {sl}"))
        if part.isEmpty():
            continue
        part.coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_decontam_probe(
                spark.readStream.schema(
                    spark.read.parquet(src).schema
                ).parquet(src),
                bgrams,
            )
            .writeStream.foreachBatch(absorb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    want = [
        (r["doc_id"], r["set_id"], r["gram"])
        for r in stream_decontam_probe(docs, bgrams).collect()
    ]
    assert sorted(got) == sorted(want)
    assert got  # the eval members self-hit: triples exist
