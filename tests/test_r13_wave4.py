"""Round-13 wave-4 operators: the SimHash store + incremental probe,
its streaming runtime, and the attribution 10x twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.text.simhash import (
    PROBE_OFFSET,
    _rekeyed_batch,
    incremental_simhash_probe,
    probe_band_prefixes,
    simhash_bands,
    simhash_match_triples,
    simhash_signatures,
    write_simhash_store,
)


def test_simhash_probe_finds_planted_rescrapes(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "store")
    write_simhash_store(docs, path)
    out = incremental_simhash_probe(spark, path, _rekeyed_batch(docs)).collect()
    pairs = {(r["src_id"], r["dst_id"]): r["hamming"] for r in out}
    planted = [r["doc_id"] for r in docs.filter(F.col("doc_id") % 10 == 0).collect()]
    assert planted
    for d in planted:
        assert pairs.get((d + PROBE_OFFSET, d)) == 0  # self at Hamming 0


def test_simhash_probe_prune_equals_full_store(spark, sf_dir, tmp_path):
    """Partition pruning must lose nothing: the pruned probe equals the
    band join against the FULL store."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "store")
    write_simhash_store(docs, path)
    batch = _rekeyed_batch(docs)
    pruned = sorted(
        tuple(r) for r in incremental_simhash_probe(spark, path, batch).collect()
    )
    full = sorted(
        tuple(r)
        for r in simhash_match_triples(
            spark.read.parquet(path), simhash_bands(simhash_signatures(batch))
        ).collect()
    )
    assert pruned == full and pruned
    keys = probe_band_prefixes(simhash_bands(simhash_signatures(batch)))
    assert len(keys) <= 64


def test_stream_simhash_probe_matches_batch(spark, sf_dir, tmp_path):
    from dronedb_spark.streaming.simhash import stream_simhash_probe

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "store")
    write_simhash_store(docs, path)
    batch = _rekeyed_batch(docs)
    want = sorted(
        tuple(r) for r in incremental_simhash_probe(spark, path, batch).collect()
    )

    src = str(tmp_path / "src")
    got: list[tuple] = []

    def absorb(df, _eid):
        got.extend(tuple(r) for r in df.collect())

    for sl in [0, 1, 2]:
        part = batch.filter(F.expr(f"doc_id % 3 = {sl}"))
        if part.isEmpty():
            continue
        part.coalesce(1).write.mode("append").parquet(src)
        q = stream_simhash_probe(
            spark,
            spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
            path,
            absorb,
            str(tmp_path / "ckpt"),
        )
        q.awaitTermination(240)

    assert sorted(got) == want
    assert got


def test_attribution_10x_copies_identical(spark, sf_dir):
    from dronedb_spark.suite import load_all

    reg = load_all()
    one = {
        r["channel"]: (r["n_journeys"], r["first_touch"], r["last_touch"],
                       r["linear_micro"])
        for r in reg["attribution_report"].spark_fn(spark, sf_dir).collect()
    }
    big = reg["attribution_report_10x"].spark_fn(spark, sf_dir).collect()
    assert {r["copy"] for r in big} == set(range(10))
    for r in big:
        assert one[r["channel"]] == (
            r["n_journeys"], r["first_touch"], r["last_touch"], r["linear_micro"]
        )
