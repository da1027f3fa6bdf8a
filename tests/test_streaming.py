"""Structured Streaming tests: windowed event aggregation parity with the
batch operator, and file-arrival catalog ingest."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dronedb_spark.streaming.ingest import stream_events_hourly, stream_ingest
from dronedb_spark.tables import load


def test_stream_events_hourly_matches_batch(spark, sf_dir, tmp_path):
    events = load(spark, sf_dir, "events")
    # stage the batch table as files so readStream can consume it
    src = str(tmp_path / "events_stream")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = stream_events_hourly(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hourly_test").collect()
    }
    want = {
        (r["hour"], r["event_type"]): (r["n"], r["sum_value"])
        for r in events.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(14,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_stream_ingest_files(spark, tmp_path):
    from dronedb_spark.catalog.store import DatasetCatalog

    root = tmp_path / "ds"
    root.mkdir()
    (root / "one.txt").write_text("1")
    cat = DatasetCatalog.init(spark, str(root))
    q = stream_ingest(
        spark,
        str(root) + "/*.txt",
        cat,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    paths = {r["path"] for r in cat.entries().collect()}
    assert "one.txt" in paths


def test_stream_dedup_matches_batch(spark, sf_dir, tmp_path):
    from dronedb_spark.streaming.dedup import stream_dedup_exact

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 600).alias("ts"),
    )
    src = str(tmp_path / "docs_stream")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = stream_dedup_exact(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = spark.sql("SELECT content_hash FROM dedup_test").collect()
    got_hashes = [r["content_hash"] for r in got]
    want_hashes = {
        r["h"] for r in docs.select(F.md5("text").alias("h")).distinct().collect()
    }
    # one output row per distinct content hash, each exactly once
    assert len(got_hashes) == len(set(got_hashes)) == len(want_hashes)
    assert set(got_hashes) == want_hashes


def test_stream_static_enrichment_matches_batch(spark, sf_dir, tmp_path):
    from dronedb_spark.streaming.ingest import stream_enriched_events

    events = load(spark, sf_dir, "events")
    users = (
        events.select("user_id")
        .distinct()
        .withColumn("tier", F.when(F.col("user_id") % 3 == 0, "gold").otherwise("std"))
    )
    src = str(tmp_path / "ev_enrich")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = stream_enriched_events(stream, users)
    q = (
        out.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["hour_start"], r["tier"]): (r["n"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM enrich_test").collect()
    }
    want = {
        (r["hour_start"], r["tier"]): (r["n"], round(r["sum_value"], 6))
        for r in events.join(users, "user_id", "left")
        .groupBy(F.window("ts", "1 hour").alias("w"), "tier")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("hour_start"), "tier", "n", "sum_value")
        .collect()
    }
    assert got == want


def test_stream_stream_attribution_matches_batch(spark, sf_dir, tmp_path):
    from dronedb_spark.streaming.joins import attribution_batch, stream_attribution

    events = load(spark, sf_dir, "events")
    src = str(tmp_path / "events_ss")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = stream_attribution(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("attr_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["view_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM attr_test").collect()
    }
    want = {
        (r["view_id"], r["click_id"])
        for r in attribution_batch(events).collect()
    }
    assert got == want and len(want) > 0


def test_stream_hll_registers_match_batch(spark, sf_dir, tmp_path):
    """The streaming HLL aggregate in complete mode must equal the batch
    sketch over the same data — max-fold state is order-insensitive."""
    from dronedb_spark.streaming.dedup import stream_hll_registers
    from dronedb_spark.tables import load
    from dronedb_spark.text.sketch import hll_token_registers

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    # two files → at least two arrival chunks
    docs.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = stream_hll_registers(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("hll_regs")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket"], r["max_rho"])
        for r in spark.sql("SELECT * FROM hll_regs").collect()
    }
    want = {
        (r["bucket"], r["max_rho"])
        for r in hll_token_registers(docs).collect()
    }
    assert got == want and len(want) > 20


def test_stream_cms_sketch_matches_batch(spark, sf_dir, tmp_path):
    """The streaming CMS aggregate in complete mode must equal the
    batch sketch over the same data — sum-fold state is
    order-insensitive."""
    from dronedb_spark.streaming.dedup import stream_cms_sketch
    from dronedb_spark.tables import load
    from dronedb_spark.text.sketch import cms_token_sketch

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_cms_src")
    docs.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = stream_cms_sketch(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cms_counters")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["row"], r["col"], r["cnt"])
        for r in spark.sql("SELECT * FROM cms_counters").collect()
    }
    want = {
        (r["row"], r["col"], r["cnt"])
        for r in cms_token_sketch(docs).collect()
    }
    assert got == want and len(want) > 100


def test_stream_incremental_probe_matches_batch(spark, sf_dir, tmp_path):
    """The stream-static band probe in complete mode must equal the
    batch probe's hit rows on the same inputs (stream arrives in two
    chunks; the store is static)."""
    from pyspark.sql import functions as F

    from dronedb_spark.streaming.dedup import stream_incremental_probe
    from dronedb_spark.tables import load
    from dronedb_spark.text.dedup import band_store, incremental_neardup

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    store_docs = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        store_docs.filter(F.col("doc_id") % 11 == 1).select(
            (F.col("doc_id") + 5000000).alias("doc_id"), "text"
        )
    )
    store = band_store(store_docs)
    src = str(tmp_path / "inc_batch_src")
    batch.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        stream_incremental_probe(stream, store)
        .writeStream.format("memory")
        .queryName("inc_probe")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    triples = spark.sql("SELECT * FROM inc_probe").collect()
    per_doc: dict[int, dict] = {}
    for r in triples:
        d = per_doc.setdefault(r["batch_doc"], {"docs": set(), "bands": set()})
        d["docs"].add(r["doc_id"])
        d["bands"].add(r["band_id"])
    got = {
        (bd, len(v["docs"]), len(v["bands"]), min(v["docs"]))
        for bd, v in per_doc.items()
    }
    want = {
        (r["doc_id"], r["n_corpus_hits"], r["n_hit_bands"], r["dup_of"])
        for r in incremental_neardup(batch, store).filter("is_corpus_dup").collect()
    }
    assert got == want and len(want) > 0


def test_stream_incremental_probe_watermarked_state_bound(spark, sf_dir, tmp_path):
    """The long-lived runtime path: with an event-time column the
    triple dedup runs under a watermark (bounded state) and still
    yields exactly the batch twin's hit rows."""
    from pyspark.sql import functions as F

    from dronedb_spark.streaming.dedup import stream_incremental_probe
    from dronedb_spark.tables import load
    from dronedb_spark.text.dedup import band_store, incremental_neardup

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    store_docs = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        store_docs.filter(F.col("doc_id") % 11 == 1).select(
            (F.col("doc_id") + 5000000).alias("doc_id"), "text"
        )
    )
    stamped = batch.withColumn(
        "ingest_ts",
        F.to_timestamp(F.lit("2026-08-14 12:00:00")) + F.make_interval(
            secs=F.col("doc_id") % 60
        ),
    )
    store = band_store(store_docs)
    src = str(tmp_path / "inc_batch_wm_src")
    stamped.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(stamped.schema).parquet(src)
    q = (
        stream_incremental_probe(stream, store, event_time="ingest_ts")
        .writeStream.format("memory")
        .queryName("inc_probe_wm")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    triples = spark.sql("SELECT * FROM inc_probe_wm").collect()
    per_doc: dict[int, dict] = {}
    for r in triples:
        d = per_doc.setdefault(r["batch_doc"], {"docs": set(), "bands": set()})
        d["docs"].add(r["doc_id"])
        d["bands"].add(r["band_id"])
    got = {
        (bd, len(v["docs"]), len(v["bands"]), min(v["docs"]))
        for bd, v in per_doc.items()
    }
    want = {
        (r["doc_id"], r["n_corpus_hits"], r["n_hit_bands"], r["dup_of"])
        for r in incremental_neardup(batch, store).filter("is_corpus_dup").collect()
    }
    assert got == want and len(want) > 0


def test_stream_url_dedup_matches_batch(spark, sf_dir, tmp_path):
    from dronedb_spark.streaming.dedup import stream_url_dedup
    from dronedb_spark.text.urls import canonicalize, with_url

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") % 600).alias("ts"),
    )
    src = str(tmp_path / "url_stream")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = stream_url_dedup(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("url_dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = [r["canonical_url"] for r in spark.sql(
        "SELECT canonical_url FROM url_dedup_test").collect()]
    want = {
        r["canonical_url"]
        for r in canonicalize(with_url(docs)).select("canonical_url").distinct().collect()
    }
    # one output row per canonical key, each exactly once
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want


def test_stream_paragraph_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Stream survivors (availableNow over file chunks) carry exactly
    the batch twin's kept-paragraph hash set: store dups never emit,
    each new paragraph emits once."""
    from pyspark.sql import functions as F

    from dronedb_spark.streaming.dedup import stream_paragraph_dedup
    from dronedb_spark.tables import load
    from dronedb_spark.text.paradedup import (
        _derived_pages,
        paragraph_occurrences,
        paragraph_store,
    )

    docs = load(spark, sf_dir, "documents")
    pages = _derived_pages(docs)
    store_pages = pages.filter(F.col("doc_id") % 3 != 0)
    batch = pages.filter(F.col("doc_id") % 3 == 0)
    store = paragraph_store(store_pages)

    src = str(tmp_path / "para_stream_src")
    batch.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        stream_paragraph_dedup(stream, store)
        .writeStream.format("memory")
        .queryName("para_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [r["phash"] for r in spark.sql("SELECT phash FROM para_stream").collect()]
    assert len(got) == len(set(got))  # each survivor exactly once

    occ = paragraph_occurrences(batch).withColumn("phash", F.md5("para"))
    want = {
        r["phash"]
        for r in occ.join(store, "phash", "left_anti")
        .select("phash")
        .distinct()
        .collect()
    }
    assert set(got) == want and len(want) > 0


def test_stream_substring_probe_matches_batch(spark, sf_dir, tmp_path):
    """Streamed anchor-store hits (availableNow over file chunks) carry
    exactly the batch probe's duplicated (doc_id, pos) set: positions
    covered by a corpus-indexed k-gram emit once, everything else never."""
    from pyspark.sql import functions as F

    from dronedb_spark.streaming.dedup import stream_substring_probe
    from dronedb_spark.tables import load
    from dronedb_spark.text.substring import (
        anchor_kgrams,
        substring_anchor_store,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    store_docs = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0).unionByName(
        store_docs.filter(F.col("doc_id") % 7 == 1).select(
            (F.col("doc_id") + 5000000).alias("doc_id"), "text"
        )
    )
    store = substring_anchor_store(store_docs)

    src = str(tmp_path / "substr_stream_src")
    batch.repartition(3).write.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)
    q = (
        stream_substring_probe(stream, store)
        .writeStream.format("memory")
        .queryName("substr_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (r["doc_id"], r["pos"])
        for r in spark.sql("SELECT doc_id, pos FROM substr_stream").collect()
    ]
    assert len(got) == len(set(got))  # each hit position exactly once
    want = {
        (r["doc_id"], r["pos"])
        for r in anchor_kgrams(batch)
        .join(store, "ah")
        .select("doc_id", "pos")
        .distinct()
        .collect()
    }
    assert set(got) == want and len(want) > 0


def test_stream_image_probe_matches_batch(spark, tmp_path):
    """Streaming dHash probe (stream-static band join) emits exactly
    the batch probe's hit triples on the same store/batch split."""
    from dronedb_spark.multimodal.phash import (
        _PH_MAX_DF,
        _PH_N_PAIR,
        _PH_NOVEL,
        _gen_ph_png,
        dhash_band_store,
    )
    from dronedb_spark.streaming.dedup import stream_image_probe
    from dronedb_spark.tables import spread

    store_ids = [i for i in range(2 * _PH_N_PAIR) if i % 2 == 0]
    batch_ids = [i for i in range(2 * _PH_N_PAIR) if i % 2 == 1] + [
        100 + j for j in range(_PH_NOVEL)
    ]
    store_media = _gen_ph_png(
        spread(spark.createDataFrame([(int(i),) for i in store_ids], "id long"))
    )
    batch_media = _gen_ph_png(
        spread(spark.createDataFrame([(int(i),) for i in batch_ids], "id long"))
    )
    store = dhash_band_store(store_media, max_df=_PH_MAX_DF)

    src = str(tmp_path / "media")
    batch_media.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).option("maxFilesPerTrigger", 1).parquet(src)
    out = stream_image_probe(stream, store)
    got = []
    q = (
        out.writeStream.foreachBatch(
            lambda d, _eid: got.extend(tuple(r) for r in d.collect())
        )
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    # the same plan runs batch when fed static frames — that IS the twin
    want = {tuple(r) for r in stream_image_probe(batch_media, store).collect()}
    assert set(got) == want and len(want) > 0
