"""Round-13 breadth pins: the source x eval-set contamination matrix
(text/contamatrix.py) and the streaming cosine decontamination probe
(streaming/cosdecontam.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load


def test_matrix_cells_sum_to_report_union(spark, sf_dir):
    """Every flagged item has exactly one source, so summing the
    matrix's n_items over sources per set must reproduce the composed
    report's per-set any-channel union (n_any)."""
    from dronedb_spark.text.contamatrix import contamination_matrix
    from dronedb_spark.text.decontamreport import decontam_report

    docs = load(spark, sf_dir, "documents")
    vecs = load(spark, sf_dir, "embeddings")
    m = contamination_matrix(docs, vecs)
    per_set = {
        r["set_id"]: r["s"]
        for r in m.groupBy("set_id").agg(F.sum("n_items").alias("s")).collect()
    }
    report = {r["set_id"]: r["n_any"] for r in decontam_report(docs, vecs).collect()}
    assert per_set == report and report


def test_matrix_spine_is_complete_and_ppm_exact(spark, sf_dir):
    from dronedb_spark.text.contamatrix import contamination_matrix

    docs = load(spark, sf_dir, "documents")
    vecs = load(spark, sf_dir, "embeddings")
    rows = contamination_matrix(docs, vecs).collect()
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources * 3  # full spine, zero cells included
    for r in rows:
        assert r["leak_ppm"] == r["chars_flagged"] * 1_000_000 // r["source_chars"]
        assert 0 <= r["n_items"] <= r["n_source_items"]


def test_excerpt_attributes_to_parent_source(spark):
    """A planted excerpt (id >= 1e9) carries its parent document's
    source in the audited corpus."""
    from dronedb_spark.text.contamatrix import corpus_with_source
    from dronedb_spark.text.decontamreport import EVAL_EVERY, EVAL_OFFSET, EXCERPT_OFFSET

    eval_id = EVAL_EVERY + EVAL_OFFSET  # an eval member by construction
    docs = spark.createDataFrame(
        [(eval_id, "x " * 120, "en", "parent-src", 240),
         (1, "y y", "en", "other-src", 3)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = {r["item_id"]: r for r in corpus_with_source(docs).collect()}
    assert rows[eval_id + EXCERPT_OFFSET]["source"] == "parent-src"
    assert len(rows) == 3  # 2 docs + 1 excerpt


def test_stream_cosine_probe_matches_batch_across_splits(spark, sf_dir, tmp_path):
    """The kernel is strictly per-item, so any microbatch split of the
    arrivals yields exactly the batch rows."""
    from dronedb_spark.streaming.cosdecontam import stream_cosine_probe
    from dronedb_spark.text.decontamreport import EVAL_EVERY, EVAL_OFFSET, _set_col

    vecs = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ev = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % EVAL_EVERY == EVAL_OFFSET)
        .select(_set_col("vec_id").alias("set_id"), "embedding")
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    got = []

    def absorb(df, _eid):
        got.extend(
            (r["item_id"], r["set_id"], r["n_members"], r["max_micro"])
            for r in df.collect()
        )

    for sl in [0, 1, 2]:
        part = vecs.filter(F.expr(f"vec_id % 3 = {sl}"))
        if part.isEmpty():
            continue
        part.coalesce(1).write.mode("append").parquet(src)
        q = (
            stream_cosine_probe(
                spark.readStream.schema(spark.read.parquet(src).schema).parquet(src),
                ev,
            )
            .writeStream.foreachBatch(absorb)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)

    want = [
        (r["item_id"], r["set_id"], r["n_members"], r["max_micro"])
        for r in stream_cosine_probe(vecs, ev).collect()
    ]
    assert sorted(got) == sorted(want)
    assert got  # eval members self-hit at cos == 1


def test_cosine_probe_self_hit_is_exact(spark, sf_dir):
    """Every eval member appears in its own set's hits with
    max_micro == 1_000_000 (cos(v, v) == 1 exactly after rounding)."""
    from dronedb_spark.streaming.cosdecontam import stream_cosine_probe
    from dronedb_spark.text.decontamreport import EVAL_EVERY, EVAL_OFFSET, _set_col

    vecs = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ev = (
        vecs.filter(F.col("vec_id") % EVAL_EVERY == EVAL_OFFSET)
        .select(_set_col("vec_id").alias("set_id"), "embedding")
    )
    hits = {
        (r["item_id"], r["set_id"]): r["max_micro"]
        for r in stream_cosine_probe(vecs, ev).collect()
    }
    members = [
        (r["vec_id"], r["set_id"])
        for r in vecs.filter(F.col("vec_id") % EVAL_EVERY == EVAL_OFFSET)
        .select("vec_id", _set_col("vec_id").alias("set_id"))
        .collect()
    ]
    assert members
    for key in members:
        assert hits.get(key) == 1_000_000
