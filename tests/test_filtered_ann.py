"""Filtered-ANN probe-widening laws (vectors/filtered.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.vectors.filtered import filtered_ivf_search
from dronedb_spark.vectors.ivf import ivf_assign
from dronedb_spark.vectors.knn import _dot, _norm


def test_every_result_matches_filter_and_k_respected(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    got = filtered_ivf_search(emb, 0, 3, 10).collect()
    assert len(got) == 10
    labels = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    assert all(labels[r["vec_id"]] == 3 for r in got)
    assert 0 not in {r["vec_id"] for r in got}


def test_rare_label_widens_to_every_needed_cell(spark, sf_dir):
    """Keep only 6 label-3 vectors corpus-wide (< k): the widening rule
    must open every cell that still lacks candidates, so ALL survivors
    return — the filtered search degrades to exact brute force over the
    label instead of silently truncating."""
    emb = load(spark, sf_dir, "embeddings")
    keep = emb.filter(
        (F.col("label") != 3) | (F.col("vec_id") % 7 == 0)
    )
    n_label = keep.filter(F.col("label") == 3).count()
    assert 0 < n_label < 10
    got = {r["vec_id"] for r in filtered_ivf_search(keep, 0, 3, 10).collect()}
    want = {
        r["vec_id"]
        for r in keep.filter(F.col("label") == 3)
        .filter(F.col("vec_id") != 0)
        .collect()
    }
    assert got == want


def test_widened_probe_matches_brute_force_topk_when_enough_probed(spark, sf_dir):
    """Sanity vs exact: the widened-probe result can only differ from
    label-filtered brute force by vectors OUTSIDE the probe set; with
    the fixture's label spread the top-1 from brute force must sit in a
    probed cell whenever its cell ranks first for the query."""
    emb = load(spark, sf_dir, "embeddings")
    got = [r["vec_id"] for r in filtered_ivf_search(emb, 0, 3, 10).collect()]
    # exact brute-force top-10 over the label
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    brute = [
        r["vec_id"]
        for r in emb.filter((F.col("label") == 3) & (F.col("vec_id") != 0))
        .join(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot("embedding", "q_emb") / (_norm("embedding") * _norm("q_emb")), 6
            ).alias("c"),
        )
        .orderBy(F.desc("c"), "vec_id")
        .limit(10)
        .collect()
    ]
    # results are a subset of the label's vectors and ordered by score;
    # overlap with brute force must be non-trivial (probe covers >= k)
    assert len(set(got) & set(brute)) >= 5


def test_multiprobe_bucket_twin_and_superset_recall(spark, sf_dir):
    """The Python bucket fold equals the Spark column on every vector,
    and multi-probe's candidate set strictly contains the single-bucket
    search's — recall can only go up."""
    from dronedb_spark.vectors.ann import (
        _bucket_col,
        _py_bucket,
        ann_multiprobe_search,
        ann_search,
    )

    emb = load(spark, sf_dir, "embeddings")
    rows = emb.withColumn("b", _bucket_col()).select(
        "vec_id", "embedding", "b"
    ).collect()
    for r in rows[:50]:
        assert _py_bucket(r["embedding"]) == r["b"], r["vec_id"]
    single = {r["vec_id"]: r["cos_sim"] for r in ann_search(emb, 0, 5).collect()}
    multi = {r["vec_id"]: r["cos_sim"] for r in ann_multiprobe_search(emb, 0, 5).collect()}
    # multi-probe's top-5 is at least as similar, element for element
    assert sorted(multi.values(), reverse=True) >= sorted(
        single.values(), reverse=True
    )


def test_ann_store_probe_prunes_partitions(spark, sf_dir, tmp_path):
    """The persisted LSH store answers multi-probe identically to the
    in-memory search, reads ONLY the store, and partition-prunes to the
    probe buckets."""
    from dronedb_spark.plans.inspect import formatted
    from dronedb_spark.vectors.ann import (
        ann_multiprobe_search,
        ann_store_multiprobe,
        write_ann_store,
    )

    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ann_store")
    write_ann_store(emb, path)
    q_emb = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    probe = ann_store_multiprobe(spark, path, q_emb, 5, exclude_vec_id=0)
    got = {tuple(r) for r in probe.collect()}
    want = {tuple(r) for r in ann_multiprobe_search(emb, 0, 5).collect()}
    assert got == want and len(got) == 5
    f = formatted(probe)
    locs = [ln for ln in f.splitlines() if "Location:" in ln]
    assert locs and all("ann_store" in ln for ln in locs), locs
    assert "embeddings.parquet" not in f
    part = f[f.index("PartitionFilters"):]
    assert "bucket" in part[:250]


def test_ann_store_incremental_append_equals_full(spark, sf_dir, tmp_path):
    """Store(old) + append(batch) answers multi-probe exactly like
    store(full), and old bucket files survive byte-identical."""
    import os

    from dronedb_spark.vectors.ann import (
        ann_store_multiprobe,
        update_ann_store,
        write_ann_store,
    )

    emb = load(spark, sf_dir, "embeddings")
    inc = str(tmp_path / "inc")
    full = str(tmp_path / "full")
    write_ann_store(emb.filter(F.col("vec_id") % 5 != 0), inc)
    before = {
        os.path.join(d, f): os.path.getsize(os.path.join(d, f))
        for d, _, fs in os.walk(inc)
        for f in fs
        if f.endswith(".parquet")
    }
    update_ann_store(emb.filter(F.col("vec_id") % 5 == 0), inc)
    assert {p: os.path.getsize(p) for p in before} == before
    write_ann_store(emb, full)
    q_emb = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = {
        tuple(r)
        for r in ann_store_multiprobe(spark, inc, q_emb, 5, exclude_vec_id=0).collect()
    }
    want = {
        tuple(r)
        for r in ann_store_multiprobe(spark, full, q_emb, 5, exclude_vec_id=0).collect()
    }
    assert got == want and len(got) == 5
