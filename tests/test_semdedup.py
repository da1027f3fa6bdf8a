"""SemDeDup laws (vectors/semdedup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.vectors.semdedup import (
    _COPY_OFFSET,
    _with_planted_copies,
    semdedup_flags,
)


def test_planted_copies_and_only_they_are_removed(spark, sf_dir):
    corpus = _with_planted_copies(load(spark, sf_dir, "embeddings"))
    flags = semdedup_flags(corpus).collect()
    removed = {r["vec_id"] for r in flags if r["is_dup"] == 1}
    n_copies = sum(1 for r in flags if r["vec_id"] >= _COPY_OFFSET)
    # every removed vector is a planted copy, and every copy is removed
    # (cosine to its original is scale-invariant 1.0 >= tau; nothing
    # natural reaches tau)
    assert removed == {
        r["vec_id"] for r in flags if r["vec_id"] >= _COPY_OFFSET
    }
    assert len(removed) == n_copies > 0


def test_copy_lands_in_its_originals_cell(spark, sf_dir):
    corpus = _with_planted_copies(load(spark, sf_dir, "embeddings"))
    flags = semdedup_flags(corpus)
    cells = {r["vec_id"]: r["cell"] for r in flags.collect()}
    for vid, cell in cells.items():
        if vid >= _COPY_OFFSET:
            assert cell == cells[vid - _COPY_OFFSET]


def test_threshold_above_one_removes_nothing(spark, sf_dir):
    corpus = _with_planted_copies(load(spark, sf_dir, "embeddings"))
    flags = semdedup_flags(corpus, tau_micro=1_000_001)
    assert flags.agg(F.sum("is_dup")).collect()[0][0] == 0


def test_incremental_removes_copies_keeps_originals(spark, sf_dir, tmp_path):
    """Daily SemDeDup: planted copies of STORE vectors are removed by
    the store match alone (corpus-wins), held-out originals survive,
    and the batch probe never re-scores store-vs-store."""
    from dronedb_spark.vectors.ivf import _centroids
    from dronedb_spark.vectors.semdedup import (
        incremental_semdedup,
        write_semdedup_store,
    )

    emb = load(spark, sf_dir, "embeddings")
    store_docs = emb.filter(F.col("vec_id") % 4 != 0)
    copies = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * F.lit(1.25)
        ).alias("embedding"),
    )
    held = emb.filter((F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= 8)).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    batch = copies.unionByName(held)
    cents = _centroids(emb).select(
        "cid", F.col("c_emb").cast("array<double>").alias("c_emb")
    )
    path = str(tmp_path / "sem_store")
    write_semdedup_store(store_docs, path, cents)
    roll = incremental_semdedup(spark, path, batch, cents).collect()
    # every multiple of 20 is a multiple of 4, so each copy's ORIGINAL
    # rides in the same batch with a lower id (keep-first removes the
    # copy) — except vec 0's copy, whose original is a centroid absent
    # from both store and batch: it must SURVIVE.  Held-out originals
    # all survive (no natural pair reaches the threshold).
    want_removed = {
        int(r["vec_id"]) + _COPY_OFFSET
        for r in emb.filter(
            (F.col("vec_id") % 20 == 0) & (F.col("vec_id") >= 8)
        ).select("vec_id").collect()
    }
    total_removed = sum(r["n_removed"] for r in roll)
    removed_sum = sum(r["removed_id_sum"] for r in roll)
    assert total_removed == len(want_removed) > 0
    assert removed_sum == sum(want_removed)
