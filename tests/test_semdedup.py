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
