"""Drift-decile laws: reference self-bucketing is uniform to ±1, a
planted shift skews the candidate mass into the top buckets, and an
identical candidate population is indistinguishable."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.vectors.drift import decile_edges, drift_decile_counts


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _pop(n, dim, shift=0.0, start=0):
    # distinct deterministic floats per (vec, dim)
    return [
        (start + i, [float(((i * 31 + d * 17) % 1000) / 10.0 + shift) for d in range(dim)])
        for i in range(n)
    ]


def test_reference_buckets_uniform(spark):
    ref = _emb(spark, _pop(200, 4))
    out = drift_decile_counts(ref, ref).collect()
    for r in out:
        assert abs(r["n_ref"] - 20) <= 1, r
        assert r["n_ref"] == r["n_cand"]


def test_planted_shift_skews_top_bucket(spark):
    ref = _emb(spark, _pop(200, 4))
    cand = _emb(spark, _pop(200, 4, shift=60.0, start=10_000))
    out = drift_decile_counts(ref, cand).collect()
    top = sum(r["n_cand"] for r in out if r["bucket"] == 9)
    total = sum(r["n_cand"] for r in out)
    # a +60 shift on a [0,100) population pushes well over half the
    # candidate mass past the reference's 90th percentile
    assert top / total > 0.5
    assert sum(r["n_ref"] for r in out if r["bucket"] == 9) <= total // 4


def test_nine_edges_sorted_per_dim(spark):
    ref = _emb(spark, _pop(100, 3))
    edges = {r["pos"]: r["edges"] for r in decile_edges(ref).collect()}
    assert set(edges) == {0, 1, 2}
    for e in edges.values():
        assert len(e) == 9 and e == sorted(e)


def test_ks_flags_fire_on_shift_and_stay_quiet_on_same(spark):
    from dronedb_spark.vectors.drift import drift_ks_flags

    ref = _emb(spark, _pop(200, 4))
    same = _emb(spark, _pop(200, 4, start=5000))
    shifted = _emb(spark, _pop(200, 4, shift=60.0, start=10_000))
    quiet = drift_ks_flags(ref, same).collect()
    assert sum(r["drifted"] for r in quiet) == 0
    loud = drift_ks_flags(ref, shifted).collect()
    assert all(r["drifted"] == 1 for r in loud)
    # D is a valid rational in [0, 1]
    for r in loud:
        assert 0 <= r["d_num"] <= r["d_den"]
