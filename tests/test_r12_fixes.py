"""Round-12 fix pins: the containment probe's engine-side bucket
derivation (≤ n_buckets rows ever reach the driver), the streaming
containment probe composing with the store's postings verbatim, the
struct-MAX survivor selection (domain-safe for full-bigint ids), the
PR-curve zero-positive guard, and the Benford finite-value guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dronedb_spark.tables import load


# --------------------------- containment probe: bounded driver collect


def test_probe_buckets_bounded_and_correct(spark, sf_dir):
    """The collected probe set is distinct BUCKET ids (≤ n_buckets
    rows), agrees with the driver-side bucket twin, and the probe's
    answer is unchanged from the whole-corpus reference."""
    from dronedb_spark.text.containment import (
        _distinct_shingles,
        _sh_bucket,
        probe_buckets,
    )

    docs = load(spark, sf_dir, "documents").limit(40)
    sh = _distinct_shingles(docs)
    n_shingles = sh.select("s").distinct().count()
    for n_buckets in (4, 64):
        got = probe_buckets(sh, n_buckets)
        assert len(got) <= n_buckets
        want = sorted(
            {_sh_bucket(r["s"], n_buckets) for r in sh.select("s").collect()}
        )
        assert got == want
    assert n_shingles > 64  # the bound is real: far fewer rows collected


def test_incremental_containment_still_finds_excerpts(spark, sf_dir, tmp_path):
    """End-to-end re-pin after the bucket-derivation rewrite: every
    planted excerpt still surfaces its host at ≥80% containment."""
    from dronedb_spark.text.containment import (
        EXCERPT_OFFSET,
        _excerpt_batch,
        incremental_containment,
        write_containment_store,
    )

    docs = load(spark, sf_dir, "documents").limit(60)
    path = str(tmp_path / "store")
    write_containment_store(docs, path)
    hits = incremental_containment(
        spark, path, _excerpt_batch(docs)
    ).collect()
    assert hits, "planted excerpts must produce containment pairs"
    srcs = {r["src_id"] for r in hits}
    hosts = {
        (r["src_id"], r["dst_id"]) for r in hits
    }
    # at least one excerpt points at exactly its own host document
    assert any(s - EXCERPT_OFFSET == d for s, d in hosts)
    assert all(s >= EXCERPT_OFFSET for s in srcs)


# ------------------- streaming probe composes with the store verbatim


def test_stream_probe_accepts_store_postings(spark, sf_dir, tmp_path):
    """write_containment_store's postings frame (doc_id column, bkt
    partition column) feeds stream_containment_probe directly — the
    probe renames internally, no caller-side rename."""
    from dronedb_spark.streaming.containment import stream_containment_probe
    from dronedb_spark.text.containment import (
        _distinct_shingles,
        _excerpt_batch,
        write_containment_store,
    )

    docs = load(spark, sf_dir, "documents").limit(40)
    path = str(tmp_path / "store")
    write_containment_store(docs, path)
    raw_postings = spark.read.parquet(path + "/postings")
    assert "doc_id" in raw_postings.columns  # the store's native schema
    batch = _excerpt_batch(docs)
    got = {
        (r["src_id"], r["dst_id"], r["s"])
        for r in stream_containment_probe(batch, raw_postings).collect()
    }
    want = {
        (r["doc_id"], r["dst_id"], r["s"])
        for r in _distinct_shingles(batch)
        .join(
            raw_postings.select("s", F.col("doc_id").alias("dst_id")), "s"
        )
        .collect()
    }
    assert got == want and got


# ------------------------- survivor selection: full-bigint id domain


def test_cluster_survivors_large_id_domain(spark):
    """doc_ids beyond 999 999 999 999 and n_chars beyond 10¹² — the
    domain that silently inverted the old lpad packing — still follow
    longest-wins, ties-to-smallest-id."""
    from dronedb_spark.text.clusteraudit import cluster_survivors

    base = 2_000_000_000_000  # > the old 999_999_999_999 pack ceiling
    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (base + 1, text, 5_000_000_000_000),  # longest → must win
            (base + 2, text, 7),
            (base + 3, text + " extra tail words here", 7),  # singleton
        ],
        "doc_id bigint, text string, n_chars bigint",
    )
    rows = {r["doc_id"]: r["keep"] for r in cluster_survivors(docs).collect()}
    # base+3 shares no LSH band (different tail) → self-kept singleton;
    # inside the 2-member cluster the 5·10¹²-char member wins (the old
    # 12-digit lpad pack truncated it to a loss)
    assert rows[base + 1] is True
    assert rows[base + 2] is False
    assert rows[base + 3] is True


def test_cluster_survivors_tie_low_id(spark):
    from dronedb_spark.text.clusteraudit import cluster_survivors

    base = 3_000_000_000_000
    text = "one two three four five six seven eight nine ten eleven"
    docs = spark.createDataFrame(
        [(base + 9, text, 50), (base + 2, text, 50), (base + 5, text, 10)],
        "doc_id bigint, text string, n_chars bigint",
    )
    rows = {r["doc_id"]: r["keep"] for r in cluster_survivors(docs).collect()}
    assert rows == {base + 2: True, base + 9: False, base + 5: False}


# ------------------------------------ PR curve: zero-positive corpus


def test_pr_curve_all_negative_yields_null_recall(spark):
    """A corpus with zero positive labels: recall is undefined — every
    row emits NULL recall_micro (no crash, no engine divergence), fn is
    0 everywhere, precision is 0."""
    from dronedb_spark.text.evalmetrics import pr_curve

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 20)], "id bigint, v bigint"
    )
    rows = pr_curve(
        df, F.col("v").cast("double") / 100.0, F.lit(False)
    ).collect()
    assert rows
    for r in rows:
        assert r["recall_micro"] is None
        assert r["fn"] == 0 and r["tp"] == 0
        assert r["precision_micro"] == 0


def test_pr_curve_oracle_guard_matches_duckdb():
    """The oracle's CASE guard: DuckDB returns NULL recall on an
    all-negative histogram instead of raising division-by-zero."""
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        """
        WITH hist AS (
            SELECT * FROM (VALUES (5, 0, 3), (9, 0, 1)) t(s, np_s, nn_s)),
        cum AS (
            SELECT s,
                   SUM(np_s) OVER (ORDER BY s DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                   SUM(np_s) OVER () AS n_pos
            FROM hist)
        SELECT CASE WHEN n_pos = 0 THEN NULL
                    ELSE tp * 1000000 // n_pos END AS recall_micro
        FROM cum
        """
    ).fetchall()
    assert [r[0] for r in rows] == [None, None]


# ------------------------------------- Benford: NaN/Inf dirty feeds


def test_benford_skips_nonfinite(spark):
    """NaN (which passes >= 1 in Spark) and Infinity never reach the
    digit histogram; finite rows are counted exactly."""
    from dronedb_spark.operators.benford import benford_digit_audit

    df = spark.createDataFrame(
        [
            (123.0,),
            (float("nan"),),
            (float("inf"),),
            (0.5,),
            (45.0,),
            (47.2,),
        ],
        "amt double",
    )
    rows = {
        r["digit"]: r["n_obs"]
        for r in benford_digit_audit(df, "amt").collect()
    }
    assert rows == {1: 1, 4: 2}


def test_benford_all_nonfinite_empty(spark):
    from dronedb_spark.operators.benford import benford_digit_audit

    df = spark.createDataFrame(
        [(float("nan"),), (float("inf"),)], "amt double"
    )
    assert benford_digit_audit(df, "amt").count() == 0
