"""Round-13 wave-2 operators: multi-touch attribution, split-conformal
coverage, l-diversity, and the Zipf rank-frequency fit."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dronedb_spark.operators.attribution import assign_journeys, attribution_report
from dronedb_spark.tables import load
from dronedb_spark.text.conformal import conformal_coverage
from dronedb_spark.text.kanon import ldiversity_audit
from dronedb_spark.text.powerlaw import token_ranks, zipf_fit


# ---------------------------------------------------------- attribution --


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_attribution_hand_journey(spark):
    """One user: view, click, purchase, signup, purchase, view(dangling).
    Journey 1 = {view, click}; journey 2 = {signup}; the last view has
    no following purchase and must drop."""
    import datetime as dt

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        (1, t(1), 7, "view"),
        (2, t(2), 7, "click"),
        (3, t(3), 7, "purchase"),
        (4, t(4), 7, "signup"),
        (5, t(5), 7, "purchase"),
        (6, t(6), 7, "view"),
    ]
    touches = assign_journeys(_ev(spark, rows)).collect()
    got = {(r["event_id"], r["conv_id"]) for r in touches}
    assert got == {(1, 3), (2, 3), (4, 5)}

    rep = {r["channel"]: r for r in attribution_report(_ev(spark, rows)).collect()}
    assert rep["view"]["first_touch"] == 1 and rep["view"]["last_touch"] == 0
    assert rep["click"]["last_touch"] == 1
    assert rep["signup"]["first_touch"] == 1 and rep["signup"]["last_touch"] == 1
    # linear: journey 1 gives view+click 500000 each; journey 2 signup 1000000
    assert rep["view"]["linear_micro"] == 500000
    assert rep["click"]["linear_micro"] == 500000
    assert rep["signup"]["linear_micro"] == 1000000


def test_attribution_conservation(spark, sf_dir):
    """First/last credits each sum to the number of touched journeys;
    linear micro mass per journey is <= 10^6 (integer-div rounding down)
    and > 10^6 - n_channels."""
    events = load(spark, sf_dir, "events")
    rep = attribution_report(events).collect()
    n_journeys = (
        assign_journeys(events).select("conv_id").distinct().count()
    )
    assert sum(r["first_touch"] for r in rep) == n_journeys
    assert sum(r["last_touch"] for r in rep) == n_journeys
    total_linear = sum(r["linear_micro"] for r in rep)
    assert total_linear <= 1000000 * n_journeys
    assert total_linear > (1000000 - 3) * n_journeys


# ------------------------------------------------------------- conformal --


def test_conformal_finite_sample_guarantee(spark, sf_dir):
    """Split conformal at alpha=0.10 must cover >= ~90% minus sampling
    noise on exchangeable halves — and k must be the ceil formula."""
    row = conformal_coverage(load(spark, sf_dir, "documents")).collect()[0]
    assert row["k"] == math.ceil((row["n_cal"] + 1) * 0.9)
    assert row["coverage_ppm"] >= 850000  # 0.90 - generous noise margin
    assert row["n_covered"] <= row["n_test"]


def test_conformal_qhat_is_kth_order_statistic(spark, sf_dir):
    from dronedb_spark.text.conformal import _scored

    docs = load(spark, sf_dir, "documents")
    row = conformal_coverage(docs).collect()[0]
    cal = sorted(
        r["nc"]
        for r in _scored(docs).filter(F.col("doc_id") % 2 == 0).collect()
    )
    assert row["qhat"] == cal[row["k"] - 1]


# ------------------------------------------------------------ l-diversity --


def test_ldiversity_flags_single_lang_classes(spark):
    rows = [
        # class (s, 0): two langs -> diverse; class (s, 1): one lang x3
        (0, "s", "en", 10),
        (1, "s", "de", 20),
        (2, "s", "en", 110),
        (3, "s", "en", 120),
        (4, "s", "en", 130),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, n_chars long"
    )
    out = ldiversity_audit(docs).collect()[0]
    assert out["n_classes"] == 2
    assert out["n_undiverse_classes"] == 1
    assert out["n_undiverse_docs"] == 3
    assert out["min_diversity"] == 1


# ------------------------------------------------------------------ zipf --


def test_zipf_ranks_deterministic(spark, sf_dir):
    ranked = token_ranks(load(spark, sf_dir, "documents")).collect()
    per_src: dict[str, list] = {}
    for r in ranked:
        per_src.setdefault(r["source"], []).append((r["rank"], r["n"], r["tok"]))
    for src, rows in per_src.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        # frequency non-increasing along rank; ties lexicographic
        for (r1, n1, t1), (r2, n2, t2) in zip(rows, rows[1:]):
            assert n1 > n2 or (n1 == n2 and t1 < t2)


def test_zipf_exact_on_constructed_law(spark):
    """A corpus whose rank-frequency table IS a perfect power law must
    fit slope = the planted exponent exactly (OLS on exact points)."""
    # token t_r appears round(64 / r) times -> y = ln 64 - ln r, slope -1
    rows, did = [], 0
    for r in range(1, 9):
        freq = 64 // r  # exact integers: 64,32,21,16,12,10,9,8
        for _ in range(freq):
            rows.append((did, "s", f"t{r:02d}"))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = zipf_fit(docs).collect()[0]
    # OLS over the exact (ln r, ln floor(64/r)) points, driver-side
    xs = [math.log(r) for r in range(1, 9)]
    ys = [math.log(64 // r) for r in range(1, 9)]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert got["n_ranks"] == 8
    assert got["slope"] == pytest.approx(slope, abs=1e-6)
    assert got["slope"] < -0.9  # near the planted -1
