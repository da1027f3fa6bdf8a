"""Round-13 wave-3 operators: HITS hubs/authorities, CUPED readout,
Kaplan-Meier survival, and PSI length drift."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from dronedb_spark.operators.abtest import cuped_readout, cuped_user_metrics
from dronedb_spark.operators.survival import km_curve, user_lifetimes
from dronedb_spark.tables import load
from dronedb_spark.text.linkgraph import SCALE, hits_over_edges
from dronedb_spark.text.psi import psi_bins


# ----------------------------------------------------------------- HITS --


def _hits_reference(edges, n_iter=4):
    """Pure-Python integerized HITS twin for the pin."""
    doms = sorted({e[0] for e in edges} | {e[1] for e in edges})
    base = SCALE // len(doms)
    h = {d: base for d in doms}
    a = {}
    for _ in range(n_iter):
        a_raw = {d: 0 for d in doms}
        for s, t, w in edges:
            a_raw[t] += w * h[s]
        tot = sum(a_raw.values())
        a = {d: a_raw[d] * SCALE // tot for d in doms}
        h_raw = {d: 0 for d in doms}
        for s, t, w in edges:
            h_raw[s] += w * a[t]
        tot = sum(h_raw.values())
        h = {d: h_raw[d] * SCALE // tot for d in doms}
    return h, a


def test_hits_star_graph_matches_reference(spark):
    """Star: hub points at 3 authorities; the hub must dominate hubs,
    the authorities must dominate authorities — and every integer score
    must equal the independent reference."""
    edges = [("hub", "x", 2), ("hub", "y", 1), ("hub", "z", 1), ("x", "hub", 1)]
    df = spark.createDataFrame(edges, "src string, dst string, w long")
    got = {r["domain"]: (r["hub"], r["authority"])
           for r in hits_over_edges(df).collect()}
    ref_h, ref_a = _hits_reference(edges)
    for d in ref_h:
        assert got[d] == (ref_h[d], ref_a[d])
    assert got["hub"][0] > got["x"][0]          # hub has the hub score
    assert got["x"][1] > got["hub"][1] or got["hub"][1] == 0


def test_hits_fixture_graph_not_uniform(spark, sf_dir):
    from dronedb_spark.text.linkgraph import hits_domain_edges

    docs = load(spark, sf_dir, "documents")
    out = hits_over_edges(hits_domain_edges(docs)).collect()
    assert len({r["authority"] for r in out}) > 1  # the vacuity guard


# ---------------------------------------------------------------- CUPED --


def test_cuped_reduces_or_preserves_mean_structure(spark, sf_dir):
    """θ-adjustment must preserve the panel-wide mean up to the
    decimal-rounding floor: Σ(Y − θ(X − X̄)) == ΣY over ALL users."""
    events = load(spark, sf_dir, "events")
    out = cuped_readout(events).collect()
    panel = cuped_user_metrics(events).collect()
    sum_y = sum(float(r["y"]) for r in panel)
    adj_mass = sum(r["mean_y_adj"] * r["n"] for r in out)
    assert adj_mass == pytest.approx(sum_y, abs=1e-3)
    assert sum(r["n"] for r in out) == len(panel)


def test_cuped_hand_theta(spark):
    """Two users with known covariate/metric: theta = cov/var exactly."""
    rows = [
        # pre-period events (covariate)
        (0, dt.datetime(2024, 1, 5), 1, "view", 10.0, ""),
        (1, dt.datetime(2024, 1, 5), 2, "view", 20.0, ""),
        # post-period purchases (metric)
        (2, dt.datetime(2024, 3, 1), 1, "purchase", 5.0, ""),
        (3, dt.datetime(2024, 3, 1), 2, "purchase", 9.0, ""),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    panel = {r["user_id"]: (float(r["x"]), float(r["y"]))
             for r in cuped_user_metrics(ev).collect()}
    assert panel == {1: (10.0, 5.0), 2: (20.0, 9.0)}
    out = {r["variant"]: r for r in cuped_readout(ev).collect()}
    # theta = cov/var = ((10-15)(5-7)+(20-15)(9-7)) / ((10-15)^2+(20-15)^2)
    theta = ((10 - 15) * (5 - 7) + (20 - 15) * (9 - 7)) / (25 + 25)
    adj1 = 5 - theta * (10 - 15)
    adj2 = 9 - theta * (20 - 15)
    assert out[1]["mean_y_adj"] == pytest.approx(adj1, abs=1e-6)
    assert out[2]["mean_y_adj"] == pytest.approx(adj2, abs=1e-6)


# ------------------------------------------------------------------- KM --


def test_km_hand_curve(spark):
    """4 users: durations 0, 0, 1 (uncensored), 2 (censored).
    S(0) = 1 - 2/4 = 0.5; S(1) = 0.5 * (1 - 1/2) = 0.25; t=2 row is
    censor-only (d=0), survival stays 0.25."""
    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = []
    eid = 0

    def ev(u, t):
        nonlocal eid
        rows.append((eid, t, u, "view", 1.0, ""))
        eid += 1

    ev(1, base); ev(1, base + dt.timedelta(hours=1))          # dur 0
    ev(2, base); ev(2, base + dt.timedelta(hours=2))          # dur 0
    ev(3, base); ev(3, base + day + dt.timedelta(hours=1))    # dur 1
    # dur 10, last event defines the horizon -> inside the 7-day
    # censor window (the earlier users are 10 days clear of it)
    ev(4, base); ev(4, base + 10 * day + dt.timedelta(hours=1))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    lt = {r["user_id"]: (r["dur_days"], r["censored"])
          for r in user_lifetimes(events).collect()}
    assert lt == {1: (0, 0), 2: (0, 0), 3: (1, 0), 4: (10, 1)}
    curve = {r["t_day"]: r for r in km_curve(events).collect()}
    assert curve[0]["n_risk"] == 4 and curve[0]["n_events"] == 2
    assert curve[0]["survival"] == pytest.approx(0.5, abs=1e-6)
    assert curve[1]["n_risk"] == 2 and curve[1]["n_events"] == 1
    assert curve[1]["survival"] == pytest.approx(0.25, abs=1e-6)
    assert curve[10]["n_events"] == 0 and curve[10]["n_censored"] == 1
    assert curve[10]["survival"] == pytest.approx(0.25, abs=1e-6)


def test_km_horizon_users_censored(spark):
    """Users whose last event sits at/near the horizon are censored and
    contribute at-risk mass without death mass (note the ln(0) guard in
    km_curve is defensive-only here: the horizon-defining subject is
    censored by construction, so n_risk == d cannot occur through
    user_lifetimes)."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(4):
        rows.append((2 * u, base, u, "view", 1.0, ""))
        rows.append((2 * u + 1, base + dt.timedelta(days=30), u, "view", 1.0, ""))
    # all 4 users: duration 30, none censored?  last events are AT the
    # horizon -> censored; push one user far earlier so they die
    rows.append((100, base, 9, "view", 1.0, ""))
    rows.append((101, base + dt.timedelta(days=1), 9, "view", 1.0, ""))
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    curve = {r["t_day"]: r for r in km_curve(events).collect()}
    assert curve[1]["n_events"] == 1
    assert curve[1]["n_risk"] == 5
    assert curve[1]["survival"] == pytest.approx(0.8, abs=1e-6)
    assert curve[30]["survival"] == pytest.approx(0.8, abs=1e-6)  # censor-only


def test_km_monotone_and_bounded(spark, sf_dir):
    curve = km_curve(load(spark, sf_dir, "events")).orderBy("t_day").collect()
    assert curve
    last = 1.0
    for r in curve:
        assert 0.0 <= r["survival"] <= last + 1e-9
        last = r["survival"]
        assert r["n_risk"] >= r["n_events"] + r["n_censored"]


# ------------------------------------------------------------------ PSI --


def test_psi_identical_halves_zero(spark):
    """Equal distributions in both halves -> every contribution 0."""
    rows = [(i, f"src{i % 20}", 100 + 10 * (i % 5)) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = psi_bins(docs).collect()
    for r in out:
        assert r["psi_contrib"] == pytest.approx(0.0, abs=1e-9)


def test_psi_detects_planted_shift(spark):
    """Shift half B's lengths by 300 chars -> PSI total far above the
    0.25 'major drift' rule of thumb."""
    rows = [(i, f"src{i % 20}", 100 + (300 if i % 20 >= 10 else 0))
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    total = sum(r["psi_contrib"] for r in psi_bins(docs).collect())
    assert total > 0.25


def test_psi_fixture_contributions_finite(spark, sf_dir):
    out = psi_bins(load(spark, sf_dir, "documents")).collect()
    assert out
    for r in out:
        assert math.isfinite(r["psi_contrib"])
        assert r["n_a"] + r["n_b"] > 0
