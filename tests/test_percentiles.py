"""Exact percentile laws (operators/percentiles.py)."""

from __future__ import annotations

from dronedb_spark.operators.percentiles import value_percentiles
from dronedb_spark.tables import load


def test_percentiles_are_monotone_and_occurring_values(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    rows = value_percentiles(ev).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], {})[r["pct"]] = r["value_micro"]
    assert len(by_type) == 5
    vm = {
        (r["event_type"], r["vm"])
        for r in ev.selectExpr(
            "event_type",
            "CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS vm",
        ).collect()
    }
    for et, ps in by_type.items():
        assert ps[50] <= ps[95] <= ps[99]
        for p, v in ps.items():
            assert (et, v) in vm  # type-1: a value that actually occurred


def test_rank_formula_edges(spark):
    """n=1: every pct picks the single row; n=100: p50 is the 50th."""
    rows1 = [(1, None, "x", 7.0)]
    df1 = spark.createDataFrame(
        [(1, "x", 7.0)], "event_id bigint, event_type string, value double"
    )
    got1 = value_percentiles(df1).collect()
    assert len(got1) == 3 and all(r["value_micro"] == 7_000_000 for r in got1)
    df100 = spark.createDataFrame(
        [(i, "x", float(i)) for i in range(1, 101)],
        "event_id bigint, event_type string, value double",
    )
    got100 = {r["pct"]: r["value_micro"] for r in value_percentiles(df100).collect()}
    assert got100 == {50: 50_000_000, 95: 95_000_000, 99: 99_000_000}
