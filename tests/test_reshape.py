"""Pivot/unpivot/cube laws (operators/reshape.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.operators.reshape import (
    cube_counts,
    pivot_counts,
    unpivot_counts,
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, "day bigint, event_type string")


def test_pivot_fills_missing_cells_with_zero(spark):
    df = _ev(spark, [(1, "click"), (1, "click"), (2, "view")])
    out = {r["day"]: r for r in pivot_counts(df, "day").collect()}
    assert out[1]["n_click"] == 2 and out[1]["n_view"] == 0
    assert out[2]["n_view"] == 1 and out[2]["n_purchase"] == 0


def test_unpivot_is_the_pivot_inverse(spark):
    df = _ev(spark, [(1, "click"), (1, "view"), (2, "error"), (2, "error")])
    piv = pivot_counts(df, "day")
    back = unpivot_counts(piv, "day")
    # the unpivoted long form must reproduce the original counts
    got = {
        (r["day"], r["event_type"]): r["n"] for r in back.collect()
    }
    assert got[(1, "click")] == 1 and got[(2, "error")] == 2
    assert got[(1, "purchase")] == 0
    # every (day, type) cell exists exactly once
    assert len(got) == 2 * 5


def test_cube_levels_are_consistent(spark, sf_dir):
    from dronedb_spark.tables import load

    out = cube_counts(load(spark, sf_dir, "events")).collect()
    total = [r for r in out if r["gid"] == 3]
    assert len(total) == 1
    by_type = [r for r in out if r["gid"] == 1]
    by_week = [r for r in out if r["gid"] == 2]
    cells = [r for r in out if r["gid"] == 0]
    n = total[0]["n"]
    assert sum(r["n"] for r in by_type) == n
    assert sum(r["n"] for r in by_week) == n
    assert sum(r["n"] for r in cells) == n
    # rolled-up labels sentinel
    assert all(r["event_type"] == "*" for r in by_week)
    assert all(r["week"] == -1 for r in by_type)


def test_rollup_is_the_cube_prefix_subset(spark, sf_dir):
    """Rollup(type, week) emits exactly the cube's prefix grouping sets:
    gid 0 (cells) and 1 never appear rolled on type alone... concretely:
    rollup rows == cube rows with gid in {0, 1, 3}, and the per-type
    subtotal level (gid=1) sums to the grand total (gid=3)."""
    from dronedb_spark.operators.reshape import cube_counts, rollup_counts
    from dronedb_spark.tables import load

    ev = load(spark, sf_dir, "events")
    roll = {tuple(r) for r in rollup_counts(ev).collect()}
    cube = {tuple(r) for r in cube_counts(ev).collect()}
    assert roll == {r for r in cube if r[3] in (0, 1, 3)}
    per_type = sum(r[2] for r in roll if r[3] == 1)
    grand = [r[2] for r in roll if r[3] == 3]
    assert grand == [per_type] and per_type > 0
