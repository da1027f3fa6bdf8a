"""Exact length quantiles: the type-1 inverse-CDF law on a known
distribution and the histogram-collapse plan shape."""

from __future__ import annotations

from dronedb_spark.text.lengths import (
    exact_length_quantiles,
    token_length_histogram,
)


def _docs(spark, lengths):
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(lengths)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_type1_quantile_law(spark):
    # 10 docs of lengths 1..10: ceil-rank picks are closed-form
    df = _docs(spark, list(range(1, 11)))
    got = {r["pct"]: (r["rank"], r["value"]) for r in exact_length_quantiles(df).collect()}
    assert got == {
        25: (3, 3),   # ceil(2.5) = 3rd smallest
        50: (5, 5),
        75: (8, 8),   # ceil(7.5)
        90: (9, 9),
        99: (10, 10),  # ceil(9.9)
    }


def test_ties_collapse_to_histogram(spark):
    df = _docs(spark, [4] * 97 + [8] * 3)
    hist = {r["n_tokens"]: r["n_docs"] for r in token_length_histogram(df).collect()}
    assert hist == {4: 97, 8: 3}
    got = {r["pct"]: r["value"] for r in exact_length_quantiles(df).collect()}
    assert got == {25: 4, 50: 4, 75: 4, 90: 4, 99: 8}


def test_single_doc(spark):
    got = {r["pct"]: (r["rank"], r["value"]) for r in
           exact_length_quantiles(_docs(spark, [7])).collect()}
    assert got == {p: (1, 7) for p in (25, 50, 75, 90, 99)}


def test_window_runs_on_histogram_not_docs(spark):
    """The unpartitioned window is safe BECAUSE it sorts the collapsed
    histogram: the aggregate must sit below the window in the plan."""
    df = _docs(spark, list(range(1, 21)))
    plan = (
        exact_length_quantiles(df)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the window's child is the histogram aggregate...
    after_window = plan[plan.index("Window") :]
    assert "Aggregate [n_tokens" in after_window
    # ...and the corpus is scanned exactly once (N comes from a second
    # frame over the SAME histogram pass, not a duplicated subtree)
    assert plan.count("split(text") == 1
