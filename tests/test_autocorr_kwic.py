"""Autocorrelation + KWIC laws (operators/autocorr.py, text/invindex.py)."""

from __future__ import annotations

import datetime as dt

from dronedb_spark.operators.autocorr import autocorrelation
from dronedb_spark.text.invindex import kwic_snippets, positional_postings


def _events(spark, counts_by_hour, event_type="a"):
    rows = []
    eid = 0
    for h, n in enumerate(counts_by_hour):
        for _ in range(n):
            rows.append(
                (eid, dt.datetime(2026, 1, 1, 0, 0, 0)
                 + dt.timedelta(hours=h, seconds=eid % 60), event_type)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, event_type string"
    )


def test_perfectly_periodic_series_has_r_one_at_its_period(spark):
    ev = _events(spark, [5, 1] * 8)  # period 2
    rows = {r["lag"]: r for r in autocorrelation(ev, lags=(1, 2)).collect()}
    assert rows[2]["r"] == 1.0
    assert rows[1]["r"] == -1.0  # alternating series anti-correlates at lag 1
    assert rows[1]["n_pairs"] == 15 and rows[2]["n_pairs"] == 14


def test_constant_series_sentinels(spark):
    ev = _events(spark, [3] * 6)
    rows = autocorrelation(ev, lags=(1,)).collect()
    assert rows[0]["r"] == -999.0


def test_gap_hours_count_as_zero(spark):
    # hours 0 and 2 have events, hour 1 is EMPTY — the grid must see it
    ev = _events(spark, [4, 0, 4])
    r = autocorrelation(ev, lags=(2,)).first()
    assert r["n_pairs"] == 1  # pairs (h0, h2)
    assert (r["sum_x"], r["sum_y"]) == (4, 4)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_kwic_clamps_at_both_boundaries(spark):
    docs = _docs(spark, [
        (1, "hit b c d e"),          # hit at position 0 → left clamp
        (2, "a b c d hit"),          # hit at the end → right clamp
        (3, "a b c hit d e f g"),    # interior: full ±3
        (4, "no match here"),
    ])
    got = {
        r["doc_id"]: (r["first_pos"], r["snippet"], r["n_occurrences"])
        for r in kwic_snippets(docs, positional_postings(docs), "hit").collect()
    }
    assert got == {
        1: (0, "hit b c d", 1),
        2: (4, "b c d hit", 1),
        3: (3, "a b c hit d e f", 1),
    }


def test_kwic_counts_all_occurrences_but_anchors_first(spark):
    docs = _docs(spark, [(9, "x hit y hit z")])
    r = kwic_snippets(docs, positional_postings(docs), "hit").first()
    assert (r["first_pos"], r["n_occurrences"]) == (1, 2)
