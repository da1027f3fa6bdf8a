"""Integer EWMA fold laws (operators/ewma.py)."""

from __future__ import annotations

from dronedb_spark.operators.ewma import SCALE, ewma_series
from dronedb_spark.tables import load


def test_fold_matches_python_replay(spark, sf_dir):
    rows = ewma_series(load(spark, sf_dir, "events")).collect()
    by_type: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["event_type"], r["bucket"])):
        by_type.setdefault(r["event_type"], []).append(r)
    assert len(by_type) == 5
    for series in by_type.values():
        s = None
        for r in series:
            c = int(r["cnt"])
            s = c * SCALE if s is None else (c * SCALE + 7 * s) // 8
            assert r["ewma_micro"] == s
        # gap-free grid: buckets are consecutive hours
        bs = [r["bucket"] for r in series]
        assert bs == list(range(bs[0], bs[-1] + 1, 3600))


def test_constant_series_is_fixed_point(spark):
    """A constant-rate series settles AT c·SCALE immediately and stays:
    s = (c·SCALE + 7·c·SCALE)//8 = c·SCALE."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2026, 1, 1) + dt.timedelta(hours=i // 2), 1, 1.0)
        for i in range(48)  # 2 events every hour for 24 hours
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    ).withColumn("event_type", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("x"))
    out = sorted(
        (r["bucket"], r["ewma_micro"]) for r in ewma_series(ev).collect()
    )
    assert all(m == 2 * SCALE for _, m in out)


def test_decay_toward_zero_on_silence(spark):
    """After the last event the EWMA decays by exactly 7/8 per quiet
    hour (integer floor)."""
    import datetime as dt

    ev = spark.createDataFrame(
        [
            (1, dt.datetime(2026, 1, 1, 0, 30), 1, 1.0),
            (2, dt.datetime(2026, 1, 1, 10, 30), 1, 1.0),  # extends grid
        ],
        "event_id bigint, ts timestamp, user_id bigint, value double",
    ).withColumn("event_type", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("x"))
    out = {r["bucket"]: r["ewma_micro"] for r in ewma_series(ev).collect()}
    bs = sorted(out)
    s = SCALE  # hour 0: one event
    assert out[bs[0]] == s
    for b in bs[1:-1]:
        s = (7 * s) // 8
        assert out[b] == s
