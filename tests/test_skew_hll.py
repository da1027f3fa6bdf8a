"""Skew-profile + HLL-merge laws (operators/skewprof.py, text/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.operators.skewprof import key_skew_profile
from dronedb_spark.text.sketch import hll_token_registers, merge_registers


def test_skew_profile_hand_values(spark):
    # key 'a' x 8, 'b' x 1, 'c' x 1 → mean 10/3, max 8
    df = spark.createDataFrame(
        [("a",)] * 8 + [("b",)] * 1 + [("c",)] * 1, "k string"
    )
    r = key_skew_profile(df, "k", "t.k").first()
    assert (r["n_rows"], r["n_keys"], r["max_count"]) == (10, 3, 8)
    assert r["top_key"] == "a"
    assert r["heavy_keys"] == 1          # 8*3 > 2*10; 1*3 is not
    assert r["imbalance_micro"] == 8 * 3 * 1_000_000 // 10
    assert r["suggested_salt"] == (8 * 3 + 10 - 1) // 10  # ceil(2.4) = 3


def test_uniform_key_is_balanced(spark):
    df = spark.createDataFrame([(str(i % 4),) for i in range(16)], "k string")
    r = key_skew_profile(df, "k", "u").first()
    assert r["imbalance_micro"] == 1_000_000
    assert r["suggested_salt"] == 1
    assert r["heavy_keys"] == 0


def test_top_key_tie_takes_smallest(spark):
    df = spark.createDataFrame([("b",), ("a",), ("a",), ("b",)], "k string")
    assert key_skew_profile(df, "k", "t").first()["top_key"] == "a"


def test_hll_merge_equals_union_sketch(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 13} w{i % 7} shared") for i in range(60)],
        "doc_id bigint, text string",
    )
    parts = [
        hll_token_registers(docs.filter(F.col("doc_id") % 2 == d))
        for d in range(2)
    ]
    merged = {
        (r["bucket"], r["max_rho"]) for r in merge_registers(parts).collect()
    }
    full = {
        (r["bucket"], r["max_rho"])
        for r in hll_token_registers(docs).collect()
    }
    assert merged == full
