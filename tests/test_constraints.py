"""Constraint-audit detection laws (catalog/constraints.py) — the
driver check runs on a CLEAN corpus (all zeros), so these tests plant
every violation class and pin counts + deterministic sample keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.catalog.constraints import (
    foreign_key_audit,
    row_constraint_audit,
    unique_key_audit,
)


def test_row_rules_count_and_sample_smallest(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, -1.0), (9, 0.0), (4, 2.0)],
        "id bigint, qty double",
    )
    out = {
        r["constraint"]: r
        for r in row_constraint_audit(
            df,
            "t",
            [
                ("qty_pos", F.col("qty").isNull() | (F.col("qty") <= 0),
                 F.col("id")),
                ("never", F.lit(False), F.col("id")),
            ],
        ).collect()
    }
    r = out["t:qty_pos"]
    assert (r["n_rows"], r["n_violations"]) == (5, 3)  # ids 2, 3, 9
    assert r["sample_key"] == "2"
    clean = out["t:never"]
    assert (clean["n_violations"], clean["sample_key"]) == (0, "-")


def test_unique_key_counts_extra_rows_only(spark):
    df = spark.createDataFrame(
        [(7,), (7,), (7,), (3,), (3,), (1,)], "k bigint"
    )
    r = unique_key_audit(df, "t", "k").first()
    assert (r["n_rows"], r["n_violations"]) == (6, 3)  # 2 extra 7s + 1 extra 3
    assert r["sample_key"] == "3"  # string MIN over duplicated keys


def test_foreign_key_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    r = foreign_key_audit(child, "c", "fk", parent, "pk").first()
    assert (r["n_rows"], r["n_violations"], r["sample_key"]) == (4, 2, "9")


def test_clean_tables_report_zero(spark):
    child = spark.createDataFrame([(1,), (2,)], "fk bigint")
    parent = spark.createDataFrame([(1,), (2,)], "pk bigint")
    r = foreign_key_audit(child, "c", "fk", parent, "pk").first()
    assert (r["n_violations"], r["sample_key"]) == (0, "-")
    u = unique_key_audit(child, "c", "fk").first()
    assert (u["n_violations"], u["sample_key"]) == (0, "-")
