"""Salted-join identity and plan laws (operators/salting.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.operators.salting import salted_join
from dronedb_spark.tables import load


def _sides(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    dim = (
        ev.select((F.col("user_id") % 50).alias("k")).distinct()
        .withColumn("attr", F.col("k") * 2)
    )
    fact = ev.select(
        "event_id",
        F.when(F.col("user_id") % 10 < 7, F.lit(0))
        .otherwise(F.col("user_id") % 50)
        .cast("bigint")
        .alias("k"),
    )
    return fact, dim


def test_salted_equals_plain_join(spark, sf_dir):
    fact, dim = _sides(spark, sf_dir)
    got = sorted(
        tuple(r) for r in salted_join(fact, dim, "k", "event_id").collect()
    )
    want = sorted(tuple(r) for r in fact.join(dim, "k").collect())
    assert got == want and len(want) >= 1000


def test_salt_spreads_the_hot_key(spark, sf_dir):
    """Every salt value carries a share of the hot key's rows — the
    straggler task genuinely splits."""
    from dronedb_spark.operators.salting import N_SALT

    fact, dim = _sides(spark, sf_dir)
    salted = fact.withColumn(
        "_salt",
        (
            F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 6), 16, 10)
            .cast("bigint") % N_SALT
        ).cast("int"),
    )
    per_salt = (
        salted.filter(F.col("k") == 0).groupBy("_salt").count().collect()
    )
    assert len(per_salt) == N_SALT
    counts = [r["count"] for r in per_salt]
    assert min(counts) > 0 and max(counts) < 2 * (sum(counts) // N_SALT) + 50


def test_plan_replicates_dim_not_fact(spark, sf_dir):
    from dronedb_spark.plans.inspect import physical_plan

    fact, dim = _sides(spark, sf_dir)
    q = salted_join(fact, dim, "k", "event_id")
    plan = physical_plan(q)
    # the generated explode sits on the dim side; the join keys carry
    # the salt (spread achieved); shuffle-hash as hinted
    assert "Generate explode" in plan or "Expand" in plan or "explode" in plan
    assert "_salt" in plan
    assert "ShuffledHashJoin" in plan
