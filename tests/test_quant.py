"""SQ8 array scale path agrees with the relational (oracle-parity) form
and behaves like a quantizer should."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.vectors.quant import (
    LEVELS,
    sq8_dims,
    sq8_encode,
    sq8_search_top10,
    sq8_sql,
)


def test_array_path_matches_relational_ranking(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("embeddings")
    rel = [(r["vec_id"], r["adc_dist"]) for r in spark.sql(sq8_sql("spark")).collect()]
    arr = [(r["vec_id"], r["adc_dist"]) for r in sq8_search_top10(emb).collect()]
    assert [v for v, _ in rel] == [v for v, _ in arr]
    # distances agree to the rounding tolerance (decimal-exact vs fold sum)
    for (_, a), (_, b) in zip(rel, arr):
        assert abs(a - b) < 1e-5


def test_codes_in_range_and_reconstruction_bounded(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    dims = sq8_dims(emb)
    codes = sq8_encode(emb, dims)
    mm = codes.select(
        F.min(F.array_min("codes")).alias("lo"), F.max(F.array_max("codes")).alias("hi")
    ).collect()[0]
    assert 0 <= mm["lo"] and mm["hi"] <= LEVELS
    # quantization error per component is at most half a step of the range
    d = {r["pos"]: (r["lo"], r["hi"]) for r in dims.collect()}
    worst_step = max(h - l for l, h in d.values()) / LEVELS
    row = emb.limit(1).collect()[0]
    c = codes.filter(F.col("vec_id") == row["vec_id"]).collect()[0]["codes"]
    for pos, (x, code) in enumerate(zip(row["embedding"], c)):
        lo, hi = d[pos]
        recon = lo + code * (hi - lo) / LEVELS
        assert abs(recon - float(x)) <= worst_step / 2 + 1e-9


def test_sq8_ranking_close_to_exact_l2(spark, sf_dir):
    """Recall sanity: SQ8 top-10 overlaps the exact-L2 top-10 heavily
    (quantization noise is far below inter-vector distances)."""
    emb = load(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("embeddings")
    exact = spark.sql(
        """
        WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
        SELECT vec_id,
               aggregate(zip_with(embedding, qe,
                         (a, b) -> (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))
                                   * (CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
                         CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS d2
        FROM embeddings, q WHERE vec_id <> 0 ORDER BY d2, vec_id LIMIT 10"""
    ).collect()
    got = {r["vec_id"] for r in sq8_search_top10(emb).collect()}
    assert len(got & {r["vec_id"] for r in exact}) >= 8
