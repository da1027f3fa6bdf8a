"""Binary-quantization laws: Arrow encode == relational encode,
median thresholds balance the bits, rerank recall on the fixture, and
the query's self-exclusion."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load
from dronedb_spark.vectors.binq import (
    _pts,
    binq_codes,
    binq_encode_arrays,
    binq_hamming_topk,
    binq_rerank_topk,
    binq_thresholds,
)


def _emb(spark, sf_dir):
    return load(spark, sf_dir, "embeddings")


def test_arrow_encode_matches_relational(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    th = binq_thresholds(emb)
    rel = sorted(tuple(r) for r in binq_codes(emb, th).collect())
    arr = sorted(tuple(r) for r in binq_encode_arrays(emb, th).collect())
    assert rel == arr and len(rel) == emb.count()


def test_median_thresholds_balance_bits(spark, sf_dir):
    """Strictly-above-median bits number at most n/2 per dimension and
    at least n/2 - (#ties with the median) — on continuous synthetic
    floats effectively n/2, which is what keeps Hamming discriminative."""
    emb = _emb(spark, sf_dir)
    n = emb.count()
    th = binq_thresholds(emb)
    ones = (
        _pts(emb)
        .join(F.broadcast(th), "pos")
        .groupBy("pos")
        .agg(F.sum((F.col("val") > F.col("med")).cast("int")).alias("n_ones"))
        .collect()
    )
    assert len(ones) == 64
    for r in ones:
        assert r["n_ones"] <= n // 2
        assert r["n_ones"] >= n // 2 - 2  # ties-with-median slack


def test_rerank_recall_on_fixture(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    pts = _pts(emb)
    q = pts.filter(F.col("vec_id") == 0).select("pos", F.col("val").alias("qval"))
    exact = (
        pts.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q), "pos")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(
                    ((F.col("val") - F.col("qval")) * (F.col("val") - F.col("qval")))
                    .cast("decimal(38,15)")
                ),
                6,
            ).cast("double").alias("d")
        )
        .orderBy("d", "vec_id")
        .limit(10)
    )
    ex = {r["vec_id"] for r in exact.collect()}
    rr = {r["vec_id"] for r in binq_rerank_topk(emb, 0, 10).collect()}
    assert len(ex & rr) >= 8  # measured 0.9 at CAND_FACTOR=8


def test_query_excluded_and_k_respected(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    rows = binq_hamming_topk(emb, 0, 7).collect()
    assert len(rows) == 7
    assert all(r["vec_id"] != 0 for r in rows)
    hams = [r["hamming"] for r in rows]
    assert hams == sorted(hams)


def test_store_probe_matches_memory_and_reads_no_floats(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    from dronedb_spark.plans.inspect import formatted
    from dronedb_spark.vectors.binq import (
        binq_hamming_topk,
        binq_probe_store,
        write_binq_store,
    )

    emb = load(spark, sf_dir, "embeddings")
    path = str(tmp_path / "binq_store")
    medians = write_binq_store(emb, path)
    q_emb = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    q = binq_probe_store(spark, path, q_emb, medians, k=11)
    # the store probe sees the query itself at hamming 0; drop it to
    # compare with the in-memory search's self-exclusion
    got = [
        (r["vec_id"], r["hamming"]) for r in q.collect() if r["vec_id"] != 0
    ][:10]
    want = [tuple(r) for r in binq_hamming_topk(emb, 0, 10).collect()]
    assert got == want
    f = formatted(q)
    read_schema = [ln for ln in f.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("embedding" not in ln for ln in read_schema)


def test_sampled_threshold_fit_recall(spark, sf_dir):
    """The scale path (md5-keyed sampled median fit) must track the
    exact fit: thresholds stay near the per-dimension median (bits stay
    roughly balanced) and Hamming recall@10 vs the exact-fit search
    stays high.  Forcing fit_max below the fixture size exercises the
    sampling branch the driver check's small corpus skips."""
    emb = _emb(spark, sf_dir)
    n = emb.count()
    fit_max = max(10, n // 3)
    th_exact = binq_thresholds(emb, fit_max=None)
    th_samp = binq_thresholds(emb, fit_max=fit_max)
    assert th_samp.count() == 64
    # determinism: the sampled fit is identical across invocations
    a = sorted(tuple(r) for r in th_samp.collect())
    b = sorted(tuple(r) for r in binq_thresholds(emb, fit_max=fit_max).collect())
    assert a == b
    # sampled thresholds keep bits roughly balanced over the FULL corpus
    bits = (
        _pts(emb)
        .join(F.broadcast(th_samp), "pos")
        .select("pos", (F.col("val") > F.col("med")).cast("int").alias("b"))
        .groupBy("pos")
        .agg(F.avg("b").alias("frac"))
    )
    fracs = [r["frac"] for r in bits.collect()]
    assert all(0.2 <= f <= 0.8 for f in fracs), sorted(fracs)[:3]
    # recall@10 of sampled-fit Hamming search vs exact-fit search
    from dronedb_spark.vectors.binq import binq_codes as _codes

    def top10(th):
        codes = _codes(emb, th)
        q = codes.filter(F.col("vec_id") == 0).select(
            F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
        )
        return {
            r["vec_id"]
            for r in codes.filter(F.col("vec_id") != 0)
            .crossJoin(F.broadcast(q))
            .select(
                "vec_id",
                (F.expr("bit_count(lo ^ qlo)") + F.expr("bit_count(hi ^ qhi)"))
                .alias("h"),
            )
            .orderBy("h", "vec_id")
            .limit(10)
            .collect()
        }
    overlap = len(top10(th_exact) & top10(th_samp))
    assert overlap >= 6, overlap


def test_n_hint_skips_count_and_matches_counted_gate(spark, sf_dir):
    """`n_hint` must make the sampling gate decide WITHOUT a count()
    job and reach bit-identical thresholds on both sides of the gate:
    an over-fit_max hint takes the same sampled branch the counted
    gate takes, an under-fit_max hint the exact branch — and the
    footer helper reads the true row count with zero Spark jobs."""
    from dronedb_spark.vectors.binq import parquet_num_rows

    emb = _emb(spark, sf_dir)
    n = emb.count()
    assert parquet_num_rows(f"{sf_dir}/embeddings.parquet") == n
    assert parquet_num_rows("/nonexistent/nope.parquet") is None
    fit_max = max(10, n // 3)
    counted = sorted(
        tuple(r) for r in binq_thresholds(emb, fit_max=fit_max).collect()
    )
    hinted = sorted(
        tuple(r)
        for r in binq_thresholds(emb, fit_max=fit_max, n_hint=n).collect()
    )
    assert counted == hinted
    # an under-threshold hint selects the exact full-corpus fit
    exact = sorted(
        tuple(r) for r in binq_thresholds(emb, fit_max=None).collect()
    )
    hinted_small = sorted(
        tuple(r)
        for r in binq_thresholds(emb, fit_max=n + 1, n_hint=n).collect()
    )
    assert exact == hinted_small
    # the job gate itself: n_hint runs ZERO jobs before the fit action
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = binq_thresholds(emb, fit_max=fit_max, n_hint=n)  # lazy — no count()
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before
    assert df.count() == 64
