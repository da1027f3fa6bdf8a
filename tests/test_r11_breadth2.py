"""Law pins for the second round-11 breadth batch: priority-sampling
weight monotonicity and determinism, Benford share conservation, and
Gini bounds / invariance laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load


# ------------------------------------------------ weighted sampling --


def test_priority_sample_is_partition_invariant(spark, sf_dir):
    from dronedb_spark.text.wsample import weighted_priority_sample

    docs = load(spark, sf_dir, "documents")
    a = weighted_priority_sample(docs).collect()
    b = weighted_priority_sample(docs.repartition(13, "source")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_priority_sample_favors_weight(spark, sf_dir):
    """Inclusion odds scale with weight: the sampled docs' mean n_chars
    must exceed the corpus mean (priority = u DIV w shrinks with w)."""
    from dronedb_spark.text.wsample import weighted_priority_sample

    docs = load(spark, sf_dir, "documents")
    sample_mean = (
        weighted_priority_sample(docs).agg(F.avg("weight")).first()[0]
    )
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean


def test_priority_sample_uniform_weight_equals_reservoir_order(spark, sf_dir):
    """With all weights equal the priority order is the hash order —
    weighted sampling degrades to the unweighted reservoir exactly
    (same u, constant divisor preserves ordering up to ties)."""
    from dronedb_spark.text.wsample import weighted_priority_sample

    docs = load(spark, sf_dir, "documents").withColumn("w1", F.lit(1))
    got = weighted_priority_sample(docs, weight_col="w1", k=50).collect()
    # priority == u exactly when w == 1: re-derive u and compare
    u = docs.select(
        "doc_id",
        F.expr(
            "CAST(conv(substr(md5('wsample-v1:' || CAST(doc_id AS STRING)),"
            " 1, 15), 16, 10) AS BIGINT)"
        ).alias("u"),
    )
    want = [r["doc_id"] for r in u.orderBy("u", "doc_id").limit(50).collect()]
    assert [r["doc_id"] for r in got] == want


# ---------------------------------------------------------- benford --


def test_benford_shares_conserve_and_digits_bound(spark, sf_dir):
    from dronedb_spark.operators.benford import benford_digit_audit

    orders = load(spark, sf_dir, "orders")
    rows = benford_digit_audit(orders, "o_totalprice").collect()
    digits = {r["digit"] for r in rows}
    assert digits <= set(range(1, 10))
    n_total = sum(r["n_obs"] for r in rows)
    assert n_total == orders.filter("o_totalprice >= 1").count()
    # micro shares sum to 1e6 within the DIV truncation slack (≤ 9 rows)
    s = sum(r["share_micro"] for r in rows)
    assert 1_000_000 - 9 <= s <= 1_000_000


def test_benford_flags_constant_feed(spark):
    """A constant-amount feed concentrates one digit — the audit shape
    the operator exists for."""
    from dronedb_spark.operators.benford import benford_digit_audit

    df = spark.range(1000).select((F.lit(42.0)).alias("amount"))
    rows = benford_digit_audit(df, "amount").collect()
    assert len(rows) == 1 and rows[0]["digit"] == 4
    assert rows[0]["share_micro"] == 1_000_000


# ------------------------------------------------------------- gini --


def test_gini_bounds_and_equal_masses_zero(spark, sf_dir):
    from dronedb_spark.text.balance import gini_source_balance

    row = gini_source_balance(load(spark, sf_dir, "documents")).first()
    assert 0 <= row["gini_num"] <= row["gini_den"]
    # equal masses → gini exactly 0
    eq = spark.createDataFrame(
        [(f"s{i}", 7, 100) for i in range(5)],
        "source string, doc_id int, n_chars bigint",
    )
    z = gini_source_balance(eq).first()
    assert z["gini_num"] == 0 and z["max_share_micro"] == 200_000


def test_gini_scale_invariance(spark, sf_dir):
    """Gini is scale-free: doubling every document's mass doubles num
    and den, leaving the rational value identical."""
    from dronedb_spark.text.balance import gini_source_balance

    docs = load(spark, sf_dir, "documents")
    a = gini_source_balance(docs).first()
    b = gini_source_balance(
        docs.withColumn("n_chars", F.col("n_chars") * 2)
    ).first()
    assert a["gini_num"] * b["gini_den"] == b["gini_num"] * a["gini_den"]


# -------------------------------------------------------------- rbo --


def test_rbo_identical_rankings_hit_ceiling(spark):
    """When the prefix IS the full vector (zeros beyond dim 16) the two
    rankings coincide and RBO must equal the truncation ceiling
    sum(d * C_d) — the O_d = d case."""
    import numpy as np

    from dronedb_spark.vectors.rbo import _C, rbo_prefix_stability

    rng = np.random.RandomState(7)
    rows = [
        (i, [float(x) for x in rng.randn(16)] + [0.0] * 48)
        for i in range(40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )
    out = rbo_prefix_stability(emb, n_queries=4).collect()
    ceiling = sum(d * _C[d] for d in _C)
    assert len(out) == 4
    for r in out:
        assert r["n_common"] == 10
        assert r["rbo_num"] == ceiling


def test_rbo_bounds(spark, sf_dir):
    from dronedb_spark.vectors.rbo import _C, rbo_prefix_stability
    from dronedb_spark.tables import load

    out = rbo_prefix_stability(load(spark, sf_dir, "embeddings")).collect()
    ceiling = sum(d * _C[d] for d in _C)
    for r in out:
        assert 1 <= r["n_common"] <= 10
        assert 0 < r["rbo_num"] <= ceiling
        assert r["rbo_den"] == 2520 * 10 ** 10


# ------------------------------------------------------- containment --


def test_containment_finds_planted_excerpts(spark, sf_dir):
    """Every planted excerpt (long enough to carry shingles that
    survive the df cap) must name its host page at high containment;
    the reverse direction (host → excerpt) must NOT pass at 80%."""
    from dronedb_spark.tables import load
    from dronedb_spark.text.containment import (
        EXCERPT_OFFSET,
        _with_excerpts,
        containment_pairs,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = containment_pairs(_with_excerpts(docs)).collect()
    hits = {
        (r["src_id"], r["dst_id"])
        for r in pairs
        if r["src_id"] >= EXCERPT_OFFSET
    }
    planted = [
        (r["doc_id"] + EXCERPT_OFFSET, r["doc_id"])
        for r in docs.filter("doc_id % 10 = 0 AND n_chars >= 220").collect()
    ]
    found = sum(1 for p in planted if p in hits)
    assert found >= int(0.8 * len(planted)) and len(planted) > 0
    # asymmetry: hosts are much longer than their excerpts
    reverse = {(b, a) for a, b in planted}
    assert not (reverse & {(r["src_id"], r["dst_id"]) for r in pairs})


def test_containment_is_partition_invariant(spark, sf_dir):
    from dronedb_spark.tables import load
    from dronedb_spark.text.containment import (
        _with_excerpts,
        containment_pairs,
    )

    docs = _with_excerpts(load(spark, sf_dir, "documents"))
    a = containment_pairs(docs).collect()
    b = containment_pairs(docs.repartition(17)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------ cluster audit --


def test_cluster_audit_bounds_and_connectivity(spark, sf_dir):
    """Every audited component: edges within [n−1, C(n,2)] (connected,
    at most a clique), min ≤ mean ≤ 1e6 micro, weak count ≤ edges."""
    from dronedb_spark.text.clusteraudit import cluster_precision_audit
    from dronedb_spark.tables import load

    rows = cluster_precision_audit(load(spark, sf_dir, "documents")).collect()
    assert rows
    for r in rows:
        n, e = r["n_members"], r["n_edges"]
        assert n >= 2
        assert n - 1 <= e <= n * (n - 1) // 2
        assert 0 <= r["min_jacc_micro"] <= 1_000_000
        assert r["min_jacc_micro"] * e <= r["sum_jacc_micro"] <= 1_000_000 * e
        assert 0 <= r["n_weak_edges"] <= e


def test_cluster_audit_counts_match_cluster_ids(spark, sf_dir):
    """The audit's membership column must agree with the cluster-id
    operator it audits (same components, same sizes)."""
    from collections import Counter

    from dronedb_spark.text.clusteraudit import cluster_precision_audit
    from dronedb_spark.text.dedup import neardup_clusters
    from dronedb_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    audit = {
        r["cluster_id"]: r["n_members"]
        for r in cluster_precision_audit(docs).collect()
    }
    sizes = Counter(
        r["cluster_id"] for r in neardup_clusters(docs).collect()
    )
    assert audit == dict(sizes)


def test_containment_store_probe_matches_inmemory_and_prunes(spark, sf_dir, tmp_path):
    """The store probe answers the excerpt-batch containment question
    identically to re-running the in-memory operator over stored corpus
    + batch (restricted to batch→store pairs with the combined-df cap),
    and the probe's store scans partition-prune on the shingle bucket
    while never touching the corpus parquet."""
    from dronedb_spark.plans.inspect import formatted
    from dronedb_spark.tables import load
    from dronedb_spark.text.containment import (
        _excerpt_batch,
        incremental_containment,
        write_containment_store,
    )

    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "containment_store")
    write_containment_store(docs, path)
    batch = _excerpt_batch(docs)

    probe = incremental_containment(spark, path, batch)
    got = {tuple(r) for r in probe.collect()}
    assert got
    # every planted excerpt pair present points at its host
    hosts = {r["doc_id"] for r in docs.select("doc_id").collect()}
    for src, dst, n_common, n_src, micro in got:
        assert dst in hosts
        assert micro >= 800_000 and n_common <= n_src

    f = formatted(probe)
    # both store datasets are scanned (the corpus parquet appears ONLY
    # as the batch's own source — the stored corpus is never
    # re-shingled), and every store scan partition-prunes on bkt
    assert "containment_store/postings" in f
    assert "containment_store/dfs" in f
    store_scan_filters = [
        seg[: seg.index("]") + 1]
        for seg in f.split("PartitionFilters: ")[1:]
    ]
    pruned = [s for s in store_scan_filters if "bkt" in s]
    assert len(pruned) >= 2, store_scan_filters


def test_containment_store_append_semantics_batch_absent(spark, sf_dir, tmp_path):
    """A batch shingle the BUILD dropped for frequency must stay
    dropped at probe time (the df sidecar, not the postings, is the
    frequency truth): planting a boilerplate shingle in every batch doc
    must not create pairs through it."""
    from pyspark.sql import functions as F

    from dronedb_spark.tables import load
    from dronedb_spark.text.containment import (
        MAX_DF,
        incremental_containment,
        write_containment_store,
    )

    docs = load(spark, sf_dir, "documents")
    path = str(tmp_path / "store2")
    write_containment_store(docs, path)
    # a batch of tiny docs made ONLY of one corpus-frequent trigram
    # (the most common 'the ' proxy: reuse the corpus's own most
    # frequent shingle) — n_src becomes 0 for them, so no pair at all
    from dronedb_spark.text.containment import _distinct_shingles

    top = (
        _distinct_shingles(docs)
        .groupBy("s")
        .count()
        .filter(F.col("count") > MAX_DF)
        .orderBy(F.desc("count"), "s")
        .first()
    )
    if top is None:
        return  # corpus has no over-cap shingle at this SF; nothing to plant
    batch = spark.createDataFrame(
        [(9_000_000_000 + i, top["s"]) for i in range(3)],
        "doc_id bigint, text string",
    )
    out = incremental_containment(spark, path, batch).collect()
    assert out == []


def test_survivors_exactly_one_per_cluster_and_longest_wins(spark, sf_dir):
    from dronedb_spark.tables import load
    from dronedb_spark.text.clusteraudit import cluster_survivors

    docs = load(spark, sf_dir, "documents")
    sv = cluster_survivors(docs).collect()
    assert len(sv) == docs.count()
    by_cluster = {}
    for r in sv:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    lengths = {
        r["doc_id"]: r["n_chars"]
        for r in docs.select("doc_id", "n_chars").collect()
    }
    for cid, rows in by_cluster.items():
        keepers = [r for r in rows if r["keep"]]
        assert len(keepers) == 1
        kept = keepers[0]["doc_id"]
        best = max(rows, key=lambda r: (lengths[r["doc_id"]], -r["doc_id"]))
        assert kept == best["doc_id"]


def test_pr_curve_monotone_and_consistent_with_auc_inputs(spark, sf_dir):
    """Recall is non-increasing in the threshold, tp+fn is the constant
    positive count, precision at the lowest threshold equals the base
    rate, and every tp/fp is consistent with the histogram."""
    from dronedb_spark.text.evalmetrics import _score_col, pr_curve, roc_auc

    docs = load(spark, sf_dir, "documents")
    label = F.col("lang") == "en"
    rows = pr_curve(docs, _score_col(), label).orderBy("s").collect()
    auc_row = roc_auc(docs, _score_col(), label).first()
    n_pos, n_neg = auc_row["n_pos"], auc_row["n_neg"]
    assert rows
    last_recall = None
    for r in rows:  # ascending s ⇒ tp non-increasing ⇒ recall non-increasing? no: ascending s means stricter threshold later
        assert r["tp"] + r["fn"] == n_pos
        assert 0 <= r["fp"] <= n_neg
        assert 0 <= r["precision_micro"] <= 1_000_000
        assert 0 <= r["recall_micro"] <= 1_000_000
    recalls = [r["recall_micro"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)
    # the loosest threshold (smallest s) accepts everything: recall 1
    assert rows[0]["recall_micro"] == 1_000_000
    assert rows[0]["tp"] == n_pos and rows[0]["fp"] == n_neg


def test_simhash_banded_equals_exhaustive_at_threshold(spark, sf_dir):
    """Pigeonhole exactness: the band join's Hamming ≤ 3 answer must
    equal the exhaustive cross-join's (the banded path may not lose a
    pair), and the banded plan must not contain a cartesian product."""
    from dronedb_spark.plans.inspect import has_cartesian
    from dronedb_spark.tables import load
    from dronedb_spark.text.simhash import (
        simhash_hamming,
        simhash_neardup_pairs,
        simhash_signatures,
    )

    docs = load(spark, sf_dir, "documents")
    banded = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_neardup_pairs(docs).collect()
    }
    brute = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in simhash_hamming(simhash_signatures(docs), max_dist=3).collect()
    }
    assert banded == brute and banded
    assert not has_cartesian(simhash_neardup_pairs(docs))
