"""Law pins for the round-11 breadth operators (beyond oracle parity):
IVF migration conservation, range-plan disjointness, the moments merge
law, rational kappa bounds, k-anonymity consistency, precedence-merge
uniqueness, and SFT packing conservation."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.tables import load


def test_ivf_migration_conserves_corpus(spark, sf_dir):
    from dronedb_spark.vectors.maintenance import ivf_migration_plan

    emb = load(spark, sf_dir, "embeddings")
    plan = ivf_migration_plan(emb).collect()
    n_corpus = emb.count()
    assert sum(r["n"] for r in plan) == n_corpus
    assert sum(r["vid_sum"] for r in plan) == sum(
        r["vec_id"] for r in emb.select("vec_id").collect()
    )
    # retiring the seed centroids must actually move something
    moved = sum(r["n"] for r in plan if r["old_cell"] != r["new_cell"])
    assert moved > 0


def test_promoted_centroid_lands_in_its_own_cell(spark, sf_dir):
    from dronedb_spark.vectors.ivf import _assign_cells, ivf_assign
    from dronedb_spark.vectors.maintenance import promote_centroids

    emb = load(spark, sf_dir, "embeddings")
    old = ivf_assign(emb).select("vec_id", F.col("cell").alias("old_cell"))
    nc = promote_centroids(emb, old)
    # a promoted centroid has cosine 1.0 with itself → assigns to its cid
    own = _assign_cells(
        nc.select(F.col("cid").cast("bigint").alias("vec_id"),
                  F.col("c_emb").alias("embedding")),
        nc,
    ).collect()
    assert all(r["cell"] == r["vec_id"] for r in own)


def test_range_plan_partitions_are_disjoint_and_conserving(spark, sf_dir):
    from dronedb_spark.operators.rangeplan import range_partition_plan

    ev = load(spark, sf_dir, "events").select(
        F.when(F.col("user_id") % 10 < 7, F.lit(0))
        .otherwise(F.col("user_id") % 50)
        .cast("bigint")
        .alias("k")
    )
    plan = sorted(
        (r["part_no"], r["lo_key"], r["hi_key"], r["n_keys"], r["n_rows"])
        for r in range_partition_plan(ev, "k").collect()
    )
    assert sum(p[4] for p in plan) == ev.count()
    for a, b in zip(plan, plan[1:]):
        assert a[2] < b[1]  # ranges strictly ordered, key-disjoint
    # the hot key (70% of rows) must make its part overflow total/8
    total = sum(p[4] for p in plan)
    assert plan[0][1] == 0 and plan[0][4] > total // 8


def test_moments_merge_law_holds(spark, sf_dir):
    from dronedb_spark.operators.varmerge import moments_merge_daily

    rows = {r["day"]: r for r in moments_merge_daily(
        load(spark, sf_dir, "events")).collect()}
    merged = rows[-1]
    assert merged["equals_full"] == 1
    daily = [r for d, r in rows.items() if d >= 0]
    assert sum(r["n"] for r in daily) == merged["n"]
    assert sum(r["s1"] for r in daily) == merged["s1"]
    assert sum(r["s2"] for r in daily) == merged["s2"]
    assert all(r["var_num"] >= 0 for r in rows.values())


def test_kappa_rational_bounds(spark, sf_dir):
    from dronedb_spark.text.agreement import annotator_labels, cohen_kappa

    docs = load(spark, sf_dir, "documents")
    row = cohen_kappa(annotator_labels(docs)).collect()[0]
    assert 0 < row["n_agree"] <= row["n_total"]
    assert row["kappa_den"] > 0
    assert row["kappa_num"] <= row["kappa_den"]  # kappa <= 1
    # the derived annotators genuinely disagree somewhere
    assert row["n_agree"] < row["n_total"]


def test_kanonymity_consistency(spark, sf_dir):
    from dronedb_spark.text.kanon import kanonymity_audit

    docs = load(spark, sf_dir, "documents")
    rows = kanonymity_audit(docs).collect()
    assert sum(r["n_docs"] for r in rows) == docs.count()
    for r in rows:
        assert 0 <= r["n_risky_classes"] <= r["n_classes"]
        assert 0 <= r["n_risky_docs"] <= r["n_docs"]
        assert r["min_class_size"] >= 1


def test_precedence_merge_keeps_exactly_one_per_group(spark, sf_dir):
    from dronedb_spark.text.precedence import (
        _with_cross_source_copies,
        precedence_merge,
    )

    corpus = _with_cross_source_copies(load(spark, sf_dir, "documents"))
    out = precedence_merge(corpus).collect()
    n_fp = corpus.select("text").distinct().count()
    assert sum(r["n_kept"] for r in out) == n_fp
    assert sum(r["n_docs"] for r in out) == corpus.count()
    # copies shifted to a LOWER-priority source always cede; some
    # shifted to a higher priority must win (both directions exercised)
    assert sum(r["n_ceded"] for r in out) > 0
    kept_ids = set()
    keyed = corpus.select(
        "doc_id", F.md5("text").alias("fp"),
        F.expr("CAST(substring(source, 4, 10) AS INT)").alias("prio"),
    ).collect()
    by_fp = {}
    for r in keyed:
        by_fp.setdefault(r["fp"], []).append((r["prio"], r["doc_id"]))
    for fp, members in by_fp.items():
        kept_ids.add(min(members)[1])
    assert sum(r["kept_id_sum"] for r in out) == sum(kept_ids)


def test_sft_packing_conserves_and_orders(spark, sf_dir):
    from dronedb_spark.text.sft import (
        PACK_BUDGET,
        sft_kept_turns,
        sft_pack_batches,
    )

    docs = load(spark, sf_dir, "documents")
    kept = sft_kept_turns(docs)
    batches = sorted(
        (r["batch_no"], r["n_convs"], r["kept_tokens"])
        for r in sft_pack_batches(docs).collect()
    )
    tot = kept.agg(F.sum("kept_tokens")).collect()[0][0]
    assert sum(b[2] for b in batches) == tot
    assert sum(b[1] for b in batches) == kept.count()
    # every conversation is far smaller than the budget, so batch
    # numbering is contiguous and each non-final batch fills the budget
    assert [b[0] for b in batches] == list(range(len(batches)))
    cum = 0
    for b in batches[:-1]:
        cum += b[2]
        assert cum >= (b[0] + 1) * PACK_BUDGET


def test_cdc_last_writer_wins(spark, sf_dir):
    """The snapshot op per key equals the type of that key's maximum
    (t_us, event_id) event — replay-order semantics, independently
    re-derived driver-side."""
    from dronedb_spark.operators.cdc import N_KEYS, cdc_compaction_rollup

    ev = load(spark, sf_dir, "events").select(
        (F.col("user_id") % N_KEYS).alias("key"),
        "event_type",
        F.expr("unix_micros(ts)").alias("t_us"),
        "event_id",
    )
    rows = ev.collect()
    last = {}
    for r in rows:
        cur = last.get(r["key"])
        stamp = (r["t_us"], r["event_id"])
        if cur is None or stamp > cur[0]:
            last[r["key"]] = (stamp, r["event_type"])
    want_live = sum(1 for _, t in last.values() if t != "error")
    want_dead = len(last) - want_live
    got = {r["op"]: r for r in cdc_compaction_rollup(
        load(spark, sf_dir, "events")).collect()}
    assert got.get("U", {"n_keys": 0})["n_keys"] == want_live
    assert got.get("D", {"n_keys": 0})["n_keys"] == want_dead
    assert sum(r["last_id_sum"] for r in got.values()) == sum(
        s[1] for s, _ in last.values()
    )


def test_seasonal_profile_flat_series_is_zero(spark):
    """A constant hourly series has zero residual everywhere — the
    decomposition must not invent seasonality."""
    import datetime as dt

    from dronedb_spark.operators.seasonal import seasonal_profile

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=h), 1, 0.0, "tick")
        for h in range(24 * 5)
        for i in [h]
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double,"
        " event_type string"
    )
    prof = seasonal_profile(ev).collect()
    assert len(prof) == 24
    assert all(r["seas_sum"] == 0 for r in prof)


def test_seasonal_profile_daily_spike_shows_at_its_hour(spark):
    """Doubling hour 9 every day must put positive residual mass at
    hod 9 and negative elsewhere (the window redistributes it)."""
    import datetime as dt

    from dronedb_spark.operators.seasonal import seasonal_profile

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24 * 5):
        n = 2 if h % 24 == 9 else 1
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(hours=h), 1, 0.0, "tick"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double,"
        " event_type string"
    )
    prof = {r["hod"]: r["seas_sum"] for r in seasonal_profile(ev).collect()}
    assert prof[9] > 0
    assert sum(1 for h, s in prof.items() if h != 9 and s < 0) > 0


def test_mrr_ranks_are_consistent_with_brute_force(spark, sf_dir):
    from dronedb_spark.vectors.mrr import _LCM, TOP_K, retrieval_mrr

    rows = retrieval_mrr(load(spark, sf_dir, "embeddings")).collect()
    assert len(rows) == 20
    for r in rows:
        if r["first_rel_rank"] == -1:
            assert r["rr_scaled"] == 0
        else:
            assert 1 <= r["first_rel_rank"] <= TOP_K
            assert r["rr_scaled"] == _LCM // r["first_rel_rank"]
    # at least one query must find a same-label neighbor in the top-10
    assert any(r["first_rel_rank"] != -1 for r in rows)
