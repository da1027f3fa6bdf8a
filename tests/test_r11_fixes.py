"""Round-11 fix pins: the SemDeDup cell-size guard (tiled pair loop ==
full-matrix pair loop bit-for-bit), the salted-join ``how`` restriction,
the streaming-EWMA late-row guard, the HLL empty-set state, and the
parameterized compaction path scheme."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dronedb_spark.tables import load


# ------------------------------------------------ SemDeDup cell guard


def _flags_rows(df):
    return sorted(
        (r["cell"], r["vec_id"], r["is_dup"]) for r in df.collect()
    )


def test_oversized_cell_tiles_identically(spark, sf_dir):
    """500 vectors over 8 cells ≈ 60 rows/cell: max_cell_rows=16 forces
    the block-tiled pair loop on EVERY cell — results must match the
    full-matrix path row-for-row (bit-identical micro-cosines)."""
    from dronedb_spark.vectors.semdedup import (
        _with_planted_copies,
        semdedup_flags,
    )

    corpus = _with_planted_copies(load(spark, sf_dir, "embeddings"))
    full = _flags_rows(semdedup_flags(corpus, max_cell_rows=1_000_000))
    tiled = _flags_rows(semdedup_flags(corpus, max_cell_rows=16))
    assert full == tiled
    assert sum(d for _, _, d in full) > 0  # the plants actually removed


def test_near_blocks_tile_boundaries():
    """The tile generator covers [start, n) exactly once with block
    sizes bounded by max²//n, and the near matrix equals the one-block
    answer on every tile."""
    import numpy as np

    from dronedb_spark.vectors.semdedup import _near_blocks

    n, d = 37, 6
    mat = np.array(
        [[((i * 31 + j * 17) % 13) - 6.0 for j in range(d)] for i in range(n)]
    )
    mat[mat == 0.0] = 1.0
    (lo0, hi0, near_full), = list(_near_blocks(mat, 500_000, 1_000_000))
    assert (lo0, hi0) == (0, n)
    seen = []
    for lo, hi, near in _near_blocks(mat, 500_000, 6):  # 6²//37 = 0 → block clamps to 1
        assert hi - lo >= 1
        assert (near == near_full[lo:hi]).all()
        seen.append((lo, hi))
    assert seen[0][0] == 0 and seen[-1][1] == n
    assert all(a[1] == b[0] for a, b in zip(seen, seen[1:]))


def test_incremental_oversized_cell_tiles_identically(spark, sf_dir, tmp_path):
    from dronedb_spark.vectors.ivf import _centroids
    from dronedb_spark.vectors.semdedup import (
        _COPY_OFFSET,
        incremental_semdedup,
        write_semdedup_store,
    )

    emb = load(spark, sf_dir, "embeddings")
    store_docs = emb.filter(F.col("vec_id") % 4 != 0)
    copies = emb.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + _COPY_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x * F.lit(1.25)
        ).alias("embedding"),
    )
    held = emb.filter(
        (F.col("vec_id") % 4 == 0) & (F.col("vec_id") >= 8)
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    batch = copies.unionByName(held)
    cents = _centroids(emb).select(
        "cid", F.col("c_emb").cast("array<double>").alias("c_emb")
    )
    path = str(tmp_path / "sem_store")
    write_semdedup_store(store_docs, path, cents)
    full = sorted(
        tuple(r)
        for r in incremental_semdedup(
            spark, path, batch, cents, max_cell_rows=1_000_000
        ).collect()
    )
    tiled = sorted(
        tuple(r)
        for r in incremental_semdedup(
            spark, path, batch, cents, max_cell_rows=16
        ).collect()
    )
    assert full == tiled
    assert sum(r[2] for r in full) > 0


# ------------------------------------------------ salted-join how guard


def test_salted_join_rejects_dim_preserving_outer(spark):
    from dronedb_spark.operators.salting import salted_join

    fact = spark.createDataFrame([(1, 10)], "k int, rid int")
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    for how in ("right", "full", "full_outer", "right_outer", "outer"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(fact, dim, "k", "rid", how=how)


def test_salted_join_left_outer_identity(spark):
    """Fact-side outer stays an identity: an unmatched FACT row appears
    exactly once (it carries one salt), matched rows as in plain join."""
    from dronedb_spark.operators.salting import salted_join

    fact = spark.createDataFrame(
        [(1, 10), (1, 11), (3, 12)], "k int, rid int"
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, v string")
    got = sorted(
        (r["k"], r["rid"], r["v"])
        for r in salted_join(fact, dim, "k", "rid", how="left").collect()
    )
    want = sorted(
        (r["k"], r["rid"], r["v"])
        for r in fact.join(dim, "k", "left").collect()
    )
    assert got == want


# ------------------------------------------------ EWMA late-row guard


class _FakeState:
    def __init__(self):
        self._v, self.wm_ms, self.hasTimedOut = None, 0, False
        self.timeout_ts = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def getCurrentWatermarkMs(self):
        return self.wm_ms

    def setTimeoutTimestamp(self, ts):
        self.timeout_ts = ts


def test_stream_ewma_drops_rows_for_folded_buckets():
    """A row whose bucket already folded must NOT enter the pending
    buffer (it would never be popped — a permanent state leak); on-time
    rows still fold normally."""
    from dronedb_spark.streaming.ewma import _make_fold

    bucket_s = 3600
    bu = bucket_s * 1_000_000
    fold = _make_fold(origin_idx=0, p=1, q=4, bucket_s=bucket_s)
    st = _FakeState()

    def feed(rows_us, wm_us):
        st.wm_ms = wm_us // 1000
        out = list(
            fold(("e",), [pd.DataFrame({"t_us": rows_us})], st)
        )
        return pd.concat(out) if out else pd.DataFrame()

    # two events in bucket 0, watermark passes bucket 0's end → folds
    out1 = feed([10, 20], wm_us=1 * bu)
    assert list(out1["bucket"]) == [0] and list(out1["cnt"]) == [2]
    s, last_idx, pb, pc = st.get
    assert last_idx == 0 and pb == [] and pc == []
    # a LATE row for the already-folded bucket 0 arrives: guarded out
    out2 = feed([30], wm_us=1 * bu)
    s2, last2, pb2, pc2 = st.get
    assert pb2 == [] and pc2 == []  # no leak
    assert len(out2) == 0 or (out2["cnt"] == 0).all()
    # an on-time row in bucket 1 still folds when wm passes its end
    out3 = feed([1 * bu + 5], wm_us=2 * bu)
    row1 = out3[out3["bucket"] == bucket_s]
    assert list(row1["cnt"]) == [1]


# ------------------------------------------------ HLL empty-set state


def test_hll_empty_set_state_is_all_zero_registers(spark):
    from dronedb_spark.text.sketch import M, _hll_state, hll_user_registers

    empty = spark.createDataFrame([], "user_id bigint, event_type string")
    regs = hll_user_registers(empty, None)
    row = _hll_state(regs, "empty").collect()[0]
    assert row["n_zero"] == M
    assert row["s_inv"] == float(M * (1 << 61))


# ------------------------------------------------ compaction path scheme


def test_execute_compaction_mismatched_scheme_raises(spark, tmp_path):
    from dronedb_spark.catalog.compact import compact_plan, execute_compaction

    entries = spark.createDataFrame(
        [("li/0001", 10, 0), ("li/0002", 20, 0)], "path string, size bigint, type int"
    )
    plan = compact_plan(entries, 100)
    slices = spark.createDataFrame([(1, 1), (2, 2)], "x int, slice int")
    with pytest.raises(Exception, match="not in plan"):
        execute_compaction(
            slices,
            "slice",
            plan,
            str(tmp_path / "bad"),
            path_of=lambda c: F.concat(F.lit("other/"), c.cast("string")),
        )


def test_execute_compaction_custom_scheme_writes_all_rows(spark, tmp_path):
    from dronedb_spark.catalog.compact import compact_plan, execute_compaction

    entries = spark.createDataFrame(
        [("part-1", 10, 0), ("part-2", 20, 0)], "path string, size bigint, type int"
    )
    plan = compact_plan(entries, 100)
    slices = spark.createDataFrame(
        [(i, s) for i in range(5) for s in (1, 2)], "x int, slice int"
    )
    out = str(tmp_path / "ok")
    execute_compaction(
        slices,
        "slice",
        plan,
        out,
        path_of=lambda c: F.concat(F.lit("part-"), c.cast("string")),
    )
    assert spark.read.parquet(out).count() == 10
