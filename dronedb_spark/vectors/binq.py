"""Binary (1-bit) quantization for embedding search — the most
aggressive point on the quantization ladder next to SQ8
(``quant.py``) and PQ (``pq.py``): one bit per dimension, 32× smaller
than float32, scored with XOR + popcount (the classic sign-quantization
/ binary-hashing recipe, e.g. Jégou et al.'s binary codes line and the
modern "binary quantization + rescore" serving pattern).

Design for exactness AND scale:

  * per-dimension thresholds are the TYPE-1 MEDIAN (the (n+1) DIV 2-th
    order statistic, ties by vec_id) — an order statistic, not a mean,
    so both engines pick the identical float and every bit is
    reproducible (a mean would differ in the last ulp across summation
    orders);  medians also balance the bits, which is what makes
    Hamming distances discriminative;
  * codes pack into TWO bigint halves (bits 0-31 / 32-63): packing 64
    bits into one signed bigint would overflow at bit 63 under ANSI
    mode; two halves keep every shift in range and cost nothing
    (Hamming adds the two popcounts);
  * search is ``bit_count(lo XOR qlo) + bit_count(hi XOR qhi)`` over
    the 16-byte code table — a map-only scan 16× narrower than the
    float corpus, then TakeOrderedAndProject top-k (integer-exact,
    oracle-checked);
  * serving rescues recall by EXACT RERANK: the Hamming top-4k
    candidates join back to the float vectors (a broadcast of <=4k ids)
    and are re-scored with the decimal-exact L2 used across the vectors
    package (per-term DECIMAL(38,15) casts make the sum
    order-independent), then top-k.
  * the Arrow encode path (``binq_encode_arrays``) packs bits with
    numpy shifts in one pass over Arrow batches — no explode, no
    interpreted HOF — and is pytest-pinned bit-identical to the
    relational form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load

K = 10
CAND_FACTOR = 8  # rerank pool = CAND_FACTOR * k Hamming candidates
# (measured on the fixture: factor 4 -> recall@10 0.6-0.7, 8 -> 0.9 at
# both sf0.001 and sf0.01, 16 -> ~1.0; 8*k rescores stay a fixed-size
# broadcast at any corpus size)


def _pts(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.col("v").cast("double").alias("val"))


BINQ_FIT_MAX = 100_000  # corpus size above which the median fit samples


def binq_thresholds(
    embeddings: DataFrame,
    fit_max: int | None = BINQ_FIT_MAX,
    n_hint: int | None = None,
) -> DataFrame:
    """(pos, med): the per-dimension type-1 median — 64 rows out.

    The fit is model TRAINING, not serving: above ``fit_max`` vectors
    the medians are fitted on a DETERMINISTIC md5-keyed sample of
    ~``fit_max`` rows (the smallest-hash-prefix discipline — no RNG,
    stable across runs/partitionings).  A 10B-vector corpus would
    otherwise push 10B rows through each of the 64 single-partition
    rank windows below; a 10^5-vector sample pins each median to well
    inside the quantization noise floor while the fit becomes a
    constant-cost job.  ``fit_max=None`` forces the exact full-corpus
    fit (the oracle-parity form — also what small corpora get
    automatically, so the driver check is exact end to end).

    ``n_hint`` is the caller-known corpus size (a counted store's row
    count, a parquet footer sum) — when provided, the sampling gate
    decides on it WITHOUT running a count() job; a serving pipeline
    always knows its corpus size, so the extra scan is pure waste
    there (and it was +26-38%% on the sub-second bench rows)."""
    if fit_max is not None:
        n = n_hint if n_hint is not None else embeddings.count()
        if n > fit_max:
            cut = int(0xFFFFFF * (fit_max / n))
            embeddings = embeddings.filter(
                F.conv(
                    F.substring(F.md5(F.col("vec_id").cast("string")), 1, 6),
                    16, 10,
                ).cast("bigint")
                < F.lit(cut)
            )
    pts = _pts(embeddings)
    w = Window.partitionBy("pos")
    rk = F.row_number().over(w.orderBy("val", "vec_id"))
    pick = F.expr("(count(*) OVER (PARTITION BY pos) + 1) DIV 2")
    return (
        pts.withColumn("rk", rk)
        .withColumn("pick", pick)
        .filter(F.col("rk") == F.col("pick"))
        .select("pos", F.col("val").alias("med"))
    )


def binq_codes(embeddings: DataFrame, thresholds: DataFrame) -> DataFrame:
    """Relational encode: (vec_id, lo, hi) bigint halves via explode +
    threshold join + bit-packing aggregate (the oracle-parity form)."""
    pts = _pts(embeddings)
    bits = pts.join(F.broadcast(thresholds), "pos").select(
        "vec_id", "pos", (F.col("val") > F.col("med")).cast("bigint").alias("bit")
    )
    lo = F.sum(
        F.when(
            F.col("pos") < 32,
            F.col("bit") * F.expr("shiftleft(CAST(1 AS BIGINT), pos)"),
        ).otherwise(F.lit(0))
    )
    hi = F.sum(
        F.when(
            F.col("pos") >= 32,
            F.col("bit") * F.expr("shiftleft(CAST(1 AS BIGINT), pos - 32)"),
        ).otherwise(F.lit(0))
    )
    return bits.groupBy("vec_id").agg(lo.alias("lo"), hi.alias("hi"))


def binq_encode_arrays(embeddings: DataFrame, thresholds: DataFrame) -> DataFrame:
    """Arrow scale path: numpy bit-packing over Arrow batches — one pass,
    no explode (the 64× row inflation), no interpreted HOF.  The 64
    thresholds ride along as a closure constant (model-state-sized)."""
    import numpy as np

    # per-dimension medians: pos grain, ≤ 64 rows (one per packed bit) —
    # driver-side model state
    med_rows = sorted((r["pos"], r["med"]) for r in thresholds.collect())
    assert len(med_rows) <= 64, f"binq threshold grain blew up: {len(med_rows)} rows"
    med = np.array([m for _, m in med_rows], dtype=np.float64)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            bits = (mat > med[None, :]).astype(np.uint64)
            sh = np.arange(32, dtype=np.uint64)
            lo = (bits[:, :32] << sh[None, :]).sum(axis=1).astype(np.int64)
            hi = (bits[:, 32:64] << sh[None, :]).sum(axis=1).astype(np.int64)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "lo": lo, "hi": hi})

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, schema="vec_id bigint, lo bigint, hi bigint"
    )


def parquet_num_rows(path: str) -> int | None:
    """Corpus size from the parquet FOOTER — the free ``n_hint`` for
    ``binq_thresholds``'s sampling gate (no Spark job, one metadata
    read).  None when the path isn't a single local parquet file."""
    try:
        import pyarrow.parquet as papq

        return int(papq.ParquetFile(path).metadata.num_rows)
    except Exception:
        return None


def binq_hamming_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = K,
    n_hint: int | None = None,
) -> DataFrame:
    """(vec_id, hamming) top-k by XOR-popcount over the packed codes."""
    codes = binq_codes(embeddings, binq_thresholds(embeddings, n_hint=n_hint))
    q = codes.filter(F.col("vec_id") == query_vec_id).select(
        F.col("lo").alias("qlo"), F.col("hi").alias("qhi")
    )
    ham = (
        codes.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            (
                F.expr("bit_count(lo ^ qlo)") + F.expr("bit_count(hi ^ qhi)")
            ).cast("bigint").alias("hamming"),
        )
    )
    return ham.orderBy("hamming", "vec_id").limit(k)


def binq_rerank_topk(
    embeddings: DataFrame,
    query_vec_id: int = 0,
    k: int = K,
    n_hint: int | None = None,
) -> DataFrame:
    """Hamming top-(4k) candidates re-scored with decimal-exact L2 —
    the standard binary-quantize-then-rescore serving shape."""
    cands = binq_hamming_topk(
        embeddings, query_vec_id, CAND_FACTOR * k, n_hint=n_hint
    ).select("vec_id")
    pts = _pts(embeddings)
    q = pts.filter(F.col("vec_id") == query_vec_id).select(
        "pos", F.col("val").alias("qval")
    )
    d2 = (
        pts.join(F.broadcast(cands), "vec_id")
        .join(F.broadcast(q), "pos")
        .groupBy("vec_id")
        .agg(
            F.round(
                F.sum(
                    ((F.col("val") - F.col("qval")) * (F.col("val") - F.col("qval")))
                    .cast("decimal(38,15)")
                ),
                6,
            )
            .cast("double")
            .alias("l2_dist"),
        )
    )
    return d2.orderBy("l2_dist", "vec_id").limit(k)


_MEDS_SQL = """
        pts AS (
            SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
                   CAST(unnest(embedding) AS DOUBLE) AS val
            FROM embeddings),
        meds AS (
            SELECT pos, val AS med FROM (
                SELECT pos, val,
                       ROW_NUMBER() OVER (PARTITION BY pos ORDER BY val, vec_id) AS rk,
                       COUNT(*) OVER (PARTITION BY pos) AS n
                FROM pts)
            WHERE rk = (n + 1) // 2),
        bits AS (
            SELECT p.vec_id, p.pos,
                   CASE WHEN p.val > m.med THEN 1 ELSE 0 END AS bit
            FROM pts p JOIN meds m USING (pos)),
        codes AS (
            SELECT vec_id,
                   SUM(CASE WHEN pos < 32
                            THEN bit * (1::BIGINT << pos) ELSE 0 END) AS lo,
                   SUM(CASE WHEN pos >= 32
                            THEN bit * (1::BIGINT << (pos - 32)) ELSE 0 END) AS hi
            FROM bits GROUP BY vec_id),
        q AS (SELECT lo AS qlo, hi AS qhi FROM codes WHERE vec_id = 0),
        ham AS (
            SELECT c.vec_id,
                   CAST(bit_count(xor(c.lo, q.qlo))
                        + bit_count(xor(c.hi, q.qhi)) AS BIGINT) AS hamming
            FROM codes c CROSS JOIN q WHERE c.vec_id <> 0)
"""


@check(
    "binq_hamming_top10",
    oracle="WITH " + _MEDS_SQL + f"""
        SELECT vec_id, hamming FROM ham ORDER BY hamming, vec_id LIMIT {K}""",
)
def q_binq_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbors of vec 0 by packed-bit Hamming distance —
    integer-exact against the DuckDB bit-twiddling oracle."""
    emb = load(spark, sf_dir, "embeddings")
    return binq_hamming_topk(
        emb, 0, K, n_hint=parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    )


@check(
    "binq_rerank_top10",
    oracle="WITH " + _MEDS_SQL + f""",
        cands AS (SELECT vec_id FROM ham ORDER BY hamming, vec_id
                  LIMIT {CAND_FACTOR * K}),
        qpts AS (SELECT pos, val AS qval FROM pts WHERE vec_id = 0),
        dist AS (
            SELECT p.vec_id,
                   ROUND(SUM(CAST((p.val - q.qval) * (p.val - q.qval)
                                  AS DECIMAL(38,15))), 6) AS d2
            FROM pts p
            JOIN cands c USING (vec_id)
            JOIN qpts q USING (pos)
            GROUP BY p.vec_id)
        SELECT vec_id, CAST(d2 AS DOUBLE) AS l2_dist
        FROM dist ORDER BY l2_dist, vec_id LIMIT {K}""",
)
def q_binq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantize → Hamming shortlist → decimal-exact L2 rerank:
    the 32×-compressed serving path's final top-10."""
    emb = load(spark, sf_dir, "embeddings")
    return binq_rerank_topk(
        emb, 0, K, n_hint=parquet_num_rows(f"{sf_dir}/embeddings.parquet")
    )


# ------------------------------------------------------- serving store --


def write_binq_store(
    emb: DataFrame,
    path: str,
    thresholds: DataFrame | None = None,
    n_hint: int | None = None,
) -> list[float]:
    """Persist the 1-bit serving index: (vec_id, lo, hi) — 16 bytes of
    code per vector, NO embedding floats on disk (32× smaller).  The
    64 medians (the only float state) return to the caller to live
    beside the index, the PQ-codebook discipline.  Encode is the Arrow
    numpy pass — one map-only scan."""
    th = (
        thresholds
        if thresholds is not None
        else binq_thresholds(emb, n_hint=n_hint)
    )
    # pos grain, ≤ 64 rows — the store sidecar returns the same
    # driver-side model state binq_encode_arrays asserts
    med_rows = sorted((r["pos"], r["med"]) for r in th.collect())
    assert len(med_rows) <= 64, f"binq threshold grain blew up: {len(med_rows)} rows"
    binq_encode_arrays(emb, th).write.mode("overwrite").parquet(path)
    return [float(m) for _, m in med_rows]


def binq_probe_store(
    spark: SparkSession,
    path: str,
    query_emb: list[float],
    medians: list[float],
    k: int = K,
) -> DataFrame:
    """Hamming top-k against the persisted code table: the query encodes
    driver-side against the stored medians (64 comparisons), the scan
    reads two bigints per vector, and the refine is XOR+popcount —
    no embedding column exists to read.  Equality with the in-memory
    search and the no-embedding-read scan are pytest-pinned."""
    qlo = qhi = 0
    for i, (v, m) in enumerate(zip(query_emb, medians)):
        if float(v) > m:
            if i < 32:
                qlo |= 1 << i
            else:
                qhi |= 1 << (i - 32)
    codes = spark.read.parquet(path)
    ham = codes.select(
        "vec_id",
        (
            F.expr(f"bit_count(lo ^ {qlo}L)") + F.expr(f"bit_count(hi ^ {qhi}L)")
        ).cast("bigint").alias("hamming"),
    )
    return ham.orderBy("hamming", "vec_id").limit(k)


@check(
    "binq_store_probe",
    oracle="WITH " + _MEDS_SQL + f"""
        SELECT vec_id, hamming FROM ham ORDER BY hamming, vec_id LIMIT {K}""",
)
def q_binq_store_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write the 16-byte/vector code store, probe it for vec 0's
    neighbors, drop the query's own row: must hash-match the in-memory
    Hamming search's oracle.  Scratch-dir check: collected
    in-function."""
    import tempfile

    emb = load(spark, sf_dir, "embeddings")
    q_emb = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    ]
    with tempfile.TemporaryDirectory() as td:
        path = td + "/binq_store"
        medians = write_binq_store(emb, path)
        rows = [
            (int(r["vec_id"]), int(r["hamming"]))
            for r in binq_probe_store(spark, path, q_emb, medians, k=K + 1).collect()
            if r["vec_id"] != 0
        ][:K]
    return spark.createDataFrame(rows, "vec_id bigint, hamming bigint")
