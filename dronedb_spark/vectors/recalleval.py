"""IVF recall calibration — measure recall@k of the IVF index against
exact brute force across a sweep of ``nprobe`` settings, the
operating-point curve an ANN deployment is tuned with (the vector
complement of ``text/dedup.py:lsh_calibration``; public method: the
recall/probe trade-off curve of Johnson et al., faiss).

Sampling is ENFORCED in-operator (the lsh_calibration lesson): the
ground-truth pass is brute-force by design, so the query set is a
deterministic ``ORDER BY vec_id LIMIT n_queries`` sample — a caller
cannot accidentally point the quadratic side at the full corpus.

Scale/efficiency shape: corpus cosines against the (broadcast) query
sample are scored ONCE; ground truth, and the IVF result at EVERY
nprobe, are all derived from that one scored table (cell ranks attach
per (query, cell) from a centroids-sized broadcast; an nprobe spine
cross-join + one window gives every setting's top-k without
rescoring).  The scoring pass is a dimension-sequential Arrow kernel
emitting MICRO-integer cosines (the ``evalfilter.py`` exactness
discipline), ranking ties break by vec_id, so the top-k SETS are
bit-deterministic across engines and recall is exact integer
arithmetic (``recall_micro = 10⁶·Σhits DIV (n_queries·k)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load
from dronedb_spark.vectors.ivf import (
    N_CENTROIDS,
    _centroids,
    _dot,
    _norm,
    ivf_assign,
)

N_QUERIES = 16
TOP_K = 10
NPROBES = (1, 2, 4, 8)


def _round_cos(a: str, b: str) -> F.Column:
    return F.round(_dot(a, b) / (_norm(a) * _norm(b)), 6)


def _scored_against_sample(
    embeddings: DataFrame, q_rows: list
) -> DataFrame:
    """(q_id, vec_id, cos_micro): every corpus vector scored against the
    query sample in ONE Arrow pass — dimension-sequential float64
    accumulation, the op sequence DuckDB's list_dot_product binds
    (the evalfilter.py discipline), so the micro-cosines are
    engine-exact."""
    import numpy as np
    import pandas as pd

    q_ids = np.asarray([r["vec_id"] for r in q_rows], dtype=np.int64)
    qm = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in q_rows]
    )
    ss_q = qm[:, 0] * qm[:, 0]
    for i in range(1, qm.shape[1]):
        ss_q = ss_q + qm[:, i] * qm[:, i]
    q_norm = np.sqrt(ss_q)
    nq = len(q_ids)

    def kernel(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            cv = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            dot = cv[:, 0][:, None] * qm[:, 0][None, :]
            ss_c = cv[:, 0] * cv[:, 0]
            for i in range(1, cv.shape[1]):
                dot = dot + cv[:, i][:, None] * qm[:, i][None, :]
                ss_c = ss_c + cv[:, i] * cv[:, i]
            cos = dot / (np.sqrt(ss_c)[:, None] * q_norm[None, :])
            micro = np.floor(cos * 1000000.0 + 0.5).astype(np.int64)
            vids = pdf["vec_id"].values.astype(np.int64)
            yield pd.DataFrame(
                {
                    "q_id": np.tile(q_ids, len(vids)),
                    "vec_id": np.repeat(vids, nq),
                    "cos_micro": micro.ravel(),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, schema="q_id bigint, vec_id bigint, cos_micro bigint"
    )


def ivf_recall_curve(
    embeddings: DataFrame,
    n_queries: int = N_QUERIES,
    k: int = TOP_K,
    nprobes=NPROBES,
) -> DataFrame:
    """(nprobe, n_queries, sum_hits, recall_micro): exact recall@k of
    IVF probing vs brute force, one row per nprobe setting."""
    spark = embeddings.sparkSession
    q_rows = (
        embeddings.orderBy("vec_id").limit(n_queries).select(
            "vec_id", "embedding"
        )
    ).collect()  # the query sample is the harness' tiny model state
    queries = F.broadcast(
        spark.createDataFrame(
            [(int(r["vec_id"]), list(r["embedding"])) for r in q_rows],
            "q_id bigint, q_emb array<double>",
        )
    )
    # one corpus × sample Arrow scoring pass, cells attached
    scored = (
        _scored_against_sample(embeddings, q_rows)
        .filter(F.col("vec_id") != F.col("q_id"))
        .join(ivf_assign(embeddings).select("vec_id", "cell"), "vec_id")
    )
    # per-query cell priority: rank of each centroid by distance
    cents = _centroids(embeddings)
    w_cell = Window.partitionBy("q_id").orderBy(
        F.desc("c_cos"), "cell"
    )
    cell_rank = (
        cents.join(queries)
        .select(
            "q_id",
            F.col("cid").alias("cell"),
            _round_cos("c_emb", "q_emb").alias("c_cos"),
        )
        .select("q_id", "cell", F.row_number().over(w_cell).alias("cell_rank"))
    )
    ranked = scored.join(F.broadcast(cell_rank), ["q_id", "cell"])
    # ground truth: top-k over everything
    w_q = Window.partitionBy("q_id").orderBy(F.desc("cos_micro"), "vec_id")
    truth = (
        ranked.withColumn("rn", F.row_number().over(w_q))
        .filter(F.col("rn") <= k)
        .select("q_id", "vec_id")
    )
    # every nprobe setting from the same scored table
    spine = F.broadcast(
        spark.createDataFrame([(int(p),) for p in nprobes], "nprobe int")
    )
    w_qp = Window.partitionBy("q_id", "nprobe").orderBy(
        F.desc("cos_micro"), "vec_id"
    )
    ivf_topk = (
        ranked.join(spine)
        .filter(F.col("cell_rank") <= F.col("nprobe"))
        .withColumn("rn", F.row_number().over(w_qp))
        .filter(F.col("rn") <= k)
        .select("nprobe", "q_id", "vec_id")
    )
    hits = ivf_topk.join(truth, ["q_id", "vec_id"], "left_semi")
    per_np = hits.groupBy("nprobe").agg(
        F.countDistinct("q_id").cast("bigint").alias("n_queries_hit"),
        F.count(F.lit(1)).cast("bigint").alias("sum_hits"),
    )
    return per_np.select(
        "nprobe",
        F.lit(n_queries).cast("bigint").alias("n_queries"),
        "sum_hits",
        F.expr(f"CAST(sum_hits * 1000000 DIV ({n_queries} * {k}) AS BIGINT)").alias(
            "recall_micro"
        ),
    )


_D_COS = (
    "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[]))))"
)


@check(
    "ivf_recall_curve",
    oracle=f"""
        WITH q AS (
            SELECT vec_id AS q_id, embedding AS q_emb
            FROM embeddings ORDER BY vec_id LIMIT {N_QUERIES}),
        c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS c_emb
              FROM embeddings WHERE vec_id < {N_CENTROIDS}),
        assign AS (
            SELECT e.vec_id,
                   CAST(substr(MIN(
                       lpad(CAST(CAST(ROUND((1.0 - ({_D_COS.format(a='e.embedding', b='c.c_emb')}))
                            * 1000000.0) AS BIGINT) AS VARCHAR), 9, '0')
                       || lpad(CAST(c.cid AS VARCHAR), 2, '0')), 10, 2) AS INT)
                       AS cell
            FROM embeddings e CROSS JOIN c GROUP BY e.vec_id),
        scored AS (
            SELECT q.q_id, e.vec_id, a.cell,
                   CAST(ROUND(({_D_COS.format(a='e.embedding', b='q.q_emb')})
                        * 1000000.0) AS BIGINT) AS cos_micro
            FROM embeddings e
            JOIN assign a ON a.vec_id = e.vec_id
            CROSS JOIN q
            WHERE e.vec_id <> q.q_id),
        cell_rank AS (
            SELECT q_id, cell,
                   ROW_NUMBER() OVER (PARTITION BY q_id
                       ORDER BY c_cos DESC, cell) AS cell_rank
            FROM (
                SELECT q.q_id, c.cid AS cell,
                       ROUND({_D_COS.format(a='c.c_emb', b='q.q_emb')}, 6) AS c_cos
                FROM c CROSS JOIN q)),
        ranked AS (
            SELECT s.*, r.cell_rank
            FROM scored s JOIN cell_rank r
              ON r.q_id = s.q_id AND r.cell = s.cell),
        truth AS (
            SELECT q_id, vec_id FROM (
                SELECT q_id, vec_id,
                       ROW_NUMBER() OVER (PARTITION BY q_id
                           ORDER BY cos_micro DESC, vec_id) AS rn
                FROM ranked) WHERE rn <= {TOP_K}),
        spine AS (SELECT * FROM (VALUES (1), (2), (4), (8)) AS s(nprobe)),
        ivf_topk AS (
            SELECT nprobe, q_id, vec_id FROM (
                SELECT sp.nprobe, rk.q_id, rk.vec_id,
                       ROW_NUMBER() OVER (PARTITION BY rk.q_id, sp.nprobe
                           ORDER BY rk.cos_micro DESC, rk.vec_id) AS rn
                FROM ranked rk JOIN spine sp ON rk.cell_rank <= sp.nprobe)
            WHERE rn <= {TOP_K}),
        hits AS (
            SELECT i.nprobe, i.q_id, i.vec_id
            FROM ivf_topk i JOIN truth t
              ON t.q_id = i.q_id AND t.vec_id = i.vec_id)
        SELECT nprobe, CAST({N_QUERIES} AS BIGINT) AS n_queries,
               CAST(COUNT(1) AS BIGINT) AS sum_hits,
               CAST((COUNT(1) * 1000000) // ({N_QUERIES} * {TOP_K}) AS BIGINT)
                   AS recall_micro
        FROM hits GROUP BY nprobe ORDER BY nprobe""",
)
def q_ivf_recall_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of IVF at nprobe ∈ {1,2,4,8} over a 16-query
    deterministic sample — one scored pass feeds truth and every
    setting; nprobe=8 (all cells) must reach recall 1.0."""
    return ivf_recall_curve(load(spark, sf_dir, "embeddings")).orderBy("nprobe")
