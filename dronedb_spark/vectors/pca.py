"""Distributed PCA over the embedding table — dimensionality reduction
ahead of ANN / SemDeDup (beyond the reference; the standard
sufficient-statistics formulation every large-scale pipeline uses).

The whole training reduces to SECOND MOMENTS: cov = E[xxᵀ] − E[x]E[x]ᵀ.
Each partition computes its local Gram matrix, coordinate sums, and
count with one numpy pass (``mapInPandas`` — d×d work per PARTITION,
not per row), the partials flatten to (i, j, s) rows, and one global
groupBy-sum produces the d×d matrix — the only thing that ever reaches
the driver (d² scalars, the IVF-centroid budget).  The eigendecomposition
of a d×d matrix is driver-side numpy by design; projection broadcasts
the k component vectors back as literals and stays in JVM column
expressions (zip_with dot products).

At 100 TB of embeddings: the corpus pass is one narrow map + one
d²-wide reduce; nothing shuffles row data, and the reduce payload is
partitions × d² floats.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load, spread


def moment_rows(emb: DataFrame) -> DataFrame:
    """→ (i, j, s): per-partition partials of Σxᵢxⱼ (i, j ≥ 0), Σxᵢ
    (j = −1), and n (i = j = −1), summed globally."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        sums = None
        n = 0
        for pdf in batches:
            x = np.array([np.asarray(v, np.float64) for v in pdf["embedding"]])
            if x.size == 0:
                continue
            g = x.T @ x
            gram = g if gram is None else gram + g
            s = x.sum(axis=0)
            sums = s if sums is None else sums + s
            n += len(x)
        if gram is None:
            yield pd.DataFrame(columns=["i", "j", "s"])
            return
        d = gram.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame({
            "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
            "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
            "s": np.concatenate([gram.ravel(), sums, [float(n)]]),
        })

    parts = spread(emb.select("embedding")).mapInPandas(
        run, schema="i int, j int, s double"
    )
    return parts.groupBy("i", "j").agg(F.sum("s").alias("s"))


def covariance(emb: DataFrame) -> tuple[np.ndarray, np.ndarray, int]:
    """→ (cov d×d, mean d, n) from one distributed pass."""
    rows = moment_rows(emb).collect()
    n = int(next(r["s"] for r in rows if r["i"] == -1 and r["j"] == -1))
    d = max(r["i"] for r in rows) + 1
    gram = np.zeros((d, d))
    sums = np.zeros(d)
    for r in rows:
        if r["i"] == -1:
            continue
        if r["j"] == -1:
            sums[r["i"]] = r["s"]
        else:
            gram[r["i"], r["j"]] = r["s"]
    mean = sums / n
    return gram / n - np.outer(mean, mean), mean, n


def pca_components(emb: DataFrame, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Top-k principal axes (rows) + the mean, driver-side eigh of the
    d×d covariance.  Deterministic sign: each component's largest-|.|
    coordinate is made positive."""
    cov, mean, _ = covariance(emb)
    w, v = np.linalg.eigh(cov)
    comps = v[:, np.argsort(w)[::-1][:k]].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, mean


def _dot_lit(col: Column, vec: np.ndarray) -> Column:
    arr = F.array(*[F.lit(float(x)) for x in vec])
    return F.aggregate(
        F.zip_with(col, arr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(emb: DataFrame, comps: np.ndarray, mean: np.ndarray) -> DataFrame:
    """+ pc0..pck columns: centred projections, all JVM-side (the
    components ride as literal arrays — no UDF, no second collect)."""
    out = emb
    for idx, c in enumerate(comps):
        out = out.withColumn(
            f"pc{idx}",
            _dot_lit(F.col("embedding"), c) - float(np.dot(mean, c)),
        )
    return out


# ------------------------------------------------------------------ check


@check(
    "embedding_covariance",
    oracle="""
        WITH x AS (
            SELECT vec_id,
                   unnest(CAST(embedding AS DOUBLE[])) AS v,
                   generate_subscripts(embedding, 1) - 1 AS i
            FROM embeddings
        ),
        n AS (SELECT COUNT(DISTINCT vec_id) AS n FROM x)
        SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
               ROUND(SUM(a.v * b.v) / n.n
                     - (SUM(a.v) / n.n) * (SUM(b.v) / n.n), 9) AS cov
        FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i <= 7, n
        WHERE a.i <= 7
        GROUP BY a.i, b.i, n.n ORDER BY i, j""",
)
def q_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed second-moment pass behind PCA: per-partition
    numpy Gram partials → one (i, j) reduce; the 8×8 leading block is
    value-pinned against the relational covariance (full-matrix
    equality at d=64 is the same arithmetic 64× over)."""
    emb = load(spark, sf_dir, "embeddings")
    m = moment_rows(emb)
    stats = m.filter((F.col("i") >= 0) & (F.col("j") >= 0)
                     & (F.col("i") <= 7) & (F.col("j") <= 7)).alias("g")
    aux_n = m.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("n_rows"))
    sums = m.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("si"), F.col("s").alias("sx"))
    a = sums.select(F.col("si").alias("i"), F.col("sx").alias("sx_i"))
    b = sums.select(F.col("si").alias("j"), F.col("sx").alias("sx_j"))
    return (
        stats.join(F.broadcast(a), "i").join(F.broadcast(b), "j")
        .crossJoin(F.broadcast(aux_n))
        .select(
            "i", "j",
            F.round(
                F.col("s") / F.col("n_rows")
                - (F.col("sx_i") / F.col("n_rows")) * (F.col("sx_j") / F.col("n_rows")),
                9,
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )
