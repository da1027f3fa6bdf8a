"""SemDeDup — semantic (embedding-space) deduplication via cluster-then-
prune (beyond the reference; public method: Abbas et al., "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication").

The method that makes embedding dedup tractable at corpus scale: an
ALL-pairs cosine pass is O(n²); clustering first (here the IVF coarse
quantizer, ``vectors/ivf.py``) confines the pairwise pass to within-
cluster candidates — O(Σ nᵢ²) with nᵢ ≈ n/k — and each cluster's pass
is an equi-self-join on the cell id, so the whole prune is one shuffle
keyed by cell.  Within a cluster, every vector whose cosine similarity
to a LOWER-id member reaches the threshold is dropped; the minimum id
of each duplicate group survives as its representative (deterministic,
no iteration).

At 100 TB: cell is the partitioning column (same layout the IVF index
already wants), the self-join never crosses cells, and a skewed mega-
cell is exactly the case AQE's skew-join split handles — or raise
N_CENTROIDS, which shrinks every nᵢ quadratically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load
from dronedb_spark.vectors.ivf import _D_ASSIGN, ivf_assign
from dronedb_spark.vectors.knn import _dot, _norm

SEM_THRESH = 0.95


def semdedup(embeddings: DataFrame, thresh: float = SEM_THRESH) -> DataFrame:
    """→ (vec_id, cell, kept): cluster with the IVF quantizer, prune
    within-cell near-duplicates, keep each group's minimum id."""
    vecs = ivf_assign(embeddings).select("vec_id", "cell").join(
        embeddings.select("vec_id", "embedding"), "vec_id"
    )
    a = vecs.select(
        "cell", F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_emb")
    )
    b = vecs.select(
        "cell", F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb")
    )
    cos = _dot("a_emb", "b_emb") / (_norm("a_emb") * _norm("b_emb"))
    dropped = (
        a.join(b, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.round(cos, 6) >= thresh)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_drop", F.lit(1))
    )
    return (
        ivf_assign(embeddings)
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id", "cell", F.col("_drop").isNull().alias("kept")
        )
    )


# ------------------------------------------------------------------ check

# The synthetic embeddings carry no organic high-cosine pairs (max
# within-cell cos ≈ 0.49), so the scored corpus injects EXACT duplicates
# of every 5th vector at vec_id+10000 — cos 1.0 with their originals,
# same cell by construction — and the check pins that exactly those
# copies are pruned while every organic vector survives.
_SEM_CORPUS = """
    SELECT vec_id, embedding, label FROM embeddings
    UNION ALL
    SELECT vec_id + 10000 AS vec_id, embedding, label
    FROM embeddings WHERE vec_id % 5 = 0
"""


@check(
    "semdedup_cell_prune",
    # DuckDB rejects a CTE that shadows the base table it reads, so the
    # assignment CTE text is re-pointed at the injected corpus by name
    oracle=f"""
        WITH sem_corpus AS ({_SEM_CORPUS}),
        {_D_ASSIGN.replace("FROM embeddings", "FROM sem_corpus")},
        v AS (SELECT a.vec_id, a.cell, e.embedding
              FROM assign a JOIN sem_corpus e USING (vec_id)),
        dropped AS (
            SELECT DISTINCT b.vec_id
            FROM v a JOIN v b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE ROUND(
                list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
                / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
                   * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])))),
                6) >= {SEM_THRESH}
        )
        SELECT a.vec_id, a.cell, (d.vec_id IS NULL) AS kept
        FROM assign a LEFT JOIN dropped d ON a.vec_id = d.vec_id
        ORDER BY a.vec_id""",
)
def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    corpus = emb.unionByName(
        emb.filter(F.col("vec_id") % 5 == 0).withColumn(
            "vec_id", F.col("vec_id") + 10000
        )
    )
    return semdedup(corpus).orderBy("vec_id")
