"""IVF-style approximate nearest neighbor — the coarse-quantizer scale
path for similarity search (north-star extension; LSH variant lives in
vectors/ann.py, brute force in vectors/knn.py).

IVF = inverted file index: a small set of CENTROIDS partitions the
embedding space into cells; every vector is assigned to its nearest
centroid (the "coarse quantization"), and a query probes only the
``NPROBE`` cells whose centroids are closest to it.  At 100 TB the cell
id is the physical partitioning column of the embedding table, so a
probe prunes to NPROBE/N_CENTROIDS of the data before any exact scoring.

A production pipeline would learn the centroids with k-means; here they
are a deterministic seed set (the first ``N_CENTROIDS`` vectors by
``vec_id``) so the oracle can mirror the assignment exactly.  The
argmin-over-centroids is expressed engine-neutrally as MIN over a packed
fixed-width string ``<micro-distance><cell-id>`` — a map-side-combinable
aggregate, not a window, so assignment is one shuffle of (vec_id, best)
pairs and scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check
from dronedb_spark.tables import load
from dronedb_spark.vectors.knn import _dot, _norm

N_CENTROIDS = 8
NPROBE = 2


def _centroids(embeddings: DataFrame) -> DataFrame:
    return embeddings.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").cast("int").alias("cid"), F.col("embedding").alias("c_emb")
    )


def _packed(cos: Column, cid: Column) -> Column:
    """Fixed-width '<round((1-cos)*1e6):9><cid:2>' — MIN of this string is
    the argmin over cells, identical in Spark and DuckDB."""
    micro = F.round((F.lit(1.0) - cos) * F.lit(1000000.0)).cast("bigint")
    return F.concat(
        F.lpad(micro.cast("string"), 9, "0"), F.lpad(cid.cast("string"), 2, "0")
    )


def ivf_assign(embeddings: DataFrame) -> DataFrame:
    """(vec_id, label, cell): nearest-centroid assignment by cosine."""
    cents = _centroids(embeddings)
    scored = embeddings.join(F.broadcast(cents)).select(
        "vec_id",
        "label",
        _packed(
            _dot("embedding", "c_emb") / (_norm("embedding") * _norm("c_emb")),
            F.col("cid"),
        ).alias("packed"),
    )
    return scored.groupBy("vec_id").agg(
        F.first("label").alias("label"),
        F.substring(F.min("packed"), 10, 2).cast("int").alias("cell"),
    )


def ivf_cell_counts(embeddings: DataFrame) -> DataFrame:
    """Per-cell histogram — the partition-size profile of the IVF index."""
    return (
        ivf_assign(embeddings)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("cell")
    )


def ivf_search(embeddings: DataFrame, query_vec_id: int, k: int = 5) -> DataFrame:
    """Top-k cosine probing only the NPROBE cells nearest the query."""
    cents = _centroids(embeddings)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    probe = (
        cents.join(F.broadcast(q))
        .select(
            "cid",
            _packed(
                _dot("c_emb", "q_emb") / (_norm("c_emb") * _norm("q_emb")),
                F.col("cid"),
            ).alias("packed"),
        )
        .orderBy("packed")
        .limit(NPROBE)
        .select(F.col("cid").alias("cell"))
    )
    cand = (
        ivf_assign(embeddings)
        .join(F.broadcast(probe), "cell", "left_semi")
        .filter(F.col("vec_id") != query_vec_id)
        .join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(q))
    )
    return (
        cand.select(
            "vec_id",
            "label",
            F.round(
                _dot("embedding", "q_emb") / (_norm("embedding") * _norm("q_emb")), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(k)
    )


# ---------------------------------------------------------------- checks

# list_dot_product = sequential multiply-add, bit-identical to the indexed
# lambda fold but without per-element lambda dispatch (see vectors/ann.py).
_D_NORM = "sqrt(list_dot_product(CAST({v} AS DOUBLE[]), CAST({v} AS DOUBLE[])))"
_D_DOT = "list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def _d_packed(cos: str, cid: str) -> str:
    return (
        f"lpad(CAST(CAST(ROUND((1.0 - ({cos})) * 1000000.0) AS BIGINT) AS VARCHAR), 9, '0')"
        f" || lpad(CAST({cid} AS VARCHAR), 2, '0')"
    )


_D_ASSIGN = f"""
    c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS c_emb
          FROM embeddings WHERE vec_id < {N_CENTROIDS}),
    scored AS (
        SELECT e.vec_id, e.label,
               {_d_packed(_D_DOT.format(a='e.embedding', b='c.c_emb')
                          + ' / (' + _D_NORM.format(v='e.embedding')
                          + ' * ' + _D_NORM.format(v='c.c_emb') + ')', 'c.cid')} AS packed
        FROM embeddings e CROSS JOIN c),
    assign AS (
        SELECT vec_id, MIN(label) AS label,
               CAST(substr(MIN(packed), 10, 2) AS INT) AS cell
        FROM scored GROUP BY vec_id)
"""


@check(
    "ivf_cell_counts",
    oracle=f"""
        WITH {_D_ASSIGN}
        SELECT cell, CAST(COUNT(1) AS BIGINT) AS n
        FROM assign GROUP BY cell ORDER BY cell""",
)
def q_ivf_cell_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_cell_counts(load(spark, sf_dir, "embeddings"))


@check(
    "ivf_search_top5",
    oracle=f"""
        WITH {_D_ASSIGN},
        q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0),
        probe AS (
            SELECT c.cid AS cell
            FROM c CROSS JOIN q
            ORDER BY {_d_packed(_D_DOT.format(a='c.c_emb', b='q.q_emb')
                                + ' / (' + _D_NORM.format(v='c.c_emb')
                                + ' * ' + _D_NORM.format(v='q.q_emb') + ')', 'c.cid')}
            LIMIT {NPROBE})
        SELECT e.vec_id, e.label,
               ROUND({_D_DOT.format(a='e.embedding', b='q.q_emb')}
                     / ({_D_NORM.format(v='e.embedding')}
                        * {_D_NORM.format(v='q.q_emb')}), 6) AS cos_sim
        FROM embeddings e
        JOIN assign a ON a.vec_id = e.vec_id
        CROSS JOIN q
        WHERE a.cell IN (SELECT cell FROM probe) AND e.vec_id <> 0
        ORDER BY cos_sim DESC, e.vec_id LIMIT 5""",
)
def q_ivf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_search(load(spark, sf_dir, "embeddings"), query_vec_id=0, k=5)
