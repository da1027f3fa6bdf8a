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


# ---------------------------------------------------------------- k-means
# The deterministic seed-set quantizer above is the oracle-friendly
# baseline; production IVF LEARNS its centroids.  Lloyd iterations are
# plain DataFrame algebra: assign (broadcast centroids, packed argmin —
# map-side combinable) then update (per-cell per-component AVG).  Each
# iteration is ONE shuffle of (cell, embedding); at 100 TB the assign
# side never materializes driver-side and the update aggregate is k×dim
# doubles.  Centroid components are ROUNDED to 6 dp at each iteration
# barrier so the result is independent of partial-aggregation order (and
# therefore engine-exact for the oracle's unrolled iterations).

DIM = 64
KMEANS_ITERS = 2


def _assign_cells(embeddings: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, cell): nearest-centroid assignment by cosine."""
    scored = embeddings.join(F.broadcast(cents)).select(
        "vec_id",
        _packed(
            _dot("embedding", "c_emb") / (_norm("embedding") * _norm("c_emb")),
            F.col("cid"),
        ).alias("packed"),
    )
    return scored.groupBy("vec_id").agg(
        F.substring(F.min("packed"), 10, 2).cast("int").alias("cell")
    )


def ivf_kmeans_centroids(
    embeddings: DataFrame, k: int = N_CENTROIDS, iters: int = KMEANS_ITERS, dim: int = DIM
) -> DataFrame:
    """(cid, c_emb): centroids after ``iters`` Lloyd iterations from the
    deterministic seed init (first k vectors by vec_id).

    Each iteration MATERIALIZES its k×dim centroid table to the driver
    (tiny model state, the same contract as MLlib's KMeans) — without the
    barrier, Catalyst re-executes every earlier iteration inside each
    later one (no cross-branch CSE), turning `iters` passes into
    O(iters²) work."""
    spark = embeddings.sparkSession
    cents = _centroids(embeddings.filter(F.col("vec_id") < k))
    for _ in range(iters):
        assign = _assign_cells(embeddings, cents)
        joined = assign.join(embeddings.select("vec_id", "embedding"), "vec_id")
        mean_cols = [
            F.round(F.avg(F.col("embedding")[i].cast("double")), 6).alias(f"_e{i}")
            for i in range(dim)
        ]
        rows = joined.groupBy("cell").agg(*mean_cols).collect()
        cents = spark.createDataFrame(
            [(int(r["cell"]), [r[f"_e{i}"] for i in range(dim)]) for r in rows],
            schema="cid int, c_emb array<double>",
        )
    return cents


def ivf_kmeans_cells(embeddings: DataFrame) -> DataFrame:
    """Per-cell histogram + centroid-norm fingerprint after training."""
    cents = ivf_kmeans_centroids(embeddings)
    assign = _assign_cells(embeddings, cents)
    hist = assign.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    return (
        hist.join(cents.select(F.col("cid").alias("cell"), "c_emb"), "cell")
        .select("cell", "n", F.round(_norm("c_emb"), 6).alias("c_norm"))
        .orderBy("cell")
    )


def _d_assign_sql(cents_rel: str) -> str:
    """DuckDB: nearest-centroid assignment against relation ``cents_rel``
    (cid, c_emb DOUBLE[])."""
    cos = (
        f"list_dot_product(CAST(e.embedding AS DOUBLE[]), c.c_emb)"
        f" / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])))"
        f" * sqrt(list_dot_product(c.c_emb, c.c_emb)))"
    )
    return f"""
        SELECT vec_id, CAST(substr(MIN({_d_packed(cos, 'c.cid')}), 10, 2) AS INT) AS cell
        FROM embeddings e CROSS JOIN {cents_rel} c
        GROUP BY vec_id
    """


def _d_update_sql(assign_rel: str) -> str:
    """DuckDB: per-cell per-component mean, rounded like the Spark side."""
    return f"""
        SELECT cell AS cid, list(avg_v ORDER BY pos) AS c_emb FROM (
            SELECT a.cell, p.pos, ROUND(AVG(CAST(e.embedding[p.pos] AS DOUBLE)), 6) AS avg_v
            FROM {assign_rel} a
            JOIN embeddings e USING (vec_id)
            CROSS JOIN (SELECT unnest(range(1, {DIM} + 1)) AS pos) p
            GROUP BY a.cell, p.pos) t
        GROUP BY cell
    """


@check(
    "ivf_kmeans_cells",
    oracle=f"""
        WITH c0 AS (SELECT CAST(vec_id AS INT) AS cid, CAST(embedding AS DOUBLE[]) AS c_emb
                    FROM embeddings WHERE vec_id < {N_CENTROIDS}),
        a1 AS ({_d_assign_sql('c0')}),
        c1 AS ({_d_update_sql('a1')}),
        a2 AS ({_d_assign_sql('c1')}),
        c2 AS ({_d_update_sql('a2')}),
        a3 AS ({_d_assign_sql('c2')})
        SELECT a.cell, CAST(COUNT(1) AS BIGINT) AS n,
               ROUND(sqrt(list_dot_product(c.c_emb, c.c_emb)), 6) AS c_norm
        FROM a3 a JOIN c2 c ON c.cid = a.cell
        GROUP BY a.cell, c.c_emb ORDER BY a.cell""",
)
def q_ivf_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ivf_kmeans_cells(load(spark, sf_dir, "embeddings"))


# ------------------------------------------------- persisted index ----


def write_ivf_store(embeddings: DataFrame, path: str) -> None:
    """Persist the IVF index PARTITIONED BY cell — the production shape:
    assignment is the ingest-time cost, paid once; the on-disk layout
    puts each cell in its own directory so a probe's `cell IN (...)`
    predicate prunes at the PARTITION level and only NPROBE/N_CENTROIDS
    of the bytes are ever read (the band_store discipline applied to
    ANN; see text/dedup.py:band_store)."""
    (
        ivf_assign(embeddings)
        .join(embeddings.select("vec_id", "embedding"), "vec_id")
        # one file per cell directory, not one per (task × cell) — the
        # ann/semdedup/postings store discipline (guide §6)
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_probe_store(
    spark: SparkSession, path: str, embeddings: DataFrame, query_vec_id: int, k: int = 5
) -> DataFrame:
    """Top-k cosine against the persisted index: rank centroids against
    the query (a NPROBE-row driver scalar — the index's tiny model
    state), read ONLY those cells' partitions, score exactly.  Must
    return exactly what ``ivf_search`` returns on the same corpus."""
    cents = _centroids(embeddings)
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    probe_cells = [
        r["cid"]
        for r in cents.join(F.broadcast(q))
        .select(
            "cid",
            _packed(
                _dot("c_emb", "q_emb") / (_norm("c_emb") * _norm("q_emb")),
                F.col("cid"),
            ).alias("packed"),
        )
        .orderBy("packed")
        .limit(NPROBE)
        .collect()
    ]
    store = spark.read.parquet(path).filter(F.col("cell").isin(probe_cells))
    cand = store.filter(F.col("vec_id") != query_vec_id).join(F.broadcast(q))
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
