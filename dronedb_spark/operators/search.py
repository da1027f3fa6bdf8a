"""Path search / list — the reference's interactive query path.

Reference lifecycle: ``ddb search`` → ``searchIndex`` (dbops.cpp:601-627) →
``getMatchingEntries`` (dbops.cpp:916-987): sanitized LIKE predicate +
optional depth cut + ORDER BY path.  Spark-first: the predicate is a
Catalyst ``LIKE ... ESCAPE`` expression pushed down to the Parquet scan
(StartsWith prefixes prune row groups — SURVEY X3); ``depth`` is a
materialized pruning column (SURVEY X2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_df, with_catalog
from dronedb_spark.functions.like import folder_pattern, like_col, sanitize_query_param
from dronedb_spark.suite import check


def _like(pattern_sql: str) -> F.Column:
    return like_col("path", pattern_sql)


def search(entries: DataFrame, pattern: str, max_depth: int = 0) -> DataFrame:
    """``ddb search <pattern>`` (P1, P3, O1)."""
    df = entries.filter(_like(sanitize_query_param(pattern)))
    if max_depth > 0:
        df = df.filter(F.col("depth") <= max_depth - 1)
    return df.orderBy("path")


def list_folder(entries: DataFrame, folder: str, max_depth: int = 0) -> DataFrame:
    """``ddb list <folder>`` — the folder row itself plus descendants
    (P2: pattern + '//%' suffix, dbops.cpp:934-939), folders-first ordering
    (O3: sort by type then path, dbops.cpp:539-541)."""
    own = _like(sanitize_query_param(folder)) if folder else F.lit(True)
    desc = _like(folder_pattern(folder))
    df = entries.filter(own | desc)
    if max_depth > 0:
        df = df.filter(F.col("depth") <= max_depth - 1)
    return df.dropDuplicates(["path"]).orderBy("type", "path")


# ---------------------------------------------------------------- checks

_PAT = "src_/doc_*2.txt"  # exercises '_' single-char wildcard + '*' → '%'
_PAT_SQL = sanitize_query_param(_PAT)

_SEARCH_COLS = ["path", "hash", "type", "size", "mtime", "depth"]


@check(
    "catalog_search_like",
    oracle=with_catalog(
        f"""SELECT path, hash, type, size, mtime, depth FROM entries
            WHERE path LIKE '{_PAT_SQL}' ESCAPE '/' ORDER BY path"""
    ),
)
def q_search_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    return search(entries_df(spark, sf_dir), _PAT).select(*_SEARCH_COLS)


_FOLDER = "src1"
_FOLDER_SQL = sanitize_query_param(_FOLDER)
_FOLDER_DESC = folder_pattern(_FOLDER)


@check(
    "catalog_list_folder",
    oracle=with_catalog(
        f"""SELECT path, hash, type, size, mtime, depth FROM entries
            WHERE (path LIKE '{_FOLDER_SQL}' ESCAPE '/'
                   OR path LIKE '{_FOLDER_DESC}' ESCAPE '/')
              AND depth <= 1
            ORDER BY type, path"""
    ),
)
def q_list_folder(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_depth=2 → depth <= 1 (dbops.cpp:966-967: depth <= maxDepth - 1)
    return list_folder(entries_df(spark, sf_dir), _FOLDER, max_depth=2).select(*_SEARCH_COLS)


@check(
    "catalog_type_filter_paging",
    oracle=with_catalog(
        """SELECT path, type, size FROM entries
           WHERE type IN (3, 4, 5)
           ORDER BY path LIMIT 50 OFFSET 20"""
    ),
)
def q_type_filter_paging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type filter (P4, dbops.cpp:1039-1063) + LIMIT/OFFSET paging (O5)."""
    return (
        entries_df(spark, sf_dir)
        .filter(F.col("type").isin(3, 4, 5))
        .orderBy("path")
        .select("path", "type", "size")
        .offset(20)
        .limit(50)
    )


@check(
    "catalog_missing_folders",
    oracle=with_catalog(
        """SELECT DISTINCT parent AS path FROM (
               SELECT CASE WHEN depth = 2
                           THEN substr(path, 1, length(path) - strpos(reverse(path), '/'))
                           ELSE NULL END AS parent
               FROM entries WHERE type <> 1 AND depth >= 2
           ) p
           WHERE parent IS NOT NULL
             AND parent NOT IN (SELECT path FROM entries WHERE type = 1)
           ORDER BY path"""
    ),
)
def q_missing_folders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Folder-consistency anti-join (J6): parents referenced by file paths
    but absent as Directory rows (FOLDER_CONSISTENCY_QUERY,
    dbops.cpp:1284-1314).  Derives every ancestor of each file path and
    anti-joins against type=1 rows; the anti-join broadcasts the (small)
    directory side at scale."""
    entries = entries_df(spark, sf_dir)
    files = entries.filter(F.col("type") != 1)
    parents = (
        files.select(
            F.explode(
                F.expr(
                    """transform(sequence(1, size(split(path, '/')) - 1),
                                 i -> array_join(slice(split(path, '/'), 1, i), '/'))"""
                )
            ).alias("path")
        )
        .distinct()
    )
    dirs = entries.filter(F.col("type") == 1).select("path")
    return parents.join(dirs, "path", "left_anti").orderBy("path")


def entry_info(entries: DataFrame, suffixes: list[str]) -> DataFrame:
    """getEntry / ``ddb info`` (P9, K1; dbops.cpp:1324-1338, info.cpp:27-103):
    exact-entry lookup with the full projection — fixed columns, point
    geometry components (the GeoJSON-coordinates encoding is plain struct
    assembly over these), and the capture-instant coalesce (P7).  The path
    predicate is a pushable suffix LIKE, so at scale the Parquet scan
    prunes on path statistics before any other work."""
    cond = None
    for s in suffixes:
        this = F.col("path").endswith(s)
        cond = this if cond is None else (cond | this)
    inst = F.when(
        F.col("capture_ms") > 0,
        ((F.col("capture_ms") - F.col("capture_ms") % 1000) / 1000).cast("bigint"),
    ).otherwise(F.col("mtime"))
    return (
        entries.filter(cond)
        .select(
            "path", "hash", "type", "size", "mtime", "depth",
            "point_lon", "point_lat", "point_alt",
            inst.alias("instant_s"),
        )
        .orderBy("path")
    )


_INFO_SUFFIXES = ["/doc_000010.txt", "/doc_000033.txt", "/doc_000207.txt"]


@check(
    "entry_info",
    oracle=with_catalog(
        """SELECT path, hash, type, size, mtime, depth,
                  point_lon, point_lat, point_alt,
                  CASE WHEN capture_ms > 0
                       THEN CAST((capture_ms - (capture_ms % 1000)) / 1000 AS BIGINT)
                       ELSE mtime END AS instant_s
           FROM entries
           WHERE path LIKE '%/doc_000010.txt' OR path LIKE '%/doc_000033.txt'
              OR path LIKE '%/doc_000207.txt'
           ORDER BY path"""
    ),
)
def q_entry_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    return entry_info(entries_df(spark, sf_dir), _INFO_SUFFIXES)


# ------------------------------------------------- K1 JSON sink + P10 paths


def entry_json(entries: DataFrame) -> DataFrame:
    """K1 (``ddb info --format json``, info.cpp:27-103): one JSON document
    per entry, nested like the reference's output — fixed fields under
    ``entry``, geometry components under ``geo``.  Pure ``to_json`` struct
    assembly: JVM-side, codegen, no Python in the loop."""
    return entries.select(
        "path",
        F.to_json(
            F.struct(
                F.struct("path", "hash", "type", "size", "mtime", "depth").alias("entry"),
                F.struct(
                    F.col("point_lon").alias("lon"),
                    F.col("point_lat").alias("lat"),
                    F.col("point_alt").alias("alt"),
                ).alias("geo"),
            )
        ).alias("doc"),
    )


@check(
    "json_sink_roundtrip",
    oracle=with_catalog(
        """SELECT path, CAST(type AS INT) AS type, CAST(size AS BIGINT) AS size,
                  CAST(depth AS INT) AS depth,
                  COALESCE(point_lon, -999.0) AS lon,
                  COALESCE(point_lat, -999.0) AS lat
           FROM entries WHERE size % 17 = 3
           ORDER BY path"""
    ),
)
def q_json_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+P10 round-trip: entries → nested JSON documents (the text sink
    payload) → JSON-PATH extraction back to typed columns.  Any slip in
    the struct assembly, null omission, or dotted-path walk breaks value
    parity with the oracle's direct relational projection.  Doubles
    survive exactly: to_json emits shortest round-trip decimals and the
    cast parses them back to the identical binary."""
    docs = entry_json(entries_df(spark, sf_dir).filter(F.col("size") % 17 == 3))
    return docs.select(
        F.get_json_object("doc", "$.entry.path").alias("path"),
        F.get_json_object("doc", "$.entry.type").cast("int").alias("type"),
        F.get_json_object("doc", "$.entry.size").cast("bigint").alias("size"),
        F.get_json_object("doc", "$.entry.depth").cast("int").alias("depth"),
        F.coalesce(
            F.get_json_object("doc", "$.geo.lon").cast("double"), F.lit(-999.0)
        ).alias("lon"),
        F.coalesce(
            F.get_json_object("doc", "$.geo.lat").cast("double"), F.lit(-999.0)
        ).alias("lat"),
    ).orderBy("path")
