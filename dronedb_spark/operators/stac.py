"""STAC ItemCollection query — the reference's richest read path
(SURVEY §3.2: generateStacItemCollection, stac.cpp:597-713).

Semantics: geometry-presence predicate (P5) + MBR bbox intersection (P6,
``MbrIntersects`` folded to 4 comparisons on materialized bbox columns —
SURVEY X9: no geometry library, fully Catalyst-pushable) + temporal
instant predicate (P7: captureTime ms → s when > 0 else mtime) + COUNT for
``numberMatched`` (A2) + ORDER BY path LIMIT/OFFSET paging (O5, default
limit 10, stac.cpp:610-613).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.catalog.derive import entries_df, with_catalog
from dronedb_spark.suite import check


def _instant() -> Column:
    return F.when(
        F.col("capture_ms") > 0,
        ((F.col("capture_ms") - F.col("capture_ms") % 1000) / 1000).cast("bigint"),
    ).otherwise(F.col("mtime"))


def _bbox_intersects(minx: float, miny: float, maxx: float, maxy: float) -> Column:
    """MBR intersection (stac.cpp:629-636) as pure column arithmetic:
    NOT (disjoint on either axis)."""
    return ~(
        (F.col("bbox_maxx") < F.lit(minx))
        | (F.col("bbox_minx") > F.lit(maxx))
        | (F.col("bbox_maxy") < F.lit(miny))
        | (F.col("bbox_miny") > F.lit(maxy))
    )


def stac_item_filter(
    entries: DataFrame,
    bbox: tuple[float, float, float, float] | None = None,
    t_start: int | None = None,
    t_end: int | None = None,
) -> DataFrame:
    df = entries.filter(F.col("type") != 1).filter(
        F.col("point_lon").isNotNull() | F.col("bbox_minx").isNotNull()
    )
    if bbox is not None:
        df = df.filter(_bbox_intersects(*bbox))
    inst = _instant()
    if t_start is not None:
        df = df.filter(inst >= F.lit(t_start))
    if t_end is not None:
        df = df.filter(inst <= F.lit(t_end))
    return df


def stac_items(
    entries: DataFrame,
    bbox: tuple[float, float, float, float] | None = None,
    t_start: int | None = None,
    t_end: int | None = None,
    limit: int = 10,
    offset: int = 0,
) -> DataFrame:
    if limit <= 0:
        limit = 10  # stac.cpp:610-613
    df = stac_item_filter(entries, bbox, t_start, t_end)
    return (
        df.select(
            "path",
            "type",
            _instant().alias("datetime_s"),
            "bbox_minx",
            "bbox_miny",
            "bbox_maxx",
            "bbox_maxy",
        )
        .orderBy("path")
        .offset(offset)
        .limit(limit)
    )


def stac_number_matched(
    entries: DataFrame,
    bbox: tuple[float, float, float, float] | None = None,
    t_start: int | None = None,
    t_end: int | None = None,
) -> DataFrame:
    return stac_item_filter(entries, bbox, t_start, t_end).agg(
        F.count(F.lit(1)).alias("number_matched")
    )


# ---------------------------------------------------------------- checks

_BBOX = (-60.0, -45.0, 90.0, 45.0)
_T0, _T1 = 1500001000, 1500090000

_ORACLE_FILTER = f"""
    type <> 1 AND (point_lon IS NOT NULL OR bbox_minx IS NOT NULL)
    AND NOT (bbox_maxx < {_BBOX[0]} OR bbox_minx > {_BBOX[2]}
             OR bbox_maxy < {_BBOX[1]} OR bbox_miny > {_BBOX[3]})
    AND (CASE WHEN capture_ms > 0
              THEN CAST((capture_ms - capture_ms % 1000) / 1000 AS BIGINT)
              ELSE mtime END) >= {_T0}
    AND (CASE WHEN capture_ms > 0
              THEN CAST((capture_ms - capture_ms % 1000) / 1000 AS BIGINT)
              ELSE mtime END) <= {_T1}
"""


@check(
    "stac_items_page",
    oracle=with_catalog(
        f"""SELECT path, type,
                   CASE WHEN capture_ms > 0
                        THEN CAST((capture_ms - capture_ms % 1000) / 1000 AS BIGINT)
                        ELSE mtime END AS datetime_s,
                   bbox_minx, bbox_miny, bbox_maxx, bbox_maxy
            FROM entries WHERE {_ORACLE_FILTER}
            ORDER BY path LIMIT 25 OFFSET 5"""
    ),
)
def q_stac_items_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stac_items(entries_df(spark, sf_dir), _BBOX, _T0, _T1, limit=25, offset=5)


@check(
    "stac_number_matched",
    oracle=with_catalog(
        f"SELECT CAST(COUNT(1) AS BIGINT) AS number_matched FROM entries WHERE {_ORACLE_FILTER}"
    ),
)
def q_stac_number_matched(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stac_number_matched(entries_df(spark, sf_dir), _BBOX, _T0, _T1)


def stac_items_keyset(
    entries: DataFrame,
    bbox: tuple[float, float, float, float] | None,
    t_start: int | None,
    t_end: int | None,
    after_path: str,
    limit: int = 10,
) -> DataFrame:
    """Keyset pagination — the deep-paging scale path (SCALE.md): instead
    of ORDER BY + OFFSET (which must produce and discard `offset` rows on
    every page), continue from the last seen key with a pushable
    range predicate `path > after`.  Page cost is O(limit) at any depth."""
    df = stac_item_filter(entries, bbox, t_start, t_end)
    return (
        df.filter(F.col("path") > F.lit(after_path))
        .select(
            "path",
            "type",
            _instant().alias("datetime_s"),
            "bbox_minx",
            "bbox_miny",
            "bbox_maxx",
            "bbox_maxy",
        )
        .orderBy("path")
        .limit(limit)
    )


@check(
    "stac_items_keyset",
    oracle=with_catalog(
        f"""SELECT path, type,
                   CASE WHEN capture_ms > 0
                        THEN CAST((capture_ms - capture_ms % 1000) / 1000 AS BIGINT)
                        ELSE mtime END AS datetime_s,
                   bbox_minx, bbox_miny, bbox_maxx, bbox_maxy
            FROM entries WHERE {_ORACLE_FILTER} AND path > 'src4'
            ORDER BY path LIMIT 10"""
    ),
)
def q_stac_items_keyset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stac_items_keyset(entries_df(spark, sf_dir), _BBOX, _T0, _T1, "src4", limit=10)


def stac_datetime_iso(entries: DataFrame) -> DataFrame:
    """Epoch→ISO8601 'Z' assembly (stac.cpp:25-51): the `datetime` field
    of a STAC Item, from the capture-instant coalesce.  TZ-SAFE: the
    instant is converted to a UTC wall-clock TIMESTAMP_NTZ before
    formatting, so the output is identical under ANY session/driver
    timezone (date_format alone renders in session TZ)."""
    inst = _instant()
    iso = F.expr(
        "date_format(convert_timezone('UTC', timestamp_seconds("
        "CASE WHEN capture_ms > 0 THEN CAST((capture_ms - capture_ms % 1000) / 1000 AS BIGINT)"
        " ELSE mtime END)), \"yyyy-MM-dd'T'HH:mm:ss'Z'\")"
    )
    return (
        entries.filter(F.col("type") != 1)
        .select("path", inst.alias("instant_s"), iso.alias("datetime_iso"))
        .orderBy("path")
    )


@check(
    "stac_datetime_iso",
    oracle=with_catalog(
        """SELECT path,
                  CASE WHEN capture_ms > 0
                       THEN CAST((capture_ms - capture_ms % 1000) / 1000 AS BIGINT)
                       ELSE mtime END AS instant_s,
                  strftime(make_timestamp(
                      (CASE WHEN capture_ms > 0
                            THEN CAST((capture_ms - capture_ms % 1000) / 1000 AS BIGINT)
                            ELSE mtime END) * 1000000), '%Y-%m-%dT%H:%M:%SZ') AS datetime_iso
           FROM entries WHERE type <> 1 ORDER BY path"""
    ),
)
def q_stac_datetime_iso(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stac_datetime_iso(entries_df(spark, sf_dir))
