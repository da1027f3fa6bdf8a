"""Registry of (named query, DuckDB oracle SQL) pairs — the driver contract.

Each operator module registers its parity checks here via the ``check``
decorator.  ``__spark_entry__.py`` exposes the registry to the driver.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Check:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check


REGISTRY: dict[str, Check] = {}


def check(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = Check(name, fn, oracle)
        return fn

    return deco


def load_all() -> dict[str, Check]:
    """Import every operator module so its checks register.

    ORDER MATTERS: the driver walks the registry in registration order
    under a budget, and round 1's report truncated after 50 of 88 checks
    — so the modules whose checks have never had a driver CORRECTNESS row
    (raster, vectors, simhash, geo/footprint, multimodal, streaming,
    sampling) register FIRST, and the already-verified catalog/relational
    families register last.
    """
    # --- never-gated in round 1: register first -------------------------
    import dronedb_spark.sources.decode_checks  # noqa: F401  (real codecs, new in r2)
    import dronedb_spark.sources.bridge  # noqa: F401  (file→operator bridges, new in r2)
    import dronedb_spark.raster.stats  # noqa: F401
    import dronedb_spark.raster.volume  # noqa: F401
    import dronedb_spark.raster.contours  # noqa: F401
    import dronedb_spark.raster.stockpile  # noqa: F401
    import dronedb_spark.raster.points  # noqa: F401
    import dronedb_spark.raster.colormaps  # noqa: F401
    import dronedb_spark.raster.align  # noqa: F401
    import dronedb_spark.raster.geoproject  # noqa: F401
    import dronedb_spark.raster.thermal  # noqa: F401
    import dronedb_spark.vectors.knn  # noqa: F401
    import dronedb_spark.vectors.ann  # noqa: F401
    import dronedb_spark.vectors.ivf  # noqa: F401
    import dronedb_spark.text.simhash  # noqa: F401
    import dronedb_spark.functions.geo  # noqa: F401
    import dronedb_spark.functions.mvt  # noqa: F401
    import dronedb_spark.operators.spatial  # noqa: F401
    import dronedb_spark.functions.footprint  # noqa: F401
    import dronedb_spark.multimodal.media  # noqa: F401
    import dronedb_spark.streaming.stateful  # noqa: F401
    import dronedb_spark.text.quality  # noqa: F401  (sampling checks)
    import dronedb_spark.text.pii  # noqa: F401
    import dronedb_spark.text.decontam  # noqa: F401
    import dronedb_spark.sources.ingest_check  # noqa: F401  (EXIF ingest)
    import dronedb_spark.sources.geojson  # noqa: F401  (S8 real decode, new in r2)
    import dronedb_spark.operators.tpch_ext  # noqa: F401  (Q8-Q21, new in r2)
    # --- green rows in CORRECTNESS_r01: register after ------------------
    import dronedb_spark.operators.search  # noqa: F401
    import dronedb_spark.operators.stats  # noqa: F401
    import dronedb_spark.operators.meta  # noqa: F401
    import dronedb_spark.operators.delta  # noqa: F401
    import dronedb_spark.operators.stac  # noqa: F401
    import dronedb_spark.operators.relational  # noqa: F401
    import dronedb_spark.operators.vector_query  # noqa: F401
    import dronedb_spark.operators.asof  # noqa: F401
    import dronedb_spark.operators.interval  # noqa: F401
    import dronedb_spark.functions.strings  # noqa: F401
    import dronedb_spark.text.dedup  # noqa: F401
    import dronedb_spark.text.segdedup  # noqa: F401
    import dronedb_spark.text.repetition  # noqa: F401

    return REGISTRY
