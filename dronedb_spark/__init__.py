"""dronedb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of DroneDB (reference: /root/reference).

Not a port: the catalog is Parquet-backed DataFrames (``entries``,
``entries_meta``), queries are DataFrame/SQL expressions optimized by
Catalyst, and per-raster kernels are vectorized expressions or pandas UDFs.
"""

__version__ = "0.1.0"

from dronedb_spark.session import get_spark  # noqa: F401
