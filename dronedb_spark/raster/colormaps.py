"""Colormap registry + apply kernel (SURVEY §2.7 colormaps —
vegetation.cpp:327-356,431-679).

Semantics ported exactly from ``applyColormap``:
  * 256-entry LUTs built by linear interpolation between control points,
  * normalization (v−vmin)/(vmax−vmin) with a degenerate-range guard
    (|range| < 1e-10 → 1), clamped to [0,1], index = int(norm·255),
  * nodata / NaN → fully transparent (0,0,0,0).

Control points are re-specified from the reference's published tables
(they are themselves standard matplotlib/ColorBrewer ramps).  The apply
step is a vectorized numpy kernel for ``mapInPandas`` tile batches —
render-side work, one tile per task.
"""

from __future__ import annotations

import numpy as np

# id → control points [(t, r, g, b)]; alpha 255 everywhere
_CONTROL_POINTS: dict[str, list[tuple[float, int, int, int]]] = {
    "rdylgn": [
        (0.0, 215, 48, 39), (0.25, 253, 174, 97), (0.5, 254, 224, 139),
        (0.75, 166, 217, 106), (1.0, 26, 152, 80),
    ],
    "spectral": [
        (0.0, 158, 1, 66), (0.25, 253, 174, 97), (0.5, 255, 255, 191),
        (0.75, 171, 221, 164), (1.0, 94, 79, 162),
    ],
    "viridis": [
        (0.0, 68, 1, 84), (0.25, 59, 82, 139), (0.5, 33, 145, 140),
        (0.75, 94, 201, 98), (1.0, 253, 231, 37),
    ],
    "plasma": [
        (0.0, 13, 8, 135), (0.25, 126, 3, 168), (0.5, 204, 71, 120),
        (0.75, 248, 149, 64), (1.0, 240, 249, 33),
    ],
    "inferno": [
        (0.0, 0, 0, 4), (0.25, 87, 16, 110), (0.5, 188, 55, 84),
        (0.75, 249, 142, 9), (1.0, 252, 255, 164),
    ],
    "magma": [
        (0.0, 0, 0, 4), (0.25, 81, 18, 124), (0.5, 183, 55, 121),
        (0.75, 252, 137, 97), (1.0, 252, 253, 191),
    ],
    "grayscale": [(0.0, 0, 0, 0), (1.0, 255, 255, 255)],
    "ironbow": [
        (0.0, 0, 0, 0), (0.25, 32, 0, 130), (0.5, 213, 27, 111),
        (0.75, 255, 150, 0), (1.0, 255, 255, 220),
    ],
    "rainbow": [
        (0.0, 150, 0, 90), (0.2, 0, 0, 200), (0.4, 0, 200, 255),
        (0.6, 0, 255, 0), (0.8, 255, 255, 0), (1.0, 255, 0, 0),
    ],
    "bugn": [(0.0, 237, 248, 251), (0.5, 102, 194, 164), (1.0, 0, 109, 44)],
    "whitehot": [(0.0, 0, 0, 0), (1.0, 255, 255, 255)],
    "blackhot": [(0.0, 255, 255, 255), (1.0, 0, 0, 0)],
    "arctic": [(0.0, 10, 20, 60), (0.5, 70, 160, 220), (1.0, 240, 250, 255)],
    "lava": [(0.0, 20, 0, 0), (0.5, 200, 30, 0), (1.0, 255, 230, 80)],
    "terrain": [
        (0.0, 51, 102, 153), (0.25, 0, 153, 102), (0.5, 230, 214, 125),
        (0.75, 140, 85, 40), (1.0, 255, 255, 255),
    ],
    "greys": [(0.0, 250, 250, 250), (1.0, 5, 5, 5)],
}


def _interpolate(points: list[tuple[float, int, int, int]]) -> np.ndarray:
    """256×4 uint8 LUT from control points (vegetation.cpp interpolateColormap)."""
    lut = np.zeros((256, 4), dtype=np.uint8)
    lut[:, 3] = 255
    ts = np.array([p[0] for p in points])
    for ch in range(3):
        vals = np.array([p[1 + ch] for p in points], dtype=float)
        t = np.arange(256) / 255.0
        lut[:, ch] = np.clip(np.rint(np.interp(t, ts, vals)), 0, 255).astype(np.uint8)
    return lut


COLORMAPS: dict[str, np.ndarray] = {k: _interpolate(v) for k, v in _CONTROL_POINTS.items()}

# discrete_ndvi: stepped, not interpolated (vegetation.cpp:448-461)
_d = np.zeros((256, 4), dtype=np.uint8)
_d[:, 3] = 255
for _i in range(256):
    _t = _i / 255.0
    if _t < 0.2:
        _d[_i, :3] = (139, 0, 0)
    elif _t < 0.4:
        _d[_i, :3] = (255, 69, 0)
    elif _t < 0.6:
        _d[_i, :3] = (255, 215, 0)
    elif _t < 0.8:
        _d[_i, :3] = (50, 205, 50)
    else:
        _d[_i, :3] = (0, 100, 0)
COLORMAPS["discrete_ndvi"] = _d


def apply_colormap(
    values: np.ndarray, cmap_id: str, vmin: float, vmax: float, nodata: float = -9999.0
) -> np.ndarray:
    """values (any shape) → RGBA uint8 (shape + (4,)); nodata/NaN →
    transparent.  Vectorized port of applyColormap
    (vegetation.cpp:327-356)."""
    lut = COLORMAPS[cmap_id]
    rng = vmax - vmin
    if abs(rng) < 1e-10:
        rng = 1.0
    norm = np.clip((values - vmin) / rng, 0.0, 1.0)
    idx = np.clip((norm * 255.0).astype(int), 0, 255)
    out = lut[idx]
    invalid = (values == nodata) | np.isnan(values)
    out[invalid] = 0
    return out


def colormap_pixels(pixels, cmap_id: str, vmin: float, vmax: float):
    """Render-side apply as a distributed stage: pixel batches → RGBA
    columns via the vectorized LUT kernel (one Arrow batch per task)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("row", T.IntegerType()),
            T.StructField("col", T.IntegerType()),
            T.StructField("r", T.IntegerType()),
            T.StructField("g", T.IntegerType()),
            T.StructField("b", T.IntegerType()),
            T.StructField("a", T.IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rgba = apply_colormap(pdf["value"].to_numpy(), cmap_id, vmin, vmax)
            yield pd.DataFrame(
                {
                    "row": pdf["row"].astype("int32"),
                    "col": pdf["col"].astype("int32"),
                    "r": rgba[:, 0].astype("int32"),
                    "g": rgba[:, 1].astype("int32"),
                    "b": rgba[:, 2].astype("int32"),
                    "a": rgba[:, 3].astype("int32"),
                }
            )

    return pixels.mapInPandas(run, schema=schema)


# Grayscale's interpolated LUT is the identity (lut[i] = i), so the whole
# applyColormap pipeline — normalize, degenerate-range guard, clamp,
# truncating index, nodata→transparent — is SQL-expressible and the numpy
# kernel gets a value-level oracle over the DEM.
def _gray_hist_sql_oracle() -> str:
    from dronedb_spark.raster.synth import dem_sql

    return f"""
    WITH px AS ({dem_sql('duckdb')}),
    rgba AS (
        SELECT CASE WHEN value = -9999.0 THEN 0
                    ELSE CAST(FLOOR(LEAST(GREATEST((value - 200.0) / 80.0, 0.0), 1.0) * 255.0) AS INT)
               END AS gray,
               CASE WHEN value = -9999.0 THEN 0 ELSE 255 END AS alpha
        FROM px)
    SELECT gray, alpha, CAST(COUNT(1) AS BIGINT) AS n
    FROM rgba GROUP BY gray, alpha ORDER BY gray, alpha"""


def _register_checks() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from dronedb_spark.raster.synth import dem_df
    from dronedb_spark.suite import check

    @check("colormap_gray_hist", oracle=_gray_hist_sql_oracle())
    def q_colormap_gray_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
        rgba = colormap_pixels(dem_df(spark), "grayscale", 200.0, 280.0)
        return (
            rgba.groupBy(F.col("g").alias("gray"), F.col("a").alias("alpha"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("gray", "alpha")
        )


_register_checks()
