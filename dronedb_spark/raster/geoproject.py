"""Geoprojection — project an oblique image onto its ground footprint
(SURVEY R9; reference geoproject.cpp: warp image onto footprint polygon).

numpy-only kernel: a homography is solved (DLT, 4 corner
correspondences → 8×8 linear system via ``np.linalg.solve``) mapping
ground coordinates to image pixels; the output ground grid samples the
image through it (nearest neighbor).  Distributed form: one image per
task via ``mapInPandas`` over the media/binary table — the same fleet
shape as the other per-raster kernels.
"""

from __future__ import annotations

import numpy as np


def homography_from_corners(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 H with dst ~ H·src (DLT from exactly 4 correspondences)."""
    A = []
    b = []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        b.append(u)
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y])
        b.append(v)
    h = np.linalg.solve(np.array(A, dtype=float), np.array(b, dtype=float))
    return np.append(h, 1.0).reshape(3, 3)


def geoproject(
    image: np.ndarray,
    footprint_xy: list[tuple[float, float]],
    gsd: float,
    nodata: float = -9999.0,
) -> tuple[np.ndarray, tuple[float, float]]:
    """Project ``image`` (H×W) onto the ground plane.

    ``footprint_xy``: projected-CRS corners in image corner order
    UL, LL, LR, UR (the ring calculate_footprint emits).  Returns the
    ground grid (row 0 = max Y / north) and its (min_x, max_y) origin.
    """
    h, w = image.shape[:2]
    corners_img = np.array([(0, 0), (0, h - 1), (w - 1, h - 1), (w - 1, 0)], dtype=float)
    ground = np.array(footprint_xy[:4], dtype=float)

    minx, miny = ground.min(axis=0)
    maxx, maxy = ground.max(axis=0)
    out_w = max(int(np.ceil((maxx - minx) / gsd)), 1)
    out_h = max(int(np.ceil((maxy - miny) / gsd)), 1)

    H = homography_from_corners(ground, corners_img)

    gy, gx = np.mgrid[0:out_h, 0:out_w]
    X = minx + (gx + 0.5) * gsd
    Y = maxy - (gy + 0.5) * gsd
    denom = H[2, 0] * X + H[2, 1] * Y + H[2, 2]
    U = (H[0, 0] * X + H[0, 1] * Y + H[0, 2]) / denom
    V = (H[1, 0] * X + H[1, 1] * Y + H[1, 2]) / denom

    ui = np.rint(U).astype(int)
    vi = np.rint(V).astype(int)
    valid = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    out = np.full((out_h, out_w), nodata, dtype=float)
    out[valid] = image[vi[valid], ui[valid]]
    return out, (float(minx), float(maxy))


def _register_checks() -> None:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dronedb_spark.suite import check

    # R9 driver gate: an axis-aligned footprint whose extent is exactly
    # (w*gsd, h*gsd) makes the DLT homography an affine pixel-center
    # bijection, so the projected grid must equal the source image cell
    # for cell.  The oracle recomputes the image formula relationally
    # (generate_series cross join) — fully independent of numpy.
    _H, _W, _GSD = 48, 64, 0.5
    _IMAGES = [0, 1, 2, 3]

    @check(
        "geoproject_identity_grid",
        oracle=f"""
            SELECT image_id,
                   CAST(COUNT(*) AS BIGINT) AS n_valid,
                   CAST(SUM(val) AS BIGINT) AS sum_val,
                   CAST(MIN(val) AS BIGINT) AS vmin,
                   CAST(MAX(val) AS BIGINT) AS vmax
            FROM (
                SELECT i.image_id, (y.y * 31 + x.x * 17 + i.image_id * 7) % 251 AS val
                FROM (VALUES {", ".join(f"({i})" for i in _IMAGES)}) i(image_id),
                     generate_series(0, {_H - 1}) y(y),
                     generate_series(0, {_W - 1}) x(x))
            GROUP BY image_id ORDER BY image_id""",
    )
    def q_geoproject_identity_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
        """R9 (geoproject.cpp warp-to-footprint): one image per Arrow
        batch; the kernel solves the homography and samples the ground
        grid; aggregates of the projected grid must equal the oracle's
        relational recomputation of the source image."""
        schema = T.StructType(
            [
                T.StructField("image_id", T.IntegerType()),
                T.StructField("n_valid", T.LongType()),
                T.StructField("sum_val", T.LongType()),
                T.StructField("vmin", T.LongType()),
                T.StructField("vmax", T.LongType()),
            ]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for iid in pdf["image_id"]:
                    iid = int(iid)
                    yy, xx = np.mgrid[0:_H, 0:_W]
                    img = ((yy * 31 + xx * 17 + iid * 7) % 251).astype(float)
                    minx, maxy = 1000.0 + iid * 10.0, 2000.0 - iid * 5.0
                    maxx, miny = minx + _W * _GSD, maxy - _H * _GSD
                    fp = [(minx, maxy), (minx, miny), (maxx, miny), (maxx, maxy)]
                    grid, _origin = geoproject(img, fp, _GSD)
                    valid = grid != -9999.0
                    rows.append(
                        {
                            "image_id": iid,
                            "n_valid": int(valid.sum()),
                            "sum_val": int(grid[valid].sum()),
                            "vmin": int(grid[valid].min()),
                            "vmax": int(grid[valid].max()),
                        }
                    )
                yield pd.DataFrame(
                    rows, columns=["image_id", "n_valid", "sum_val", "vmin", "vmax"])

        imgs = (
            spark.range(len(_IMAGES))
            .select(F.col("id").cast("int").alias("image_id"))
            .repartition(len(_IMAGES))
        )
        return imgs.mapInPandas(run, schema=schema).orderBy("image_id")


_register_checks()
