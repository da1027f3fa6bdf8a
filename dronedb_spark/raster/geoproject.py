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
