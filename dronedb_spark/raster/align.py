"""Raster alignment & multispectral merge kernels (SURVEY R10-R12).

Reference: ``align.cpp`` (962 LoC — NCC patches + RANSAC similarity
transform, phase-correlation seed) and ``merge_multispectral.cpp``
(1116 LoC — per-band alignment shifts).  These are per-raster-pair local
kernels; the Spark dimension is the fleet (one pair/set per task via
``applyInPandas``/``mapInPandas``).  scipy/OpenCV are unavailable here,
so the kernels are numpy-only:

* ``phase_correlate`` — FFT cross-power spectrum peak → integer (dy, dx)
  translation (the reference's phase-correlation seed, align.cpp).
* ``align_bands`` — shift every band onto the reference band using the
  detected offset (the merge_multispectral per-band shift step).
* ``mask_borders`` — valid-data cutline mask: nodata border detection by
  neighbor erosion (mask.cpp's role on our pixel grids).
"""

from __future__ import annotations

import numpy as np


def phase_correlate(ref: np.ndarray, mov: np.ndarray) -> tuple[int, int]:
    """Integer translation (dy, dx) that maps ``mov`` onto ``ref``."""
    f1 = np.fft.fft2(ref)
    f2 = np.fft.fft2(mov)
    cross = f1 * np.conj(f2)
    denom = np.abs(cross)
    denom[denom == 0] = 1.0
    corr = np.fft.ifft2(cross / denom).real
    peak = np.unravel_index(np.argmax(corr), corr.shape)
    dy, dx = int(peak[0]), int(peak[1])
    if dy > ref.shape[0] // 2:
        dy -= ref.shape[0]
    if dx > ref.shape[1] // 2:
        dx -= ref.shape[1]
    return dy, dx


def shift_image(img: np.ndarray, dy: int, dx: int, fill: float = 0.0) -> np.ndarray:
    out = np.full_like(img, fill)
    h, w = img.shape
    ys = slice(max(dy, 0), min(h + dy, h))
    xs = slice(max(dx, 0), min(w + dx, w))
    ys_src = slice(max(-dy, 0), min(h - dy, h))
    xs_src = slice(max(-dx, 0), min(w - dx, w))
    out[ys, xs] = img[ys_src, xs_src]
    return out


def align_bands(bands: dict[str, np.ndarray], ref_band: str) -> dict[str, np.ndarray]:
    """R11: register every band to ``ref_band`` via phase correlation and
    shift — the multispectral merge alignment step."""
    ref = bands[ref_band]
    out = {}
    for name, img in bands.items():
        if name == ref_band:
            out[name] = img
            continue
        dy, dx = phase_correlate(ref, img)
        out[name] = shift_image(img, dy, dx)
    return out


def mask_borders(grid: np.ndarray, nodata: float = -9999.0, iterations: int = 1) -> np.ndarray:
    """R12: boolean mask of interior valid pixels — valid cells whose
    4-neighborhood is fully valid, eroded ``iterations`` times (the
    cutline/border trim the reference's mask.cpp performs)."""
    valid = grid != nodata
    for _ in range(iterations):
        interior = valid.copy()
        interior[1:, :] &= valid[:-1, :]
        interior[:-1, :] &= valid[1:, :]
        interior[:, 1:] &= valid[:, :-1]
        interior[:, :-1] &= valid[:, 1:]
        interior[0, :] = interior[-1, :] = False
        interior[:, 0] = interior[:, -1] = False
        valid = interior
    return valid


def _register_checks() -> None:
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dronedb_spark.suite import check

    # Known circular shifts applied per pair — the align kernel must
    # recover exactly these, so the oracle is the ground truth itself
    # (align.cpp's NCC/RANSAC path is fixture-bound; the FFT seed stage
    # is what distributes: one pandas batch per image pair).
    _SHIFTS = [(0, 0), (3, -5), (-7, 2), (10, 11), (-12, -9), (5, 0), (0, -8), (15, -15)]

    @check(
        "align_shift_recovery",
        oracle="SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {dy}, {dx})" for i, (dy, dx) in enumerate(_SHIFTS))
        + ") AS t(pair_id, dy, dx) ORDER BY pair_id",
    )
    def q_align_shift_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
        """R10 seed stage (align.cpp phase-correlation): recover a known
        per-pair translation distributively — one Arrow batch per pair,
        FFT in numpy, relational collect of (pair_id, dy, dx).  The
        oracle is the ground-truth shift table."""
        schema = T.StructType(
            [
                T.StructField("pair_id", T.IntegerType()),
                T.StructField("dy", T.IntegerType()),
                T.StructField("dx", T.IntegerType()),
            ]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            rng_base = 64
            for pdf in batches:
                rows = []
                for pid in pdf["pair_id"]:
                    pid = int(pid)
                    dy, dx = _SHIFTS[pid]
                    yy, xx = np.mgrid[0:rng_base, 0:rng_base]
                    ref = ((yy * 31 + xx * 17 + pid * 7) % 251).astype(float)
                    mov = np.roll(np.roll(ref, -dy, axis=0), -dx, axis=1)
                    rdy, rdx = phase_correlate(ref, mov)
                    rows.append({"pair_id": pid, "dy": rdy, "dx": rdx})
                yield pd.DataFrame(rows, columns=["pair_id", "dy", "dx"])

        pairs = (
            spark.range(len(_SHIFTS))
            .select(F.col("id").cast("int").alias("pair_id"))
            .repartition(len(_SHIFTS))
        )
        return pairs.mapInPandas(run, schema=schema).orderBy("pair_id")


_register_checks()
