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

    # R11 multispectral merge: per image SET, every band is circularly
    # shifted by a known offset; align_bands must recover the offset and
    # shift the band back.  After the (non-circular) corrective shift the
    # band equals the reference everywhere except the wrapped border
    # strip, so n_match == (N-|dy|)*(N-|dx|) — a closed form the oracle
    # states independently as literal arithmetic.
    _N = 64
    _BAND_SHIFTS: dict[int, dict[str, tuple[int, int]]] = {
        0: {"nir": (2, -3), "rededge": (-4, 1)},
        1: {"nir": (0, 6), "rededge": (7, -7)},
        2: {"nir": (-9, 0), "rededge": (3, 11)},
        3: {"nir": (12, -1), "rededge": (-5, -10)},
    }

    @check(
        "multispectral_align_merge",
        oracle="SELECT * FROM (VALUES "
        + ", ".join(
            f"({sid}, '{band}', {dy}, {dx}, ({_N}-{abs(dy)})*({_N}-{abs(dx)}))"
            for sid, bands in _BAND_SHIFTS.items()
            for band, (dy, dx) in bands.items()
        )
        + ") AS t(set_id, band, dy, dx, n_match) ORDER BY set_id, band",
    )
    def q_multispectral_align_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
        """R11 (merge_multispectral.cpp per-band shift): one Arrow batch
        per band set; numpy FFT alignment; relational collect of the
        recovered shifts plus the count of pixels restored exactly."""
        schema = T.StructType(
            [
                T.StructField("set_id", T.IntegerType()),
                T.StructField("band", T.StringType()),
                T.StructField("dy", T.IntegerType()),
                T.StructField("dx", T.IntegerType()),
                T.StructField("n_match", T.LongType()),
            ]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for sid in pdf["set_id"]:
                    sid = int(sid)
                    yy, xx = np.mgrid[0:_N, 0:_N]
                    # +1 keeps 0 out of the value range: the corrective
                    # shift fills the wrapped border with 0.0, which must
                    # never equal a real pixel or n_match would overcount.
                    ref = ((yy * 29 + xx * 13 + sid * 11) % 241 + 1).astype(float)
                    bands = {"ref": ref}
                    for band, (dy, dx) in _BAND_SHIFTS[sid].items():
                        bands[band] = np.roll(np.roll(ref, -dy, axis=0), -dx, axis=1)
                    aligned = align_bands(bands, "ref")
                    for band, (dy, dx) in _BAND_SHIFTS[sid].items():
                        rdy, rdx = phase_correlate(ref, bands[band])
                        n_match = int((aligned[band] == ref).sum())
                        rows.append(
                            {"set_id": sid, "band": band, "dy": rdy, "dx": rdx,
                             "n_match": n_match}
                        )
                yield pd.DataFrame(rows, columns=["set_id", "band", "dy", "dx", "n_match"])

        sets = (
            spark.range(len(_BAND_SHIFTS))
            .select(F.col("id").cast("int").alias("set_id"))
            .repartition(len(_BAND_SHIFTS))
        )
        return sets.mapInPandas(run, schema=schema).orderBy("set_id", "band")

    # R12 border mask: a rh x rw valid rectangle in a nodata sea, eroded
    # k times, keeps (rh-2k)*(rw-2k) interior cells — stated by the
    # oracle as literal arithmetic, computed by the kernel by erosion.
    _RECTS: dict[int, tuple[int, int, int, int]] = {
        0: (4, 6, 40, 50),   # r0, c0, rh, rw
        1: (10, 2, 31, 17),
        2: (1, 1, 62, 62),
        3: (20, 30, 9, 5),
    }

    @check(
        "mask_border_interiors",
        oracle="SELECT * FROM (VALUES "
        + ", ".join(
            f"({rid}, {it}, GREATEST({rh} - 2*{it}, 0) * GREATEST({rw} - 2*{it}, 0))"
            for rid, (_, _, rh, rw) in _RECTS.items()
            for it in (1, 2)
        )
        + ") AS t(raster_id, iterations, n_interior) ORDER BY raster_id, iterations",
    )
    def q_mask_border_interiors(spark: SparkSession, sf_dir: str) -> DataFrame:
        """R12 (mask.cpp cutline/border trim): neighbor-erosion interior
        counts per raster at 1 and 2 iterations, one Arrow batch per
        raster."""
        schema = T.StructType(
            [
                T.StructField("raster_id", T.IntegerType()),
                T.StructField("iterations", T.IntegerType()),
                T.StructField("n_interior", T.LongType()),
            ]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for rid in pdf["raster_id"]:
                    rid = int(rid)
                    r0, c0, rh, rw = _RECTS[rid]
                    grid = np.full((_N, _N), -9999.0)
                    grid[r0:r0 + rh, c0:c0 + rw] = 1.0
                    for it in (1, 2):
                        mask = mask_borders(grid, iterations=it)
                        rows.append(
                            {"raster_id": rid, "iterations": it,
                             "n_interior": int(mask.sum())}
                        )
                yield pd.DataFrame(rows, columns=["raster_id", "iterations", "n_interior"])

        rs = (
            spark.range(len(_RECTS))
            .select(F.col("id").cast("int").alias("raster_id"))
            .repartition(len(_RECTS))
        )
        return rs.mapInPandas(run, schema=schema).orderBy("raster_id", "iterations")


_register_checks()
