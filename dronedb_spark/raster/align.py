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


def ncc_patches(
    ref: np.ndarray,
    mov: np.ndarray,
    patch: int = 12,
    grid: int = 4,
    search: int = 12,
    min_ncc: float = 0.5,
) -> tuple[np.ndarray, np.ndarray]:
    """Patch-grid normalized cross-correlation (align.cpp's NCC matcher):
    a grid×grid lattice of patches from ``ref`` is matched against a
    ±search window in ``mov``; returns (src_pts, dst_pts) arrays of
    matched centers (ref coords → mov coords).  Matches below ``min_ncc``
    are dropped (featureless or occluded patches)."""
    h, w = ref.shape
    half = patch // 2
    margin = half + search + 1
    ys = np.linspace(margin, h - margin - 1, grid).astype(int)
    xs = np.linspace(margin, w - margin - 1, grid).astype(int)
    src, dst = [], []
    for cy in ys:
        for cx in xs:
            p = ref[cy - half : cy + half, cx - half : cx + half].astype(np.float64)
            pz = p - p.mean()
            pn = np.sqrt((pz * pz).sum())
            if pn < 1e-12:
                continue
            best, best_off = -2.0, (0, 0)
            for oy in range(-search, search + 1):
                for ox in range(-search, search + 1):
                    q = mov[
                        cy + oy - half : cy + oy + half, cx + ox - half : cx + ox + half
                    ].astype(np.float64)
                    qz = q - q.mean()
                    qn = np.sqrt((qz * qz).sum())
                    if qn < 1e-12:
                        continue
                    ncc = float((pz * qz).sum() / (pn * qn))
                    if ncc > best:
                        best, best_off = ncc, (oy, ox)
            if best >= min_ncc:
                src.append((cx, cy))
                dst.append((cx + best_off[1], cy + best_off[0]))
    return np.array(src, dtype=np.float64), np.array(dst, dtype=np.float64)


def fit_similarity(src: np.ndarray, dst: np.ndarray) -> tuple[float, float, float, float]:
    """Least-squares similarity dst ≈ s·R(θ)·src + t from ≥2 points
    (closed-form absolute orientation): returns (scale, theta_rad, tx, ty)."""
    ms, md = src.mean(axis=0), dst.mean(axis=0)
    sc, dc = src - ms, dst - md
    denom = float((sc * sc).sum())
    if denom < 1e-12:
        raise ValueError("degenerate points")
    a = float((sc * dc).sum())  # Σ xs·xd + ys·yd
    b = float((sc[:, 0] * dc[:, 1] - sc[:, 1] * dc[:, 0]).sum())
    s_cos, s_sin = a / denom, b / denom
    s = float(np.hypot(s_cos, s_sin))
    theta = float(np.arctan2(s_sin, s_cos))
    r = np.array([[s_cos, -s_sin], [s_sin, s_cos]])
    t = md - r @ ms
    return s, theta, float(t[0]), float(t[1])


def ransac_similarity(
    src: np.ndarray,
    dst: np.ndarray,
    iters: int = 200,
    tol: float = 1.5,
    seed: int = 0,
) -> tuple[tuple[float, float, float, float], np.ndarray]:
    """RANSAC over 2-point minimal samples (align.cpp's robust estimator):
    best consensus set is refit with the full least-squares solve.
    Returns ((scale, theta, tx, ty), inlier_mask)."""
    n = len(src)
    if n < 2:
        raise ValueError("need >= 2 correspondences")
    rng = np.random.RandomState(seed)
    best_mask = None
    best_count = -1
    for _ in range(iters):
        i, j = rng.choice(n, 2, replace=False)
        if np.allclose(src[i], src[j]):
            continue
        try:
            s, th, tx, ty = fit_similarity(src[[i, j]], dst[[i, j]])
        except ValueError:
            continue
        c, sn = s * np.cos(th), s * np.sin(th)
        pred = np.column_stack(
            [c * src[:, 0] - sn * src[:, 1] + tx, sn * src[:, 0] + c * src[:, 1] + ty]
        )
        err = np.sqrt(((pred - dst) ** 2).sum(axis=1))
        mask = err <= tol
        if int(mask.sum()) > best_count:
            best_count = int(mask.sum())
            best_mask = mask
    if best_mask is None or best_count < 2:
        raise ValueError("RANSAC found no consensus")
    return fit_similarity(src[best_mask], dst[best_mask]), best_mask


def align_similarity(
    ref: np.ndarray, mov: np.ndarray, seed: int = 0, **ncc_kw
) -> dict:
    """R10 full pipeline (align.cpp parity): NCC patch correspondences →
    RANSAC similarity → (scale, rotation, translation) mapping ref
    coordinates into mov coordinates."""
    src, dst = ncc_patches(ref, mov, **ncc_kw)
    (s, th, tx, ty), mask = ransac_similarity(src, dst, seed=seed)
    return {
        "scale": s,
        "theta_deg": float(np.degrees(th)),
        "tx": tx,
        "ty": ty,
        "n_matches": int(len(src)),
        "n_inliers": int(mask.sum()),
    }


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

    # R10 full parity: known similarity transforms (rotation + scale +
    # shift, about the image center) recovered via NCC patches + RANSAC.
    # Integer-pixel NCC limits precision, so the oracle is property-style
    # (recovered-within-tolerance booleans), like footprint_bbox_props.
    _SIMS: dict[int, tuple[float, float, float, float]] = {
        0: (0.0, 1.0, 0.0, 0.0),      # theta_deg, scale, tx, ty
        1: (3.0, 1.02, 2.5, -1.5),
        2: (-4.0, 0.97, -3.0, 2.0),
        3: (5.0, 1.05, 4.0, 4.0),
        4: (-2.5, 1.0, -5.0, 0.0),
        5: (1.5, 0.96, 0.0, 6.0),
    }
    _SN = 96

    def _smooth_field(pid: int) -> np.ndarray:
        rng = np.random.RandomState(1000 + pid)
        f = rng.rand(_SN + 8, _SN + 8)
        # 9x9 box smoothing via cumsum (no scipy): feature-rich but
        # low-frequency enough for NCC to lock unambiguously
        c = np.cumsum(np.cumsum(f, axis=0), axis=1)
        c = np.pad(c, ((1, 0), (1, 0)))
        k = 8
        s = c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]
        return s[: _SN, : _SN] * 100.0

    def _warp_similarity(ref: np.ndarray, theta_deg: float, scale: float,
                         tx: float, ty: float) -> np.ndarray:
        """mov(p) = ref(T⁻¹(p)) with T = center-anchored s·R + t,
        bilinear sampling (edge-clamped)."""
        h, w = ref.shape
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        th = np.radians(theta_deg)
        cth, sth = np.cos(th), np.sin(th)
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        px, py = xx - cx - tx, yy - cy - ty
        sx = (cth * px + sth * py) / scale + cx
        sy = (-sth * px + cth * py) / scale + cy
        x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
        y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
        fx = np.clip(sx - x0, 0.0, 1.0)
        fy = np.clip(sy - y0, 0.0, 1.0)
        return (
            ref[y0, x0] * (1 - fx) * (1 - fy)
            + ref[y0, x0 + 1] * fx * (1 - fy)
            + ref[y0 + 1, x0] * (1 - fx) * fy
            + ref[y0 + 1, x0 + 1] * fx * fy
        )

    @check(
        "align_similarity_recovery",
        oracle="SELECT * FROM (VALUES "
        + ", ".join(f"({pid}, TRUE, TRUE, TRUE, TRUE)" for pid in _SIMS)
        + ") AS t(pair_id, theta_ok, scale_ok, shift_ok, inliers_ok)"
        " ORDER BY pair_id",
    )
    def q_align_similarity_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
        """R10 NCC+RANSAC parity (align.cpp's estimator, beyond the phase-
        correlation seed): per pair the kernel must recover the known
        center-anchored rotation/scale/shift within tolerance (θ ±0.5°,
        s ±0.01, t ±1 px, ≥60% inliers).  One Arrow batch per pair."""
        schema = T.StructType(
            [
                T.StructField("pair_id", T.IntegerType()),
                T.StructField("theta_ok", T.BooleanType()),
                T.StructField("scale_ok", T.BooleanType()),
                T.StructField("shift_ok", T.BooleanType()),
                T.StructField("inliers_ok", T.BooleanType()),
            ]
        )

        def _shift_err(got, tx, ty) -> float:
            """Compare transforms at the image CENTER (the estimator's t is
            origin-anchored; the ground truth is center-anchored — evaluate
            both maps at the center point where the true displacement is
            exactly (tx, ty))."""
            c = (_SN - 1) / 2.0
            th = np.radians(got["theta_deg"])
            s = got["scale"]
            gx = s * (np.cos(th) * c - np.sin(th) * c) + got["tx"]
            gy = s * (np.sin(th) * c + np.cos(th) * c) + got["ty"]
            return float(np.hypot(gx - (c + tx), gy - (c + ty)))

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols = ["pair_id", "theta_ok", "scale_ok", "shift_ok", "inliers_ok"]
            for pdf in batches:
                rows = []
                for pid in pdf["pair_id"]:
                    pid = int(pid)
                    theta, scale, tx, ty = _SIMS[pid]
                    ref = _smooth_field(pid)
                    mov = _warp_similarity(ref, theta, scale, tx, ty)
                    got = align_similarity(ref, mov, seed=pid, grid=5)
                    rows.append(
                        {
                            "pair_id": pid,
                            "theta_ok": abs(got["theta_deg"] - theta) <= 0.5,
                            "scale_ok": abs(got["scale"] - scale) <= 0.01,
                            "shift_ok": _shift_err(got, tx, ty) <= 1.0,
                            "inliers_ok": got["n_inliers"] >= 0.6 * got["n_matches"] > 0,
                        }
                    )
                yield pd.DataFrame(rows, columns=cols)

        pairs = (
            spark.range(len(_SIMS))
            .select(F.col("id").cast("int").alias("pair_id"))
            .repartition(len(_SIMS))
        )
        return pairs.mapInPandas(run, schema=schema).orderBy("pair_id")

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
