"""FLIR R-JPEG raw-thermal extraction (reference: thermal.cpp:60-300).

A radiometric JPEG embeds the raw UInt16 sensor counts in a FLIR APP1
segment ("FLIR\\0" magic).  The reference locates the blob with a
whole-file scan guarded by a plausibility window on the first and middle
pixels (raw counts 2000..50000), taking the raw dimensions from the
FLIR XMP keys (RawThermalImageWidth/Height) with a common-resolution
fallback table — all replicated here, including the fallback order.

Calibration follows extractThermalCalibration (thermal.cpp:295-370):
FLIR XMP Planck constants first, DJI thermal keys second, thermal
make/model defaults last; raw→temperature is the Planck inversion the
``raster/thermal.py`` calibrate stage applies.

Spark shape: one task per image (binaryFile scan → mapInPandas); the
extracted (row, col, raw) pixel rows feed the SAME thermal operators the
synthetic grids exercise.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dronedb_spark.suite import check

_FLIR_MAGIC = b"FLIR\x00"

# common thermal resolutions, tried in this order (thermal.cpp:176-184)
COMMON_SIZES = [(640, 512), (320, 256), (160, 120), (1280, 1024), (384, 288), (640, 480)]

# Planck defaults (shared with raster/thermal.py)
from dronedb_spark.raster.thermal import (  # noqa: E402
    PLANCK_B,
    PLANCK_F,
    PLANCK_O,
    PLANCK_R1,
    PLANCK_R2,
)


def _find_flir_start(data: bytes) -> int | None:
    """Offset just after the 'FLIR\\0' magic of the first FLIR APP1."""
    i = 0
    while i + 10 < len(data):
        if data[i] == 0xFF and data[i + 1] == 0xE1 and data[i + 4 : i + 9] == _FLIR_MAGIC:
            return i + 9
        i += 1
    return None


def extract_raw_thermal(data: bytes, xmp: dict | None = None) -> tuple[np.ndarray, int, int] | None:
    """(raw uint16 HxW, width, height) or None — findFlirSegment +
    extractRawThermalData parity: XMP dims else common-size fallback,
    byte-sliding scan with the 2000..50000 plausibility window on the
    first and middle pixels."""
    start = _find_flir_start(data)
    if start is None:
        return None
    if xmp is None:
        from dronedb_spark.sources.xmp import extract_xmp_packet, parse_xmp

        text = extract_xmp_packet(data)
        xmp = parse_xmp(text) if text else {}
    w = h = 0
    try:
        w = int(xmp.get("FLIR:RawThermalImageWidth", 0))
        h = int(xmp.get("FLIR:RawThermalImageHeight", 0))
    except ValueError:
        pass
    if not w or not h:
        remaining = len(data) - (start + 3)
        for cw, ch in COMMON_SIZES:
            if remaining >= cw * ch * 2:
                w, h = cw, ch
                break
    if not w or not h:
        return None
    expected = w * h * 2
    for pos in range(start, len(data) - expected + 1):
        first = data[pos] | (data[pos + 1] << 8)
        mid_p = pos + expected // 2
        mid = data[mid_p] | (data[mid_p + 1] << 8)
        if 2000 < first < 50000 and 2000 < mid < 50000:
            raw = np.frombuffer(data, dtype="<u2", count=w * h, offset=pos)
            return raw.reshape(h, w), w, h
    return None


def thermal_calibration(xmp: dict, make: str | None = None, model: str | None = None) -> dict:
    """Planck + environment calibration with the reference's source
    priority (thermal.cpp:295-370): FLIR XMP → DJI thermal XMP →
    thermal-make defaults.  ``valid`` mirrors the reference's flag."""
    cal = {
        "r1": PLANCK_R1, "r2": PLANCK_R2, "b": PLANCK_B, "o": PLANCK_O, "f": PLANCK_F,
        "emissivity": 0.95, "valid": False,
    }

    def num(key, cur):
        v = xmp.get(key)
        if v is None:
            return cur
        try:
            return float(v)
        except ValueError:
            return cur

    cal["r1"] = num("FLIR:PlanckR1", cal["r1"])
    cal["b"] = num("FLIR:PlanckB", cal["b"])
    cal["f"] = num("FLIR:PlanckF", cal["f"])
    cal["o"] = num("FLIR:PlanckO", cal["o"])
    cal["r2"] = num("FLIR:PlanckR2", cal["r2"])
    cal["emissivity"] = num("FLIR:Emissivity", cal["emissivity"])
    if "FLIR:PlanckR1" in xmp or "FLIR:Emissivity" in xmp:
        cal["valid"] = True
        return cal
    cal["emissivity"] = num("drone-dji:ThermalObjectEmissivity", cal["emissivity"])
    if "drone-dji:ThermalObjectEmissivity" in xmp or "drone-dji:ThermalMeasureMode" in xmp:
        cal["valid"] = True
        return cal
    from dronedb_spark.sources.sensors import is_thermal_sensor

    if is_thermal_sensor(make, model):
        cal["valid"] = True
    return cal


def raw_kelvin(raw: float, cal: dict) -> float:
    import math

    return cal["b"] / math.log(cal["r1"] / (cal["r2"] * (raw + cal["o"])) + cal["f"])


def rjpeg_pixel_table(files: DataFrame) -> DataFrame:
    """(path, content) → (path, row, col, raw) thermal pixel rows, one
    decode task per image; non-R-JPEGs log-and-skip."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import logging

        for pdf in it:
            for path, content in zip(pdf["path"], pdf["content"]):
                got = extract_raw_thermal(bytes(content))
                if got is None:
                    logging.getLogger(__name__).warning(
                        "rjpeg_pixel_table: no raw thermal in %s", path
                    )
                    continue
                raw, w, h = got
                rr = np.repeat(np.arange(h, dtype=np.int32), w)
                cc = np.tile(np.arange(w, dtype=np.int32), h)
                yield pd.DataFrame(
                    {"path": path, "row": rr, "col": cc,
                     "raw": raw.reshape(-1).astype(np.int64)}
                )

    return files.mapInPandas(run, schema="path string, row int, col int, raw long")


def encode_rjpeg(raw: np.ndarray, xmp_attrs: dict[str, str] | None = None) -> bytes:
    """Fixture builder: a REAL R-JPEG skeleton — SOI + (optional XMP
    APP1) + FLIR APP1 ('FLIR\\0' + 3 index bytes + raw UInt16 LE) + EOI."""
    from dronedb_spark.sources.xmp import build_xmp_jpeg_segment

    payload = _FLIR_MAGIC + b"\x00\x00\x00" + raw.astype("<u2").tobytes()
    if len(payload) + 2 > 0xFFFF:
        raise ValueError("fixture raw too large for one APP1 segment")
    out = b"\xff\xd8"
    if xmp_attrs:
        out += build_xmp_jpeg_segment(xmp_attrs)
    out += b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    return out + b"\xff\xd9"


# ------------------------------------------------------------------ check

_RJ_W, _RJ_H = 160, 120
_RJ_CAL = {"FLIR:PlanckR1": "17000.0", "FLIR:PlanckB": "1430.0",
           "FLIR:PlanckO": "-6000.0"}
_RJ_PROBE = (5, 7)


def _rj_raw() -> np.ndarray:
    # all values multiples of 256 (low byte 0): every misaligned window
    # fails the scanner's plausibility test, so alignment is deterministic
    i = np.arange(_RJ_H * _RJ_W)
    return (5120 + ((i * 37) % 77) * 256).astype("<u2").reshape(_RJ_H, _RJ_W)


def _rj_fixture_root() -> str:
    import os

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "rjpeg_v1")
    )
    os.makedirs(root, exist_ok=True)
    raw = _rj_raw()
    files = {
        # XMP dims + FLIR Planck calibration
        "therm_a.jpg": encode_rjpeg(
            raw,
            {**_RJ_CAL, "FLIR:RawThermalImageWidth": str(_RJ_W),
             "FLIR:RawThermalImageHeight": str(_RJ_H)},
        ),
        # no XMP at all → common-size fallback (640x512/320x256 don't fit,
        # 160x120 does) and default calibration
        "therm_b.jpg": encode_rjpeg(raw),
    }
    for name, data in files.items():
        p = os.path.join(root, name)
        if not os.path.exists(p) or open(p, "rb").read() != data:
            with open(p, "wb") as f:
                f.write(data)
        os.utime(p, (1700000000, 1700000000))
    return root


def _rj_oracle() -> str:
    n = _RJ_W * _RJ_H
    pr, pc = _RJ_PROBE
    cal_a = (
        f"ROUND(1430.0 / ln(17000.0 / ({PLANCK_R2} * (CAST(probe_raw AS DOUBLE)"
        f" + -6000.0)) + {PLANCK_F}) - 273.15, 4)"
    )
    cal_b = (
        f"ROUND({PLANCK_B} / ln({PLANCK_R1} / ({PLANCK_R2} * (CAST(probe_raw AS DOUBLE)"
        f" + {PLANCK_O})) + {PLANCK_F}) - 273.15, 4)"
    )
    return f"""
        WITH g AS (
            SELECT CAST(SUM(5120 + (i.i * 37) % 77 * 256) AS BIGINT) AS raw_sum,
                   CAST(5120 + (({pr} * {_RJ_W} + {pc}) * 37) % 77 * 256 AS BIGINT)
                       AS probe_raw
            FROM (SELECT unnest(range(0, {n})) AS i) i)
        SELECT path, CAST({_RJ_W} AS INT) AS raw_w, CAST({_RJ_H} AS INT) AS raw_h,
               CAST({n} AS BIGINT) AS n_pixels, raw_sum, probe_raw,
               CASE WHEN path = 'therm_a.jpg' THEN {cal_a} ELSE {cal_b} END AS probe_temp_c
        FROM g, (VALUES ('therm_a.jpg'), ('therm_b.jpg')) AS t(path)
        ORDER BY path"""


@check("thermal_rjpeg_stats", oracle=_rj_oracle())
def q_thermal_rjpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL R-JPEG bytes → FLIR-segment scan (XMP-dims path AND the
    common-size fallback) → distributed pixel table → exact raw stats +
    a Planck-calibrated probe (per-file calibration: FLIR XMP constants
    vs defaults).  Any slip in the byte scan, dimension resolution, or
    calibration priority breaks value parity."""
    import math
    import os

    root = _rj_fixture_root()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.jpg")
        .load(root)
        .select(F.element_at(F.split("path", "/"), -1).alias("path"), "content")
    )
    px = rjpeg_pixel_table(files)
    pr, pc = _RJ_PROBE
    agg = px.groupBy("path").agg(
        F.max("col").alias("_maxc"), F.max("row").alias("_maxr"),
        F.count(F.lit(1)).alias("n_pixels"),
        F.sum("raw").alias("raw_sum"),
        F.max(F.when((F.col("row") == pr) & (F.col("col") == pc), F.col("raw")))
        .alias("probe_raw"),
    )
    # per-file calibration, extracted the same way the kernel would
    cals = {}
    from dronedb_spark.sources.xmp import extract_xmp_packet, parse_xmp

    for name in ("therm_a.jpg", "therm_b.jpg"):
        data = open(os.path.join(root, name), "rb").read()
        text = extract_xmp_packet(data)
        cals[name] = thermal_calibration(parse_xmp(text) if text else {})

    def temp(path: str, raw: int) -> float:
        return round(raw_kelvin(float(raw), cals[path]) - 273.15, 4)

    rows = [
        (r["path"], int(r["_maxc"]) + 1, int(r["_maxr"]) + 1, int(r["n_pixels"]),
         int(r["raw_sum"]), int(r["probe_raw"]), temp(r["path"], r["probe_raw"]))
        for r in agg.collect()
    ]
    return spark.createDataFrame(
        sorted(rows),
        "path string, raw_w int, raw_h int, n_pixels bigint, raw_sum bigint,"
        " probe_raw bigint, probe_temp_c double",
    ).orderBy("path")
