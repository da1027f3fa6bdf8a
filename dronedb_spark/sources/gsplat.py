"""Gaussian-splat DECODE into a relational splat table (SURVEY
GaussianSplat entries; reference: gsplat.cpp:116-205 loadSplatBinary +
the 3DGS/INRIA PLY convention it normalizes to).

Two real source formats, one canonical row model (the SPZ GaussianCloud
convention, gsplat.cpp:125-127):

  * 3DGS PLY (INRIA layout, public): properties x y z f_dc_0..2 opacity
    scale_0..2 rot_0..3 — already stored as log-scales / logit-opacity /
    SH-DC colors, so decode is a pass-through + quaternion normalize;
  * antimatter15 ``.splat`` (public, 32 bytes per primitive):
    position 3×f32 | scale 3×f32 linear | color rgba 4×u8 |
    rotation 4×u8 as (b−128)/128 in (w, x, y, z) order — decode converts
    linear scale → log (1e-9 guard), alpha byte → logit, color byte →
    SH DC via (c/255 − 0.5)/SH_C0, and stores rotations [x, y, z, w]
    normalized, exactly the reference's mapping (gsplat.cpp:155-199).

All conversion arithmetic runs in float64 on the float32 inputs, so the
decoded values are deterministic and the check's oracle states them as
literal doubles.

Spark shape: one ``binaryFile`` row per splat container → Arrow
``mapInPandas`` decode → (src, idx, x..qw) rows; everything downstream
(extent, LOD bucketing, per-cell counts) is plain DataFrame algebra.
"""

from __future__ import annotations

import math
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check

SH_C0 = 0.28209479177387814  # Y_0^0 normalization (public 3DGS constant)

SPLAT_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("idx", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("sx", T.DoubleType()),  # log scales
        T.StructField("sy", T.DoubleType()),
        T.StructField("sz", T.DoubleType()),
        T.StructField("qx", T.DoubleType()),  # normalized, [x, y, z, w]
        T.StructField("qy", T.DoubleType()),
        T.StructField("qz", T.DoubleType()),
        T.StructField("qw", T.DoubleType()),
        T.StructField("alpha", T.DoubleType()),  # logit-opacity
        T.StructField("dc_r", T.DoubleType()),   # SH DC coefficients
        T.StructField("dc_g", T.DoubleType()),
        T.StructField("dc_b", T.DoubleType()),
    ]
)


def _logit(p: float) -> float:
    eps = 1e-6
    p = min(max(p, eps), 1.0 - eps)
    return math.log(p / (1.0 - p))


def decode_splat_binary(data: bytes) -> list[dict]:
    """antimatter15 .splat → canonical rows (gsplat.cpp:116-205)."""
    if len(data) == 0 or len(data) % 32 != 0:
        raise ValueError(".splat size is not a positive multiple of 32")
    out = []
    for i in range(len(data) // 32):
        rec = data[i * 32 : i * 32 + 32]
        px, py, pz, sx, sy, sz = struct.unpack_from("<6f", rec, 0)
        r, g, b, a = rec[24:28]
        qw, qx, qy, qz = ((float(c) - 128.0) / 128.0 for c in rec[28:32])
        qn = math.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
        if qn < 1e-9:
            qn = 1.0
        out.append(
            {
                "idx": i,
                "x": float(px), "y": float(py), "z": float(pz),
                "sx": math.log(max(float(sx), 1e-9)),
                "sy": math.log(max(float(sy), 1e-9)),
                "sz": math.log(max(float(sz), 1e-9)),
                "qx": qx / qn, "qy": qy / qn, "qz": qz / qn, "qw": qw / qn,
                "alpha": _logit(a / 255.0),
                "dc_r": (r / 255.0 - 0.5) / SH_C0,
                "dc_g": (g / 255.0 - 0.5) / SH_C0,
                "dc_b": (b / 255.0 - 0.5) / SH_C0,
            }
        )
    return out


def decode_gsplat_ply(data: bytes) -> list[dict]:
    """3DGS/INRIA PLY → canonical rows: stored values pass through (they
    already use the log/logit/DC convention); quaternions normalize."""
    from dronedb_spark.sources.ply import decode_ply

    props = decode_ply(data)
    if "f_dc_0" not in props:
        raise ValueError("not a 3DGS splat PLY (no f_dc_0)")
    n = len(props["x"])
    out = []
    for i in range(n):
        qx, qy, qz, qw = (
            float(props["rot_1"][i]), float(props["rot_2"][i]),
            float(props["rot_3"][i]), float(props["rot_0"][i]),
        )  # INRIA stores (w, x, y, z) as rot_0..3; canonical order is [x,y,z,w]
        qn = math.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
        if qn < 1e-9:
            qn = 1.0
        out.append(
            {
                "idx": i,
                "x": float(props["x"][i]), "y": float(props["y"][i]), "z": float(props["z"][i]),
                "sx": float(props["scale_0"][i]),
                "sy": float(props["scale_1"][i]),
                "sz": float(props["scale_2"][i]),
                "qx": qx / qn, "qy": qy / qn, "qz": qz / qn, "qw": qw / qn,
                "alpha": float(props["opacity"][i]),
                "dc_r": float(props["f_dc_0"][i]),
                "dc_g": float(props["f_dc_1"][i]),
                "dc_b": float(props["f_dc_2"][i]),
            }
        )
    return out


def encode_splat_binary(rows: list[dict]) -> bytes:
    """Fixture builder: canonical LINEAR-domain inputs → .splat bytes.
    rows: {pos(3), scale_linear(3), rgba(4 bytes), quat_wxyz(4 floats)}"""
    out = bytearray()
    for r in rows:
        out += struct.pack("<6f", *r["pos"], *r["scale_linear"])
        out += bytes(r["rgba"])
        out += bytes(int(round(c * 128.0 + 128.0)) & 0xFF for c in r["quat_wxyz"])
    return bytes(out)


def splat_table(files: DataFrame) -> DataFrame:
    """(src, content) → splat rows; format sniffed per file (PLY magic
    vs 32-byte-multiple .splat), decode errors log-and-skip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import logging

        cols = [f.name for f in SPLAT_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for src, content in zip(pdf["src"], pdf["content"]):
                data = bytes(content)
                try:
                    recs = (
                        decode_gsplat_ply(data)
                        if data.startswith(b"ply")
                        else decode_splat_binary(data)
                    )
                except Exception as ex:
                    logging.getLogger(__name__).warning(
                        "splat_table: skipping %s: %s", src, ex
                    )
                    continue
                for rec in recs:
                    rec = dict(rec)
                    rec["src"] = src
                    rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=SPLAT_SCHEMA)


def read_splats(spark: SparkSession, root: str, glob: str = "*.{splat,ply}") -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            F.regexp_extract("path", r"([^/]+)\.[^./]+$", 1).alias("src"), "content"
        )
    )
    return splat_table(files)


# ------------------------------------------------------------------ check

_GS_N = 16


def _gs_spec(i: int) -> dict:
    """Deterministic gaussians in the LINEAR domain (what a .splat holds)."""
    return {
        "pos": ((i % 7) * 1.5 - 4.0, (i % 5) * 2.25 - 5.0, (i % 3) * 0.75),
        "scale_linear": (0.5 + (i % 4) * 0.25, 0.25 + (i % 3) * 0.5, 1.0 + (i % 2)),
        "rgba": ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256, 40 + (i * 13) % 216),
        # exact byte-grid quaternion components so encode→decode is lossless
        "quat_wxyz": (
            ((64 + 8 * (i % 8)) - 128) / 128.0,
            ((i * 11) % 256 - 128) / 128.0,
            ((i * 29) % 256 - 128) / 128.0,
            ((i * 47) % 256 - 128) / 128.0,
        ),
    }


def _gs_fixture_root() -> str:
    import os

    from dronedb_spark.sources.ply import encode_ply

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "gsplat_v1")
    )
    os.makedirs(root, exist_ok=True)
    specs = [_gs_spec(i) for i in range(_GS_N)]
    payload = encode_splat_binary(specs)
    # the SAME gaussians in the PLY convention (log/logit/DC), float32
    conv = [_splat_expected(i) for i in range(_GS_N)]
    props = {
        "x": np.array([c[2] for c in conv], dtype=np.float32),
        "y": np.array([c[3] for c in conv], dtype=np.float32),
        "z": np.array([c[4] for c in conv], dtype=np.float32),
        "f_dc_0": np.array([c[15] for c in conv], dtype=np.float32),
        "f_dc_1": np.array([c[16] for c in conv], dtype=np.float32),
        "f_dc_2": np.array([c[17] for c in conv], dtype=np.float32),
        "opacity": np.array([c[14] for c in conv], dtype=np.float32),
        "scale_0": np.array([c[5] for c in conv], dtype=np.float32),
        "scale_1": np.array([c[6] for c in conv], dtype=np.float32),
        "scale_2": np.array([c[7] for c in conv], dtype=np.float32),
        "rot_0": np.array([c[13] for c in conv], dtype=np.float32),  # w
        "rot_1": np.array([c[10] for c in conv], dtype=np.float32),  # x
        "rot_2": np.array([c[11] for c in conv], dtype=np.float32),  # y
        "rot_3": np.array([c[12] for c in conv], dtype=np.float32),  # z
    }
    for name, data in (("cloud_a.splat", payload), ("cloud_b.ply", encode_ply(props))):
        p = os.path.join(root, name)
        if not os.path.exists(p) or open(p, "rb").read() != data:
            with open(p, "wb") as f:
                f.write(data)
        os.utime(p, (1700000000, 1700000000))
    return root


def _f32(v: float) -> float:
    return float(np.float32(v))


def _splat_expected(i: int) -> tuple:
    """Mirror of decode_splat_binary over the fixture spec (float32
    storage → float64 conversions — identical arithmetic)."""
    s = _gs_spec(i)
    px, py, pz = (_f32(v) for v in s["pos"])
    lx, ly, lz = (math.log(max(_f32(v), 1e-9)) for v in s["scale_linear"])
    r, g, b, a = s["rgba"]
    qb = [int(round(c * 128.0 + 128.0)) & 0xFF for c in s["quat_wxyz"]]
    qw, qx, qy, qz = ((float(c) - 128.0) / 128.0 for c in qb)
    qn = math.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    if qn < 1e-9:
        qn = 1.0
    return (
        "cloud_a", i, px, py, pz, lx, ly, lz,
        None,  # placeholder keeps index alignment below
        None,
        qx / qn, qy / qn, qz / qn, qw / qn,
        _logit(a / 255.0),
        (r / 255.0 - 0.5) / SH_C0,
        (g / 255.0 - 0.5) / SH_C0,
        (b / 255.0 - 0.5) / SH_C0,
    )


def _gs_oracle() -> str:
    rows = []
    for src_i in range(2):
        for i in range(_GS_N):
            e = _splat_expected(i)
            if src_i == 0:
                vals = ("cloud_a", i, e[2], e[3], e[4], e[5], e[6], e[7],
                        e[10], e[11], e[12], e[13], e[14], e[15], e[16], e[17])
            else:
                # PLY stores the converted float64 values as float32; the
                # pass-through decode then re-normalizes the quaternion
                f = [_f32(v) for v in (e[2], e[3], e[4], e[5], e[6], e[7])]
                q = [_f32(v) for v in (e[10], e[11], e[12], e[13])]
                qn = math.sqrt(sum(c * c for c in q)) or 1.0
                rest = [_f32(v) for v in (e[14], e[15], e[16], e[17])]
                vals = ("cloud_b", i, *f, *(c / qn for c in q), *rest)
            rows.append(
                "(" + ", ".join(
                    f"'{v}'" if isinstance(v, str) else repr(round(float(v), 9)) if isinstance(v, float) else str(v)
                    for v in vals
                ) + ")"
            )
    values = ",\n            ".join(rows)
    return f"""
        SELECT src, CAST(idx AS INT) AS idx, x, y, z, sx, sy, sz,
               qx, qy, qz, qw, alpha, dc_r, dc_g, dc_b
        FROM (VALUES
            {values}) AS t(src, idx, x, y, z, sx, sy, sz,
                           qx, qy, qz, qw, alpha, dc_r, dc_g, dc_b)
        ORDER BY src, idx"""


@check("gsplat_decode_table", oracle=_gs_oracle())
def q_gsplat_decode_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL splat bytes, both public formats, one canonical table: the
    antimatter15 byte layout (linear→log scale, byte→logit alpha,
    byte→SH-DC color, (b-128)/128 wxyz quat normalize) and the INRIA PLY
    pass-through — value-checked to 9 dp against the literal mirror."""
    df = read_splats(spark, _gs_fixture_root())
    rounded = [
        F.round(c, 9).alias(c)
        for c in ["x", "y", "z", "sx", "sy", "sz", "qx", "qy", "qz", "qw",
                  "alpha", "dc_r", "dc_g", "dc_b"]
    ]
    return df.select("src", "idx", *rounded).orderBy("src", "idx")
