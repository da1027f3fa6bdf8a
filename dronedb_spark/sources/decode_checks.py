"""Driver checks for the REAL format decoders (PNG/WAV/PLY/LAS/GeoTIFF).

Every check generates fixture bytes from a CLOSED-FORM function inside a
distributed kernel, round-trips them through the real codec, and
aggregates — so the DuckDB oracle can reproduce the expected values
relationally from the same closed form (the media_stripe_means pattern).
A broken bit anywhere in the codec (filter math, strip offsets, scale/
offset quantization, channel interleave) shifts the aggregates and fails
the hash.  All closed forms are quarter-integers or small ints: exact in
float32 storage and order-independent in float64 sums.

Reference parity targets: thumbs.cpp (image decode), getPointCloudInfo
(PDAL header/stats), GDAL raster open/stats — re-expressed as pure-Python
codecs + DataFrame aggregation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check
from dronedb_spark.tables import spread

_BIN_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType()), T.StructField("content", T.BinaryType())]
)

# ---------------------------------------------------------------- PNG ---

_PNG_N, _PNG_W, _PNG_H = 24, 24, 16


def _png_pixels(i: int) -> np.ndarray:
    j = np.arange(_PNG_H * _PNG_W * 3, dtype=np.int64)
    return ((i * 131 + j * 17) % 256).astype(np.uint8).reshape(_PNG_H, _PNG_W, 3)


def _gen_png(ids: DataFrame) -> DataFrame:
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.png import encode_png

        for pdf in it:
            rows = [
                {
                    "media_id": int(i),
                    # cycle ALL five filter types so every unfilter path
                    # is on the hot path of the correctness gate
                    "content": encode_png(_png_pixels(int(i)), filters=[0, 1, 2, 3, 4]),
                }
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    return ids.mapInPandas(gen, schema=_BIN_SCHEMA)


@check(
    "media_png_channel_stats",
    oracle=f"""
        WITH px AS (
            SELECT i.i AS media_id, j.j % 3 AS channel,
                   CAST((i.i * 131 + j.j * 17) % 256 AS DOUBLE) AS v
            FROM (SELECT unnest(range(0, {_PNG_N})) AS i) i,
                 (SELECT unnest(range(0, {_PNG_H * _PNG_W * 3})) AS j) j)
        SELECT media_id, CAST(channel AS INT) AS channel,
               AVG(v) AS mean_val, CAST(MIN(v) AS DOUBLE) AS min_val,
               CAST(MAX(v) AS DOUBLE) AS max_val, COUNT(*) AS n_px
        FROM px GROUP BY media_id, channel
        ORDER BY media_id, channel""",
)
def q_png_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG bytes (all five row filters) → decode_media → per-channel
    stats.  The oracle evaluates the pixel closed form relationally."""
    media = _gen_png(spread(spark.range(_PNG_N)))

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.multimodal.media import decode_media

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = decode_media(bytes(content)).astype(np.float64)
                for ch in range(arr.shape[2]):
                    band = arr[:, :, ch]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "channel": ch,
                            "mean_val": float(band.mean()),
                            "min_val": float(band.min()),
                            "max_val": float(band.max()),
                            "n_px": int(band.size),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "channel", "mean_val", "min_val", "max_val", "n_px"]
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("channel", T.IntegerType()),
            T.StructField("mean_val", T.DoubleType()),
            T.StructField("min_val", T.DoubleType()),
            T.StructField("max_val", T.DoubleType()),
            T.StructField("n_px", T.LongType()),
        ]
    )
    return media.mapInPandas(stats, schema=schema).orderBy("media_id", "channel")


# ---------------------------------------------------------------- GIF ---

_GIF_N, _GIF_H, _GIF_W = 6, 24, 32


@check(
    "media_gif_channel_stats",
    oracle=f"""
        WITH px AS (
            SELECT i.i AS media_id,
                   CAST((i.i * 131 + j.j * 17) % 256 AS DOUBLE) AS v
            FROM (SELECT unnest(range(0, {_GIF_N})) AS i) i,
                 (SELECT unnest(range(0, {_GIF_H * _GIF_W})) AS j) j)
        SELECT media_id, c.channel,
               AVG(v) AS mean_val, CAST(MIN(v) AS DOUBLE) AS min_val,
               CAST(MAX(v) AS DOUBLE) AS max_val, COUNT(*) AS n_px
        FROM px, (SELECT CAST(unnest(range(0, 3)) AS INT) AS channel) c
        GROUP BY media_id, c.channel
        ORDER BY media_id, c.channel""",
)
def q_gif_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real GIF bytes (palette + LSB-first variable-width LZW with the
    width-growth convention pinned against a real encoder stream in
    test_golden_vectors) → decode_media first-frame RGB → per-channel
    stats; gray palette makes all three channels share the closed form
    the oracle evaluates relationally (reference types .gif as Image,
    entry.cpp:1040)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.gif import encode_gif

        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                j = np.arange(_GIF_H * _GIF_W, dtype=np.int64)
                v = ((i * 131 + j * 17) % 256).astype(np.uint8)
                img = v.reshape(_GIF_H, _GIF_W, 1).repeat(3, axis=2)
                rows.append({"media_id": i, "content": encode_gif([img])})
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = spread(spark.range(_GIF_N)).mapInPandas(gen, schema=_BIN_SCHEMA)

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.multimodal.media import decode_media

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = decode_media(bytes(content)).astype(np.float64)
                for ch in range(arr.shape[2]):
                    band = arr[:, :, ch]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "channel": ch,
                            "mean_val": float(band.mean()),
                            "min_val": float(band.min()),
                            "max_val": float(band.max()),
                            "n_px": int(band.size),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "channel", "mean_val", "min_val", "max_val", "n_px"]
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("channel", T.IntegerType()),
            T.StructField("mean_val", T.DoubleType()),
            T.StructField("min_val", T.DoubleType()),
            T.StructField("max_val", T.DoubleType()),
            T.StructField("n_px", T.LongType()),
        ]
    )
    return media.mapInPandas(stats, schema=schema).orderBy("media_id", "channel")


# ---------------------------------------------------------------- WAV ---

_WAV_N, _WAV_LEN = 20, 800


def _wav_samples(i: int) -> np.ndarray:
    t = np.arange(_WAV_LEN, dtype=np.int64)
    return (((i * 31 + t * 29) % 4001) - 2000).astype(np.int16)


@check(
    "audio_wav_metrics",
    oracle=f"""
        WITH s AS (
            SELECT i.i AS media_id, t.t AS t,
                   CAST((i.i * 31 + t.t * 29) % 4001 - 2000 AS DOUBLE) AS v
            FROM (SELECT unnest(range(0, {_WAV_N})) AS i) i,
                 (SELECT unnest(range(0, {_WAV_LEN})) AS t) t)
        SELECT media_id, COUNT(*) AS n_samples,
               SUM(v * v) AS sum_sq, SUM(ABS(v)) AS sum_abs,
               CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
        FROM s GROUP BY media_id ORDER BY media_id""",
)
def q_wav_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PCM16 WAV bytes → decode_media → energy metrics; the oracle
    reproduces the sample closed form (integer sums, exact in doubles)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.wav import encode_wav

        for pdf in it:
            rows = [
                {"media_id": int(i), "content": encode_wav(_wav_samples(int(i)), 16000)}
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    def metrics(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.multimodal.media import decode_media

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                s = decode_media(bytes(content))
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": int(s.size),
                        "sum_sq": float(np.sum(s * s)),
                        "sum_abs": float(np.sum(np.abs(s))),
                        "n_pos": int(np.sum(s > 0)),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "sum_sq", "sum_abs", "n_pos"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_samples", T.LongType()),
            T.StructField("sum_sq", T.DoubleType()),
            T.StructField("sum_abs", T.DoubleType()),
            T.StructField("n_pos", T.LongType()),
        ]
    )
    media = spread(spark.range(_WAV_N)).mapInPandas(gen, schema=_BIN_SCHEMA)
    return media.mapInPandas(metrics, schema=schema).orderBy("media_id")


# ---------------------------------------------------------------- PLY ---

_PLY_N = 12


def _ply_cloud(i: int) -> dict[str, np.ndarray]:
    n = 200 + 10 * i
    k = np.arange(n, dtype=np.int64)
    return {
        "x": ((i * 37 + k * 11) % 1000) * 0.25,
        "y": ((i * 53 + k * 13) % 1000) * 0.25,
        "z": ((i * 29 + k * 7) % 400) * 0.25,
        "intensity": ((i * 3 + k) % 65536).astype(np.float64),
    }


@check(
    "pointcloud_ply_stats",
    oracle=f"""
        WITH pts AS (
            SELECT i.i AS cloud_id,
                   CAST((i.i * 37 + k.k * 11) % 1000 AS DOUBLE) * 0.25 AS x,
                   CAST((i.i * 29 + k.k * 7) % 400 AS DOUBLE) * 0.25 AS z,
                   CAST((i.i * 3 + k.k) % 65536 AS DOUBLE) AS intensity
            FROM (SELECT unnest(range(0, {_PLY_N})) AS i) i,
                 (SELECT unnest(range(0, 200 + 10 * {_PLY_N - 1})) AS k) k
            WHERE k.k < 200 + 10 * i.i)
        SELECT cloud_id, COUNT(*) AS n_points,
               MIN(x) AS min_x, MAX(x) AS max_x,
               AVG(z) AS mean_z, MAX(intensity) AS max_intensity
        FROM pts GROUP BY cloud_id ORDER BY cloud_id""",
)
def q_ply_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PLY bytes (binary LE for even ids, ascii for odd) → decode →
    per-cloud stats.  Quarter-integer coordinates are exact in the f4
    binary encoding, so both PLY flavors agree with the oracle."""

    def gen_and_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.ply import decode_ply, encode_ply

        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                cloud = _ply_cloud(i)
                blob = encode_ply(
                    cloud, binary=(i % 2 == 0), dtypes={"intensity": "ushort"}
                )
                d = decode_ply(blob)
                rows.append(
                    {
                        "cloud_id": i,
                        "n_points": int(d["x"].size),
                        "min_x": float(d["x"].min()),
                        "max_x": float(d["x"].max()),
                        "mean_z": float(d["z"].astype(np.float64).mean()),
                        "max_intensity": float(d["intensity"].max()),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=["cloud_id", "n_points", "min_x", "max_x", "mean_z", "max_intensity"],
            )

    schema = T.StructType(
        [
            T.StructField("cloud_id", T.LongType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("min_x", T.DoubleType()),
            T.StructField("max_x", T.DoubleType()),
            T.StructField("mean_z", T.DoubleType()),
            T.StructField("max_intensity", T.DoubleType()),
        ]
    )
    return spread(spark.range(_PLY_N)).mapInPandas(gen_and_stats, schema=schema).orderBy("cloud_id")


# ---------------------------------------------------------------- LAS ---

_LAS_N = 10


@check(
    "pointcloud_las_class_histogram",
    oracle=f"""
        WITH pts AS (
            SELECT i.i AS file_id, (i.i + k.k) % 12 AS classification,
                   CAST((i.i * 17 + k.k * 5) % 100000 AS DOUBLE) * 0.001 + 100.0 AS x,
                   CAST((i.i * 23 + k.k * 3) % 50000 AS DOUBLE) * 0.001 AS z
            FROM (SELECT unnest(range(0, {_LAS_N})) AS i) i,
                 (SELECT unnest(range(0, 300 + 20 * {_LAS_N - 1})) AS k) k
            WHERE k.k < 300 + 20 * i.i)
        SELECT file_id, CAST(classification AS BIGINT) AS classification,
               COUNT(*) AS n, MIN(x) AS min_x, MAX(x) AS max_x,
               MIN(z) AS min_z, MAX(z) AS max_z
        FROM pts GROUP BY file_id, classification
        ORDER BY file_id, classification""",
)
def q_las_class_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real LAS 1.2 bytes → decode → per-file classification histogram
    with bounds.  Coordinates sit exactly on the 0.001 scale grid, so the
    int32·scale+offset reconstruction is bit-identical to the oracle's
    closed-form arithmetic."""

    def gen_and_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.las import decode_las, encode_las

        for pdf in it:
            out = []
            for i in pdf["id"]:
                i = int(i)
                n = 300 + 20 * i
                k = np.arange(n, dtype=np.int64)
                x = ((i * 17 + k * 5) % 100000).astype(np.float64) * 0.001 + 100.0
                y = ((i * 13 + k * 9) % 80000).astype(np.float64) * 0.001
                z = ((i * 23 + k * 3) % 50000).astype(np.float64) * 0.001
                cls = ((i + k) % 12).astype(np.int64)
                gps = k.astype(np.float64) * 0.5
                blob = encode_las(
                    x, y, z, classification=cls, gps_time=gps, offset=(100.0, 0.0, 0.0)
                )
                d = decode_las(blob)
                pdf2 = pd.DataFrame(
                    {"classification": d["classification"], "x": d["x"], "z": d["z"]}
                )
                g = pdf2.groupby("classification").agg(
                    n=("x", "size"), min_x=("x", "min"), max_x=("x", "max"),
                    min_z=("z", "min"), max_z=("z", "max"),
                )
                for cls_v, r in g.iterrows():
                    out.append(
                        {
                            "file_id": i,
                            "classification": int(cls_v),
                            "n": int(r["n"]),
                            "min_x": float(r["min_x"]),
                            "max_x": float(r["max_x"]),
                            "min_z": float(r["min_z"]),
                            "max_z": float(r["max_z"]),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["file_id", "classification", "n", "min_x", "max_x", "min_z", "max_z"]
            )

    schema = T.StructType(
        [
            T.StructField("file_id", T.LongType()),
            T.StructField("classification", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("min_x", T.DoubleType()),
            T.StructField("max_x", T.DoubleType()),
            T.StructField("min_z", T.DoubleType()),
            T.StructField("max_z", T.DoubleType()),
        ]
    )
    return (
        spread(spark.range(_LAS_N))
        .mapInPandas(gen_and_stats, schema=schema)
        .orderBy("file_id", "classification")
    )


# ------------------------------------------------------------- GeoTIFF ---

_TIF_N, _TIF_W = 6, 64


@check(
    "raster_tiff_stats",
    oracle=f"""
        WITH px AS (
            SELECT i.i AS raster_id, r.r AS r, c.c AS c,
                   CASE WHEN (r.r * 31 + c.c * 17) % 53 = 0 THEN NULL
                        ELSE CAST((i.i * 7 + r.r * 13 + c.c * 29) % 997 AS DOUBLE) * 0.25
                   END AS v
            FROM (SELECT unnest(range(0, {_TIF_N})) AS i) i,
                 (SELECT unnest(range(0, 48 + 4 * {_TIF_N - 1})) AS r) r,
                 (SELECT unnest(range(0, {_TIF_W})) AS c) c
            WHERE r.r < 48 + 4 * i.i)
        SELECT raster_id, COUNT(v) AS n_valid,
               MIN(v) AS min_v, MAX(v) AS max_v, SUM(v) AS sum_v
        FROM px GROUP BY raster_id ORDER BY raster_id""",
)
def q_tiff_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real uncompressed float32 GeoTIFF bytes (multi-strip, nodata tag)
    → decode_tiff → per-raster stats; quarter-integer pixels keep every
    aggregate exact."""

    def gen_and_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.tiff import decode_tiff, encode_tiff

        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                h = 48 + 4 * i
                r = np.arange(h, dtype=np.int64)[:, None]
                c = np.arange(_TIF_W, dtype=np.int64)[None, :]
                v = (((i * 7 + r * 13 + c * 29) % 997) * 0.25).astype(np.float32)
                v[(r * 31 + c * 17) % 53 == 0] = np.float32(-9999.0)
                blob = encode_tiff(
                    v, pixel_scale=(0.5, 0.5), tiepoint=(1000.0 + i, 2000.0),
                    nodata=-9999.0, rows_per_strip=16,
                )
                arr, geo = decode_tiff(blob)
                valid = arr[arr != np.float32(geo["nodata"])].astype(np.float64)
                rows.append(
                    {
                        "raster_id": i,
                        "n_valid": int(valid.size),
                        "min_v": float(valid.min()),
                        "max_v": float(valid.max()),
                        "sum_v": float(valid.sum()),
                    }
                )
            yield pd.DataFrame(rows, columns=["raster_id", "n_valid", "min_v", "max_v", "sum_v"])

    schema = T.StructType(
        [
            T.StructField("raster_id", T.LongType()),
            T.StructField("n_valid", T.LongType()),
            T.StructField("min_v", T.DoubleType()),
            T.StructField("max_v", T.DoubleType()),
            T.StructField("sum_v", T.DoubleType()),
        ]
    )
    return spread(spark.range(_TIF_N)).mapInPandas(gen_and_stats, schema=schema).orderBy("raster_id")


# ------------------------------------------------- multiformat ingest ---


def _mixed_fixture_root() -> str:
    """Build (idempotently) a mixed-format tree: the REAL ingest path must
    fingerprint + parse PNG, LAS, PLY (pointcloud, splat, mesh), WAV and
    GeoTIFF bytes it has never seen before."""
    import os

    from dronedb_spark.sources.las import encode_las
    from dronedb_spark.sources.ply import encode_ply
    from dronedb_spark.sources.png import encode_png
    from dronedb_spark.sources.tiff import encode_tiff
    from dronedb_spark.sources.wav import encode_wav

    root = os.path.join(
        os.path.dirname(__file__), "..", "..", "tests", "fixtures", "formats_v1"
    )
    root = os.path.abspath(root)
    os.makedirs(os.path.join(root, "scans"), exist_ok=True)

    k = np.arange(100, dtype=np.int64)
    files: dict[str, bytes] = {
        "photo.png": encode_png(_png_pixels(3), filters=[0, 1, 2, 3, 4]),
        "wide_pano.png": encode_png(
            ((np.arange(16 * 64 * 3) * 7) % 256).astype(np.uint8).reshape(16, 64, 3)
        ),
        "scans/ground.las": encode_las(
            (k % 50).astype(np.float64) * 0.5,
            (k % 40).astype(np.float64) * 0.5,
            (k % 30).astype(np.float64) * 0.25,
            classification=(k % 4),
        ),
        "scans/cloud.ply": encode_ply(
            {"x": k * 0.25, "y": k * 0.5, "z": (k % 10) * 1.0}, binary=True
        ),
        "scans/splat.ply": encode_ply(
            {
                "x": k * 0.25, "y": k * 0.25, "z": k * 0.25,
                "f_dc_0": k * 0.125, "f_dc_1": k * 0.125, "f_dc_2": k * 0.125,
            },
            binary=True,
        ),
        "voice.wav": encode_wav(_wav_samples(5), 16000),
        "scans/dem.tif": encode_tiff(
            ((np.arange(32 * 48) % 211) * 0.5).astype(np.float32).reshape(32, 48),
            pixel_scale=(1.5, 1.5), tiepoint=(700.0, 800.0), nodata=-1.0,
        ),
        "notes.txt": b"survey notes\n",
    }
    for rel, payload in files.items():
        p = os.path.join(root, rel)
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    return root


def _mixed_oracle() -> str:
    from dronedb_spark.catalog.derive import ENTRY_TYPES as ET

    rows = [
        # (path, type, width, height, pointCount, vertexCount, sampleRate, pixelScaleX)
        ("notes.txt", ET["Generic"], None, None, None, None, None, None),
        ("photo.png", ET["Image"], _PNG_W, _PNG_H, None, None, None, None),
        ("scans", ET["Directory"], None, None, None, None, None, None),
        # PLY point clouds expose pointCount = vertexCount (pointcloud.cpp
        # parity); splats keep vertexCount only
        ("scans/cloud.ply", ET["PointCloud"], None, None, 100, 100, None, None),
        ("scans/dem.tif", ET["GeoRaster"], 48, 32, None, None, None, 1.5),
        ("scans/ground.las", ET["PointCloud"], None, None, 100, None, None, None),
        ("scans/splat.ply", ET["GaussianSplat"], None, None, None, 100, None, None),
        ("voice.wav", ET["Generic"], None, None, None, None, 16000, None),
        # 64x16 → aspect 4 → Panorama (entry.cpp:1081-1092), now provable
        # for PNG because the IHDR decode is real
        ("wide_pano.png", ET["Panorama"], 64, 16, None, None, None, None),
    ]

    def lit(v):
        if v is None:
            return "NULL"
        return "'" + v.replace("'", "''") + "'" if isinstance(v, str) else repr(v)

    values = ",\n            ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    # absent metadata → -1 (not NULL): the parity comparator sorts row
    # tuples and None is unordered against ints
    return f"""
        SELECT path, CAST(type AS INT) AS type,
               CAST(COALESCE(width, -1) AS INT) AS width,
               CAST(COALESCE(height, -1) AS INT) AS height,
               CAST(COALESCE(point_count, -1) AS BIGINT) AS point_count,
               CAST(COALESCE(vertex_count, -1) AS BIGINT) AS vertex_count,
               CAST(COALESCE(sample_rate, -1) AS INT) AS sample_rate,
               CAST(COALESCE(pixel_scale_x, -1) AS DOUBLE) AS pixel_scale_x
        FROM (VALUES
            {values}) AS t(path, type, width, height, point_count,
                           vertex_count, sample_rate, pixel_scale_x)
        ORDER BY path"""


@check("ingest_format_props", oracle=_mixed_oracle())
def q_ingest_format_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full catalog ingest (distributed binaryFile listing → fingerprint →
    parse) over a mixed PNG/LAS/PLY/splat/WAV/GeoTIFF tree, value-checked
    against the formats' known metadata."""
    from dronedb_spark.sources.fs import ingest

    ent = ingest(spark, _mixed_fixture_root())

    def prop(name: str, typ: str):
        return F.coalesce(
            F.get_json_object("properties", f"$.{name}").cast(typ), F.lit(-1).cast(typ)
        )

    return ent.select(
        "path",
        F.col("type").cast("int").alias("type"),
        prop("width", "int").alias("width"),
        prop("height", "int").alias("height"),
        prop("pointCount", "bigint").alias("point_count"),
        prop("vertexCount", "bigint").alias("vertex_count"),
        prop("sampleRate", "int").alias("sample_rate"),
        prop("pixelScaleX", "double").alias("pixel_scale_x"),
    ).orderBy("path")


# ---------------------------------------------------------------- JPEG --

_JPG_N, _JPG_BY, _JPG_BX = 16, 6, 8


def _jpg_dc(i: int) -> np.ndarray:
    """Closed-form DC grid: dc[r,c] = ((i*7 + r*5 + c*3) % 120) - 60.
    Decoded block value = 128 + 2*dc ∈ [8, 246] — never clipped, fully
    integer (q0=16 ⇒ pixel = 128 + dc·16/8)."""
    r = np.arange(_JPG_BY, dtype=np.int64)[:, None]
    c = np.arange(_JPG_BX, dtype=np.int64)[None, :]
    return (i * 7 + r * 5 + c * 3) % 120 - 60


@check(
    "media_jpeg_channel_stats",
    oracle=f"""
        WITH blk AS (
            SELECT i.i AS media_id,
                   CAST(128 + 2 * ((i.i * 7 + r.r * 5 + c.c * 3) % 120 - 60) AS DOUBLE) AS v
            FROM (SELECT unnest(range(0, {_JPG_N})) AS i) i,
                 (SELECT unnest(range(0, {_JPG_BY})) AS r) r,
                 (SELECT unnest(range(0, {_JPG_BX})) AS c) c)
        SELECT media_id, AVG(v) AS mean_val,
               CAST(MIN(v) AS DOUBLE) AS min_val, CAST(MAX(v) AS DOUBLE) AS max_val,
               CAST({_JPG_BY * _JPG_BX * 64} AS BIGINT) AS n_px
        FROM blk GROUP BY media_id ORDER BY media_id""",
)
def q_jpeg_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG bytes (Huffman + dequant + IDCT via
    sources/jpeg.py) → decode_media → per-image stats.  DC-only grayscale
    fixtures make the lossy codec integer-exact (see encode_jpeg_dc_blocks),
    so the oracle reproduces the decode relationally — the K9 thumbs.cpp
    parity gate on its dominant input format."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.jpeg import encode_jpeg_dc_blocks

        for pdf in it:
            rows = [
                {"media_id": int(i), "content": encode_jpeg_dc_blocks(_jpg_dc(int(i)), q0=16)}
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows, columns=["media_id", "content"])

    media = spread(spark.range(_JPG_N)).mapInPandas(gen, schema=_BIN_SCHEMA)

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.multimodal.media import decode_media

        for pdf in it:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                arr = decode_media(bytes(content)).astype(np.float64)
                rows.append(
                    {
                        "media_id": int(mid),
                        "mean_val": float(arr.mean()),
                        "min_val": float(arr.min()),
                        "max_val": float(arr.max()),
                        "n_px": int(arr.size),
                    }
                )
            yield pd.DataFrame(rows, columns=["media_id", "mean_val", "min_val", "max_val", "n_px"])

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("mean_val", T.DoubleType()),
            T.StructField("min_val", T.DoubleType()),
            T.StructField("max_val", T.DoubleType()),
            T.StructField("n_px", T.LongType()),
        ]
    )
    return media.mapInPandas(stats, schema=schema).orderBy("media_id")


# ----------------------------------------------------------------- MP4 --

_MP4_N = 12


def _mp4_fixture_root() -> str:
    import os

    from dronedb_spark.sources.mp4 import encode_mp4_stub

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "mp4_cat_v1")
    )
    os.makedirs(root, exist_ok=True)
    for i in range(_MP4_N):
        payload = encode_mp4_stub(
            duration_s=2.0 + i * 0.25,
            width=320 + 16 * i,
            height=240 + 8 * i,
            n_audio_tracks=i % 3,
        )
        p = os.path.join(root, f"clip_{i:02d}.mp4")
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    os.utime(root, (1700000000, 1700000000))
    return root


@check(
    "video_mp4_metadata",
    oracle=f"""
        SELECT 'clip_' || CASE WHEN i < 10 THEN '0' ELSE '' END || i || '.mp4' AS path,
               CAST(9 AS INT) AS type,  -- ENTRY_TYPES['Video']
               2.0 + i * 0.25 AS duration_s,
               CAST(320 + 16 * i AS INT) AS width,
               CAST(240 + 8 * i AS INT) AS height,
               CAST(1 + i % 3 AS INT) AS tracks
        FROM (SELECT unnest(range(0, {_MP4_N})) AS i)
        ORDER BY path""",
)
def q_video_mp4_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL ISO-BMFF bytes → full ingest (fingerprint by extension, box
    walk in the entry parser) → typed video properties, value-checked
    against the closed-form fixture params — the metadata half of
    entry.cpp:1086-1099's video classification."""
    from dronedb_spark.sources.fs import ingest

    ent = ingest(spark, _mp4_fixture_root())
    return (
        ent.filter(F.col("path").endswith(".mp4"))
        .select(
            "path",
            F.col("type").cast("int").alias("type"),
            F.get_json_object("properties", "$.duration").cast("double").alias("duration_s"),
            F.get_json_object("properties", "$.width").cast("int").alias("width"),
            F.get_json_object("properties", "$.height").cast("int").alias("height"),
            F.get_json_object("properties", "$.tracks").cast("int").alias("tracks"),
        )
        .orderBy("path")
    )


# ------------------------------------------------------ SPZ / 3TZ probes

_SPZ_N, _TZ_N = 6, 5


def _splat_fixture_root() -> str:
    import os

    from dronedb_spark.sources.splat import encode_3tz, encode_spz

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "splat_cat_v1")
    )
    os.makedirs(root, exist_ok=True)
    payloads: dict[str, bytes] = {}
    for i in range(_SPZ_N):
        payloads[f"splat_{i}.spz"] = encode_spz(
            num_points=1000 + 137 * i, sh_degree=i % 4
        )
    for i in range(_TZ_N):
        payloads[f"scene_{i}.3tz"] = encode_3tz(
            geometric_error=16.0 + i * 2.0, n_children=1 + i % 4
        )
    for rel, payload in payloads.items():
        p = os.path.join(root, rel)
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))
    os.utime(root, (1700000000, 1700000000))
    return root


def _splat_oracle() -> str:
    from dronedb_spark.catalog.derive import ENTRY_TYPES as ET

    # absent props -> -1 sentinels: the parity comparator sorts row tuples
    # and None is unordered against numbers (same convention as
    # ingest_format_props)
    return f"""
        SELECT 'splat_' || i || '.spz' AS path, CAST({ET["GaussianSplat"]} AS INT) AS type,
               CAST(1000 + 137 * i AS BIGINT) AS point_count,
               CAST(i % 4 AS INT) AS sh_degree,
               CAST(-1.0 AS DOUBLE) AS geometric_error, CAST(-1 AS INT) AS child_count
        FROM (SELECT unnest(range(0, {_SPZ_N})) AS i)
        UNION ALL
        SELECT 'scene_' || i || '.3tz', CAST({ET["Tiles3D"]} AS INT),
               CAST(-1 AS BIGINT), CAST(-1 AS INT),
               16.0 + i * 2.0, CAST(1 + i % 4 AS INT)
        FROM (SELECT unnest(range(0, {_TZ_N})) AS i)
        ORDER BY path"""


@check("splat_tiles_probe", oracle=_splat_oracle())
def q_splat_tiles_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL .spz (gzip header probe) and .3tz (zip stream walk) bytes →
    full ingest → typed splat/tileset properties (entry.cpp:463-475 and
    :711-751 parity, replacing r2's extension-only classification)."""
    from dronedb_spark.sources.fs import ingest

    ent = ingest(spark, _splat_fixture_root())
    return (
        ent.filter(F.col("path").endswith(".spz") | F.col("path").endswith(".3tz"))
        .select(
            "path",
            F.col("type").cast("int").alias("type"),
            F.coalesce(
                F.get_json_object("properties", "$.pointCount").cast("bigint"), F.lit(-1)
            ).alias("point_count"),
            F.coalesce(
                F.get_json_object("properties", "$.shDegree").cast("int"), F.lit(-1)
            ).alias("sh_degree"),
            F.coalesce(
                F.get_json_object("properties", "$.geometricError").cast("double"),
                F.lit(-1.0),
            ).alias("geometric_error"),
            F.coalesce(
                F.get_json_object("properties", "$.childCount").cast("int"), F.lit(-1)
            ).alias("child_count"),
        )
        .orderBy("path")
    )


# -------------------------------------------- extended codec variants ---
# variants: 0 deflate-TIFF, 1 deflate+predictor, 2 LZW, 3 LZW+predictor
# (all uint8 pixels v(i) = (i*37 + variant*11) % 251), 4 palette-PNG
# (palette[j] = (j*41, j*59, j*83) % 251, index(i) = i % 16), 5 float32
# WAV (s(i) = ((i*13) % 101 - 50)/4 — exact in f32), 6 24-bit-PCM WAV
# (s(i) = (i*2003) % 100000 - 50000).

_XC_N = 48 * 32


def _xc_media(variant: int) -> bytes:
    if variant <= 3:
        from dronedb_spark.sources.tiff import encode_tiff

        i = np.arange(_XC_N, dtype=np.int64)
        v = ((i * 37 + variant * 11) % 251).astype(np.uint8).reshape(32, 48)
        return encode_tiff(
            v, compression="deflate" if variant < 2 else "lzw",
            predictor=bool(variant % 2), rows_per_strip=8,
        )
    if variant == 4:
        import struct as _st
        import zlib as _zl

        pal = np.stack(
            [(np.arange(16) * 41) % 251, (np.arange(16) * 59) % 251,
             (np.arange(16) * 83) % 251], axis=1,
        ).astype(np.uint8)
        idx = (np.arange(_XC_N, dtype=np.int64) % 16).astype(np.uint8).reshape(32, 48)
        raw = b"".join(b"\x00" + row.tobytes() for row in idx)

        def chunk(tag: bytes, payload: bytes) -> bytes:
            return (
                _st.pack(">I", len(payload)) + tag + payload
                + _st.pack(">I", _zl.crc32(tag + payload))
            )

        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _st.pack(">IIBBBBB", 48, 32, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal.tobytes())
            + chunk(b"IDAT", _zl.compress(raw))
            + chunk(b"IEND", b"")
        )
    import struct as _st

    i = np.arange(_XC_N, dtype=np.int64)
    if variant == 5:
        samples = (((i * 13) % 101 - 50) / 4.0).astype(np.float32)
        payload = samples.tobytes()
        fmt = _st.pack("<HHIIHH", 3, 1, 8000, 8000 * 4, 4, 32)
    else:
        vals = (i * 2003) % 100000 - 50000
        payload = b"".join(int(v).to_bytes(3, "little", signed=True) for v in vals)
        fmt = _st.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = b"WAVE" + b"fmt " + _st.pack("<I", len(fmt)) + fmt
    body += b"data" + _st.pack("<I", len(payload)) + payload
    return b"RIFF" + _st.pack("<I", len(body)) + body


@check(
    "codec_extended_formats",
    oracle=f"""
        WITH i AS (SELECT unnest(range(0, {_XC_N})) AS i)
        SELECT v.variant,
               AVG(CAST((i.i * 37 + v.variant * 11) % 251 AS DOUBLE)) AS mean_val,
               CAST(MIN((i.i * 37 + v.variant * 11) % 251) AS DOUBLE) AS min_val,
               CAST(MAX((i.i * 37 + v.variant * 11) % 251) AS DOUBLE) AS max_val,
               CAST({_XC_N} AS BIGINT) AS n
        FROM (SELECT unnest(range(0, 4)) AS variant) v, i
        GROUP BY v.variant
        UNION ALL
        SELECT 4,
               AVG(CAST((i.i % 16) * 41 % 251 + (i.i % 16) * 59 % 251
                        + (i.i % 16) * 83 % 251 AS DOUBLE)) / 3.0,
               CAST(MIN(LEAST((i.i % 16) * 41 % 251, (i.i % 16) * 59 % 251,
                              (i.i % 16) * 83 % 251)) AS DOUBLE),
               CAST(MAX(GREATEST((i.i % 16) * 41 % 251, (i.i % 16) * 59 % 251,
                                 (i.i % 16) * 83 % 251)) AS DOUBLE),
               CAST({_XC_N} * 3 AS BIGINT)
        FROM i
        UNION ALL
        SELECT 5,
               AVG(CAST((i.i * 13) % 101 - 50 AS DOUBLE) / 4.0),
               CAST(MIN((i.i * 13) % 101 - 50) AS DOUBLE) / 4.0,
               CAST(MAX((i.i * 13) % 101 - 50) AS DOUBLE) / 4.0,
               CAST({_XC_N} AS BIGINT)
        FROM i
        UNION ALL
        SELECT 6,
               AVG(CAST((i.i * 2003) % 100000 - 50000 AS DOUBLE)),
               CAST(MIN((i.i * 2003) % 100000 - 50000) AS DOUBLE),
               CAST(MAX((i.i * 2003) % 100000 - 50000) AS DOUBLE),
               CAST({_XC_N} AS BIGINT)
        FROM i
        ORDER BY variant""",
)
def q_codec_extended_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deflate/LZW TIFF (with and without predictor), palette PNG, and
    float32 / 24-bit WAV decode paths — each variant's real bytes decoded
    distributed and value-checked against its closed form."""
    from pyspark.sql import types as T2

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.multimodal.media import decode_media
        from dronedb_spark.sources.tiff import decode_tiff

        cols = ["variant", "mean_val", "min_val", "max_val", "n"]
        for pdf in it:
            rows = []
            for v in pdf["id"]:
                v = int(v)
                data = _xc_media(v)
                if v <= 3:
                    arr = decode_tiff(data)[0].astype(np.float64)
                else:
                    arr = decode_media(data).astype(np.float64)
                rows.append(
                    {
                        "variant": v,
                        "mean_val": float(arr.mean()),
                        "min_val": float(arr.min()),
                        "max_val": float(arr.max()),
                        "n": int(arr.size),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    schema = T2.StructType(
        [
            T2.StructField("variant", T2.LongType()),
            T2.StructField("mean_val", T2.DoubleType()),
            T2.StructField("min_val", T2.DoubleType()),
            T2.StructField("max_val", T2.DoubleType()),
            T2.StructField("n", T2.LongType()),
        ]
    )
    return spread(spark.range(7)).mapInPandas(run, schema=schema).orderBy("variant")


# --------------------------------------------------------- MJPEG AVI ---

_VID_N, _VID_F, _VID_BY, _VID_BX = 6, 9, 3, 4


def _vid_dc(i: int, t: int) -> np.ndarray:
    """DC-block values for frame t of clip i — pixel decodes to exactly
    128 + 2*dc (see encode_jpeg_dc_blocks)."""
    r = np.arange(_VID_BY, dtype=np.int64)[:, None]
    c = np.arange(_VID_BX, dtype=np.int64)[None, :]
    return (i * 7 + t * 11 + r * 5 + c * 3) % 120 - 60


@check(
    "video_frame_decode",
    oracle=f"""
        WITH px AS (
            SELECT i.i AS media_id, ct.container, t.t AS frame_idx,
                   CAST(128 + 2 * ((i.i * 7 + t.t * 11 + r.r * 5 + c.c * 3) % 120 - 60)
                        AS DOUBLE) AS v
            FROM (SELECT unnest(range(0, {_VID_N})) AS i) i,
                 (SELECT unnest(['avi', 'mov']) AS container) ct,
                 (SELECT unnest([0, {_VID_F // 2}, {_VID_F - 1}]) AS t) t,
                 (SELECT unnest(range(0, {_VID_BY})) AS r) r,
                 (SELECT unnest(range(0, {_VID_BX})) AS c) c)
        SELECT media_id, container, CAST(frame_idx AS BIGINT) AS frame_idx,
               AVG(v) AS mean_val, MIN(v) AS min_val, MAX(v) AS max_val,
               CAST({_VID_F} AS BIGINT) AS n_frames
        FROM px GROUP BY media_id, container, frame_idx
        ORDER BY media_id, container, frame_idx""",
)
def q_video_frame_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL MJPEG video in BOTH container families the reference's video
    path serves: RIFF AVI ('00dc' chunks, sources/avi.py) and QuickTime
    MOV (Photo-JPEG track with a full stsd/stts/stsc/stsz/stco sample
    table, sources/mov.py) → per-file first/middle/last frame sampling
    WITHOUT decoding the rest (the independent-frame contract; MOV frame
    byte ranges resolve through the real sample table) → per-frame
    stats.  DC-block frames make the lossy codec integer-exact, so the
    oracle reproduces the decoded pixels relationally, and identical
    values across containers pin that the container layer is lossless —
    closes the K9 video gap (thumbs.cpp video path, entry.cpp:1086-1099)."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.avi import encode_avi_mjpeg
        from dronedb_spark.sources.jpeg import encode_jpeg_dc_blocks
        from dronedb_spark.sources.mov import encode_mov_mjpeg

        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                frames = [
                    encode_jpeg_dc_blocks(_vid_dc(i, t), q0=16) for t in range(_VID_F)
                ]
                for container, enc in (("avi", encode_avi_mjpeg), ("mov", encode_mov_mjpeg)):
                    rows.append(
                        {
                            "media_id": i,
                            "container": container,
                            "content": enc(frames, _VID_BX * 8, _VID_BY * 8),
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "container", "content"])

    media = spread(spark.range(_VID_N)).mapInPandas(
        gen,
        schema="media_id long, container string, content binary",
    )

    def stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.avi import avi_info, decode_avi_frames
        from dronedb_spark.sources.mov import decode_mov_frames, mov_info

        sample = [0, _VID_F // 2, _VID_F - 1]
        for pdf in it:
            rows = []
            for mid, container, content in zip(
                pdf["media_id"], pdf["container"], pdf["content"]
            ):
                data = bytes(content)
                if container == "avi":
                    n_frames = avi_info(data)["n_frames"]
                    frames = decode_avi_frames(data, indices=sample).astype(np.float64)
                else:
                    n_frames = mov_info(data)["n_frames"]
                    frames = decode_mov_frames(data, indices=sample).astype(np.float64)
                for t, fr in zip(sample, frames):
                    rows.append(
                        {
                            "media_id": int(mid),
                            "container": container,
                            "frame_idx": t,
                            "mean_val": float(fr.mean()),
                            "min_val": float(fr.min()),
                            "max_val": float(fr.max()),
                            "n_frames": int(n_frames),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "container", "frame_idx",
                         "mean_val", "min_val", "max_val", "n_frames"],
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("container", T.StringType()),
            T.StructField("frame_idx", T.LongType()),
            T.StructField("mean_val", T.DoubleType()),
            T.StructField("min_val", T.DoubleType()),
            T.StructField("max_val", T.DoubleType()),
            T.StructField("n_frames", T.LongType()),
        ]
    )
    return media.mapInPandas(stats, schema=schema).orderBy(
        "media_id", "container", "frame_idx"
    )


# ------------------------------------------------- LAS 1.4 waveform ---

_WF_N, _WF_PTS = 4, 30


@check(
    "pointcloud_waveform_metrics",
    oracle=f"""
        WITH samp AS (
            SELECT i.i AS file_id, j.j AS j, (j.j % 3) + 1 AS wpd_index,
                   CAST((i.i * 37 + j.j * 11 + k.k * 3) % 4096 AS BIGINT) AS s
            FROM (SELECT unnest(range(0, {_WF_N})) AS i) i,
                 (SELECT unnest(range(0, {_WF_PTS})) AS j) j,
                 (SELECT unnest(range(0, 40)) AS k) k
            WHERE k.k < 24 + 8 * (j.j % 3)),
        pts AS (
            SELECT file_id, j, wpd_index,
                   COUNT(*) AS n_samples, SUM(s) AS energy, MAX(s) AS peak
            FROM samp GROUP BY file_id, j, wpd_index)
        SELECT file_id, CAST(wpd_index AS BIGINT) AS wpd_index,
               COUNT(*) AS n_points,
               CAST(SUM(n_samples) AS BIGINT) AS total_samples,
               CAST(SUM(energy) AS BIGINT) AS total_energy,
               CAST(MAX(peak) AS BIGINT) AS max_peak
        FROM pts GROUP BY file_id, wpd_index
        ORDER BY file_id, wpd_index""",
)
def q_waveform_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAS 1.4 PDRF 9 full-waveform files (sources/waveform.py — wave
    packet descriptor VLRs + internal waveform EVLR, the last LAS point
    format family): real bytes encode → decode → per-descriptor waveform
    reductions (packet count, sample count, energy, peak).  The 60 GB-
    tile scale story: waveform payloads reduce to scalars INSIDE the
    per-file task; only the aggregates cross the engine."""

    def gen_and_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from dronedb_spark.sources.waveform import (
            encode_las14_waveform,
            waveform_metrics,
        )

        for pdf in it:
            out = []
            for i in pdf["id"]:
                i = int(i)
                j = np.arange(_WF_PTS, dtype=np.int64)
                waves = [
                    ((i * 37 + jj * 11 + np.arange(24 + 8 * (jj % 3)) * 3) % 4096)
                    .astype(np.uint16)
                    for jj in j
                ]
                blob = encode_las14_waveform(
                    x=j * 0.5, y=j * 0.25, z=(j % 7).astype(float),
                    waveforms=waves,
                    descriptor_index=(j % 3 + 1).astype(np.uint8),
                    gps_time=1000.0 + j,
                )
                m = waveform_metrics(blob)
                pdf2 = pd.DataFrame(
                    {"wpd_index": m["wpd_index"], "n_samples": m["n_samples"],
                     "energy": m["energy"], "peak": m["peak"]}
                )
                g = pdf2.groupby("wpd_index").agg(
                    n_points=("energy", "size"), total_samples=("n_samples", "sum"),
                    total_energy=("energy", "sum"), max_peak=("peak", "max"),
                )
                for wi, r in g.iterrows():
                    out.append(
                        {
                            "file_id": i, "wpd_index": int(wi),
                            "n_points": int(r["n_points"]),
                            "total_samples": int(r["total_samples"]),
                            "total_energy": int(r["total_energy"]),
                            "max_peak": int(r["max_peak"]),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=["file_id", "wpd_index", "n_points", "total_samples",
                         "total_energy", "max_peak"],
            )

    schema = T.StructType(
        [
            T.StructField("file_id", T.LongType()),
            T.StructField("wpd_index", T.LongType()),
            T.StructField("n_points", T.LongType()),
            T.StructField("total_samples", T.LongType()),
            T.StructField("total_energy", T.LongType()),
            T.StructField("max_peak", T.LongType()),
        ]
    )
    return (
        spread(spark.range(_WF_N))
        .mapInPandas(gen_and_stats, schema=schema)
        .orderBy("file_id", "wpd_index")
    )
