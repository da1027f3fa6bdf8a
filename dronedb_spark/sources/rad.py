"""RAD Gaussian-splat LOD container — read + write (reference:
rad.cpp / rad.h, the minimal reader for the public Spark-renderer "RAD"
format produced by build-lod; build.cpp:169 expects ``gsplat/model.rad``
as the GaussianSplat build artifact).

Wire format (rad.cpp:18-270, layouts mirror the public
``spark-lib/src/rad.rs``):

  file   = 'RAD0' | u32 metaLen | meta JSON | pad8 | chunk*
  meta   = {"chunks": [{"offset": rel-to-chunksStart, "bytes": n}, ...]}
  chunk  = 'RADC' | u32 cmetaLen | cmeta JSON | pad8 | u64 payloadBytes
           | payload
  cmeta  = {"count": n, "properties": [{"property", "encoding",
            "offset" (rel to payload), "bytes", "min", "max",
            "compression"}, ...]}

Splats are stored coarse-to-fine, chunked at 65536: the leading chunk(s)
are a low-density view of the whole scene — the direct analog of reading
only the coarse octree levels of a COPC point cloud, and exactly how the
reference renders a preview (thumbs.cpp:1330 reads maxChunks=2).

Property encodings (each a per-dimension PLANE, value (i, dim) of a
``count × dims`` property):

  f32 / f16            plane of little-endian floats: (dim*count + i)*sz
  f32_lebytes /        byte-TRANSPOSED planes: byte k of value (i, dim)
    f16_lebytes          at  count*dim + i + (count*dims)*k
  r8                   u8 plane, v/255*span + min  (float32 arithmetic)
  r8_delta             u8 plane of wrapping deltas along i, then as r8

``compression == "gz"`` is RAW deflate (no zlib/gzip header —
miniz_oxide ``compress_to_vec``), i.e. wbits=-15.

Colours decode to DISPLAY-space RGB in [0, 1] and opacities are
ACTIVATED (not logits) — consumers must not re-apply SH or sigmoid
(rad.h:26-28).  ``build_rad`` converts FROM the canonical splat-table
convention (log scales / logit alpha / SH-DC colors, sources/gsplat.py)
into that display space and orders splats by descending activated
opacity — a deterministic importance order standing in for build-lod's
coarse-to-fine LOD sort.

Spark shape: one ``binaryFile`` row per ``.rad`` → Arrow ``mapInPandas``
decode of only the leading chunks (bounded memory per task, like the
reference's preview path); bounds stream every chunk's center plane
without materializing colours.
"""

from __future__ import annotations

import json
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dronedb_spark.suite import check

_MAGIC = b"RAD0"
_CHUNK_MAGIC = b"RADC"
CHUNK_SPLATS = 65536  # rad.h:19 — the format's standard chunk size


def _pad8(n: int) -> int:
    return (n + 7) & ~7


def _inflate_raw(data: bytes) -> bytes:
    return zlib.decompressobj(-15).decompress(data)


def _deflate_raw(data: bytes) -> bytes:
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


# ------------------------------------------------------------------ decode


def _decode_property(raw: bytes, encoding: str, dims: int, count: int,
                     mn: float, mx: float) -> np.ndarray:
    """→ float64 array (count, dims); arithmetic mirrors rad.cpp:109-196
    (float32 for the quantized paths, IEEE half→single for f16)."""
    need = dims * count
    if encoding == "f32":
        a = np.frombuffer(raw, "<f4", need).reshape(dims, count).T
        return a.astype(np.float64)
    if encoding == "f16":
        a = np.frombuffer(raw, "<f2", need).reshape(dims, count).T
        return a.astype(np.float64)
    if encoding == "f32_lebytes":
        b = np.frombuffer(raw, np.uint8, 4 * need).reshape(4, dims, count)
        planes = np.ascontiguousarray(b.transpose(1, 2, 0))  # (dims, count, 4)
        return planes.view("<f4")[:, :, 0].T.astype(np.float64)
    if encoding == "f16_lebytes":
        b = np.frombuffer(raw, np.uint8, 2 * need).reshape(2, dims, count)
        planes = np.ascontiguousarray(b.transpose(1, 2, 0))
        return planes.view("<f2")[:, :, 0].T.astype(np.float64)
    if encoding in ("r8", "r8_delta"):
        b = np.frombuffer(raw, np.uint8, need).reshape(dims, count)
        if encoding == "r8_delta":
            b = np.cumsum(b, axis=1, dtype=np.uint8)  # wrapping add per dim
        span = np.float32(mx) - np.float32(mn)
        v = (b.astype(np.float32) / np.float32(255.0)) * span + np.float32(mn)
        return v.T.astype(np.float64)
    raise ValueError(f"RAD: unsupported encoding {encoding!r}")


def read_rad_header(data: bytes) -> list[tuple[int, int]]:
    """→ [(absolute chunk offset, chunk bytes)]; rejects external-file
    (.radc) chunk references like the reference reader (rad.cpp:260-270)."""
    if data[:4] != _MAGIC:
        raise ValueError("RAD: bad magic")
    (meta_len,) = struct.unpack_from("<I", data, 4)
    meta = json.loads(data[8 : 8 + meta_len])
    chunks_start = 8 + _pad8(meta_len)
    out = []
    for c in meta["chunks"]:
        if c.get("filename") is not None:
            raise ValueError("RAD: chunked (.radc) files are not supported")
        out.append((chunks_start + int(c.get("offset", 0)), int(c.get("bytes", 0))))
    return out


def _decode_chunk(data: bytes, off: int, nbytes: int, want_color: bool) -> dict:
    buf = data[off : off + nbytes]
    if len(buf) < 16 or buf[:4] != _CHUNK_MAGIC:
        raise ValueError("RAD: bad chunk")
    (cmeta_len,) = struct.unpack_from("<I", buf, 4)
    cmeta = json.loads(buf[8 : 8 + cmeta_len])
    count = int(cmeta.get("count", 0))
    out = {"count": count, "centers": None, "colors": None, "opacities": None}
    if count == 0:
        return out
    payload_start = 8 + _pad8(cmeta_len) + 8  # + u64 payloadBytes field
    for p in cmeta["properties"]:
        name = p.get("property", "")
        is_center, is_rgb, is_alpha = name == "center", name == "rgb", name == "alpha"
        if not is_center and not (want_color and (is_rgb or is_alpha)):
            continue
        dims = 3 if (is_center or is_rgb) else 1
        start = payload_start + int(p.get("offset", 0))
        raw = bytes(buf[start : start + int(p.get("bytes", 0))])
        if p.get("compression") == "gz":
            raw = _inflate_raw(raw)
        vals = _decode_property(
            raw, p.get("encoding", ""), dims, count,
            float(p.get("min", 0.0)), float(p.get("max", 1.0)),
        )
        if is_center:
            out["centers"] = vals
        elif is_rgb:
            out["colors"] = vals
        else:
            out["opacities"] = np.maximum(vals[:, 0], 0.0)  # clamp ≥ 0 (rad.h:34)
    if out["centers"] is None:
        raise ValueError("RAD: chunk missing center data")
    return out


def read_rad_coarse(data: bytes, max_chunks: int = 1) -> dict:
    """Leading-chunk preview decode (readRadCoarseSplats,
    rad.cpp:371-414): centers + display colours; missing colour/alpha
    planes default to mid-grey / full opacity."""
    chunks = read_rad_header(data)
    limit = len(chunks) if max_chunks <= 0 else min(max_chunks, len(chunks))
    pos, col, opa = [], [], []
    for off, nb in chunks[:limit]:
        c = _decode_chunk(data, off, nb, want_color=True)
        if c["count"] == 0:
            continue
        pos.append(c["centers"])
        col.append(c["colors"] if c["colors"] is not None
                   else np.full((c["count"], 3), 0.5))
        opa.append(c["opacities"] if c["opacities"] is not None
                   else np.ones(c["count"]))
    if not pos:
        raise ValueError("RAD: no splats decoded")
    return {
        "count": sum(len(p) for p in pos),
        "positions": np.vstack(pos),
        "colors": np.vstack(col),
        "opacities": np.concatenate(opa),
    }


def rad_bounds(data: bytes) -> tuple[np.ndarray, np.ndarray] | None:
    """Exact AABB of every splat centre, streaming per chunk with only
    the center plane materialized (computeRadBounds, rad.cpp:416-460)."""
    mn = np.full(3, np.inf)
    mx = np.full(3, -np.inf)
    any_ = False
    for off, nb in read_rad_header(data):
        c = _decode_chunk(data, off, nb, want_color=False)
        if c["count"] == 0:
            continue
        mn = np.minimum(mn, c["centers"].min(axis=0))
        mx = np.maximum(mx, c["centers"].max(axis=0))
        any_ = True
    return (mn, mx) if any_ else None


# ------------------------------------------------------------------ encode


def _encode_property(vals: np.ndarray, encoding: str) -> tuple[bytes, float, float]:
    """(count, dims) float array → (plane bytes, min, max)."""
    count, dims = vals.shape
    planes = vals.T  # (dims, count)
    if encoding == "f32":
        return np.ascontiguousarray(planes, "<f4").tobytes(), 0.0, 1.0
    if encoding == "f16":
        return np.ascontiguousarray(planes, "<f2").tobytes(), 0.0, 1.0
    if encoding == "f32_lebytes":
        b = np.ascontiguousarray(planes, "<f4").view(np.uint8).reshape(dims, count, 4)
        return np.ascontiguousarray(b.transpose(2, 0, 1)).tobytes(), 0.0, 1.0
    if encoding == "f16_lebytes":
        b = np.ascontiguousarray(planes, "<f2").view(np.uint8).reshape(dims, count, 2)
        return np.ascontiguousarray(b.transpose(2, 0, 1)).tobytes(), 0.0, 1.0
    if encoding in ("r8", "r8_delta"):
        mn, mx = float(vals.min()), float(vals.max())
        if mx <= mn:
            mx = mn + 1.0
        span = np.float32(mx) - np.float32(mn)
        q = np.clip(
            np.round((planes.astype(np.float32) - np.float32(mn)) / span * 255.0),
            0, 255,
        ).astype(np.uint8)
        if encoding == "r8_delta":
            q = np.concatenate([q[:, :1], np.diff(q.astype(np.int16), axis=1)
                                .astype(np.uint8)], axis=1)
        return q.tobytes(), mn, mx
    raise ValueError(f"RAD: unsupported encoding {encoding!r}")


def encode_rad(chunks: list[dict]) -> bytes:
    """chunks: [{"center": (n,3) array, "rgb": (n,3)|None,
    "alpha": (n,)|None, "encodings": {prop: enc}, "gz": {prop...}}] →
    single-file RAD bytes (the reference reader's supported layout)."""
    chunk_blobs = []
    for ch in chunks:
        enc = ch.get("encodings", {})
        gz = set(ch.get("gz", ()))
        n = len(ch["center"])
        props, payload = [], bytearray()
        items = [("center", np.asarray(ch["center"], np.float64))]
        if ch.get("rgb") is not None:
            items.append(("rgb", np.asarray(ch["rgb"], np.float64)))
        if ch.get("alpha") is not None:
            items.append(("alpha", np.asarray(ch["alpha"], np.float64).reshape(n, 1)))
        for name, vals in items:
            e = enc.get(name, "f32")
            raw, mn, mx = _encode_property(vals, e)
            comp = name in gz
            if comp:
                raw = _deflate_raw(raw)
            off = len(payload)
            payload += raw
            payload += b"\x00" * (_pad8(len(payload)) - len(payload))
            p = {"property": name, "encoding": e, "offset": off, "bytes": len(raw),
                 "min": mn, "max": mx}
            if comp:
                p["compression"] = "gz"
            props.append(p)
        cmeta = json.dumps({"count": n, "properties": props}).encode()
        blob = bytearray(_CHUNK_MAGIC)
        blob += struct.pack("<I", len(cmeta))
        blob += cmeta
        blob += b"\x00" * (_pad8(len(cmeta)) - len(cmeta))
        blob += struct.pack("<Q", len(payload))
        blob += payload
        chunk_blobs.append(bytes(blob))

    refs, off = [], 0
    for blob in chunk_blobs:
        refs.append({"offset": off, "bytes": len(blob)})
        off += _pad8(len(blob))
    meta = json.dumps({"chunks": refs}).encode()
    out = bytearray(_MAGIC)
    out += struct.pack("<I", len(meta))
    out += meta
    out += b"\x00" * (_pad8(len(meta)) - len(meta))
    for blob in chunk_blobs:
        out += blob
        out += b"\x00" * (_pad8(len(blob)) - len(blob))
    return bytes(out)


SH_C0 = 0.28209479177387814


def build_rad(recs: list[dict]) -> bytes:
    """Canonical splat-table rows (sources/gsplat.py convention: SH-DC
    colors, logit alpha) → display-space RAD, splats ordered by
    DESCENDING activated opacity (then idx — deterministic), chunked at
    CHUNK_SPLATS.  The build-pipeline analog of build-lod's
    ``gsplat/model.rad`` output (build.cpp:169, 320)."""
    order = sorted(
        recs,
        key=lambda r: (-1.0 / (1.0 + np.exp(-r["alpha"])), r["idx"]),
    )
    centers = np.array([[r["x"], r["y"], r["z"]] for r in order])
    rgb = np.clip(
        np.array([[r["dc_r"], r["dc_g"], r["dc_b"]] for r in order]) * SH_C0 + 0.5,
        0.0, 1.0,
    )
    alpha = 1.0 / (1.0 + np.exp(-np.array([r["alpha"] for r in order])))
    chunks = []
    for s in range(0, len(order), CHUNK_SPLATS):
        e = s + CHUNK_SPLATS
        chunks.append({
            "center": centers[s:e], "rgb": rgb[s:e], "alpha": alpha[s:e],
            "encodings": {"center": "f32_lebytes", "rgb": "r8", "alpha": "r8"},
            "gz": {"center"},
        })
    return encode_rad(chunks)


# ------------------------------------------------------------------ spark

RAD_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("idx", T.IntegerType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("z", T.DoubleType()),
        T.StructField("r", T.DoubleType()),
        T.StructField("g", T.DoubleType()),
        T.StructField("b", T.DoubleType()),
        T.StructField("a", T.DoubleType()),
    ]
)


def rad_coarse_table(files: DataFrame, max_chunks: int = 1) -> DataFrame:
    """(src, content) → one row per coarse splat.  Only the leading
    chunks are decoded per file — constant work per task no matter how
    deep the LOD pyramid is; decode errors log-and-skip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import logging

        cols = [f.name for f in RAD_SCHEMA.fields]
        for pdf in batches:
            frames = []
            for src, content in zip(pdf["src"], pdf["content"]):
                try:
                    d = read_rad_coarse(bytes(content), max_chunks)
                except Exception as ex:
                    logging.getLogger(__name__).warning(
                        "rad_coarse_table: skipping %s: %s", src, ex
                    )
                    continue
                n = d["count"]
                frames.append(pd.DataFrame({
                    "src": src, "idx": np.arange(n, dtype=np.int32),
                    "x": d["positions"][:, 0], "y": d["positions"][:, 1],
                    "z": d["positions"][:, 2],
                    "r": d["colors"][:, 0], "g": d["colors"][:, 1],
                    "b": d["colors"][:, 2], "a": d["opacities"],
                }))
            yield (pd.concat(frames) if frames
                   else pd.DataFrame(columns=cols))

    return files.mapInPandas(run, schema=RAD_SCHEMA)


def read_rad_files(spark: SparkSession, root: str, max_chunks: int = 1) -> DataFrame:
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.rad")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(
            F.regexp_extract("path", r"([^/]+)\.[^./]+$", 1).alias("src"), "content"
        )
    )
    return rad_coarse_table(files, max_chunks)


# ------------------------------------------------------------------ check

_RAD_N0, _RAD_N1, _RAD_N2 = 7, 5, 4


def _rad_chunk_specs() -> list[dict]:
    """Three chunks exercising every decode path: gz'd byte-transposed
    f32 centers + r8 rgb + r8_delta alpha; f16 centers on the exact
    half grid with colour planes absent (defaults); plain f32 centers
    in the fine tail (outside the maxChunks=2 preview, inside bounds)."""
    c0 = np.array([[i * 0.25 - 0.75, i * 1.5, 3.0 - i] for i in range(_RAD_N0)])
    rgb0 = np.array([[(i % 4) / 3.0, (i % 3) / 2.0, (i % 5) / 4.0]
                     for i in range(_RAD_N0)])
    a0 = np.array([(i % 6) / 5.0 for i in range(_RAD_N0)])
    c1 = np.array([[4.0 + i / 256.0, -2.0 - i / 128.0, i / 64.0]
                   for i in range(_RAD_N1)])  # exact in binary16
    c2 = np.array([[-10.0 + i, 20.0 - i, 5.0 + i * 0.5] for i in range(_RAD_N2)])
    return [
        {"center": c0, "rgb": rgb0, "alpha": a0,
         "encodings": {"center": "f32_lebytes", "rgb": "r8", "alpha": "r8_delta"},
         "gz": {"center", "alpha"}},
        {"center": c1, "rgb": None, "alpha": None,
         "encodings": {"center": "f16"}},
        {"center": c2, "rgb": None, "alpha": None,
         "encodings": {"center": "f32"}},
    ]


def _rad_fixture_root() -> str:
    import os

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "rad_v1")
    )
    os.makedirs(root, exist_ok=True)
    payload = encode_rad(_rad_chunk_specs())
    p = os.path.join(root, "model.rad")
    if not os.path.exists(p) or open(p, "rb").read() != payload:
        with open(p, "wb") as f:
            f.write(payload)
    os.utime(p, (1700000000, 1700000000))
    return root


def _rad_expected() -> list[tuple]:
    """Literal mirror: encode→decode the first two chunks with the same
    numpy arithmetic the kernel uses."""
    specs = _rad_chunk_specs()
    rows, idx = [], 0
    for ch in specs[:2]:
        n = len(ch["center"])
        dec = {}
        for name in ("center", "rgb", "alpha"):
            vals = ch.get(name)
            if vals is None:
                continue
            vals = np.asarray(vals, np.float64)
            if name == "alpha":
                vals = vals.reshape(n, 1)
            e = ch["encodings"][name]
            raw, mn, mx = _encode_property(vals, e)
            dec[name] = _decode_property(raw, e, vals.shape[1], n, mn, mx)
        col = dec.get("rgb", np.full((n, 3), 0.5))
        opa = (np.maximum(dec["alpha"][:, 0], 0.0)
               if "alpha" in dec else np.ones(n))
        for i in range(n):
            rows.append((
                "model", idx,
                float(dec["center"][i, 0]), float(dec["center"][i, 1]),
                float(dec["center"][i, 2]),
                float(col[i, 0]), float(col[i, 1]), float(col[i, 2]),
                float(opa[i]),
            ))
            idx += 1
    return rows


def _rad_oracle() -> str:
    rows = ",\n            ".join(
        "(" + ", ".join(
            f"'{v}'" if isinstance(v, str)
            else repr(round(v, 9)) if isinstance(v, float) else str(v)
            for v in row
        ) + ")"
        for row in _rad_expected()
    )
    return f"""
        SELECT src, CAST(idx AS INT) AS idx, x, y, z, r, g, b, a
        FROM (VALUES
            {rows}) AS t(src, idx, x, y, z, r, g, b, a)
        ORDER BY idx"""


@check("rad_coarse_splats", oracle=_rad_oracle())
def q_rad_coarse_splats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL RAD container preview decode (readRadCoarseSplats with
    maxChunks=2, the thumbs.cpp:1330 path): raw-deflate inflate,
    byte-transposed f32 planes, IEEE-half planes, r8 quantized colour,
    r8_delta wrapping-sum alpha, and the mid-grey/full-opacity defaults
    for chunks without colour — the fine third chunk stays undecoded."""
    df = read_rad_files(spark, _rad_fixture_root(), max_chunks=2)
    rounded = [F.round(c, 9).alias(c) for c in ["x", "y", "z", "r", "g", "b", "a"]]
    return df.select("src", "idx", *rounded).orderBy("idx")
