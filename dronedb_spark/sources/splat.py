"""Gaussian-splat (.spz) and 3D-Tiles archive (.3tz) content probes.

Public formats: SPZ is Niantic's open splat container — a gzip stream
whose first 16 bytes are (magic 0x5053474E, version, numPoints u32,
shDegree u8, fractionalBits u8, flags u8, reserved u8) followed by the
packed gaussians; a .3tz is an OGC 3D Tiles archive: a zip whose
``tileset.json`` carries asset version + geometricError.  Both probe
with stdlib gzip/zipfile — no native libraries.

Reference parity: entry.cpp:463-475 (spz header → splat count / SH
degree) and entry.cpp:711-751 (3tz → tileset metadata); the r2 build
classified these by extension only.
"""

from __future__ import annotations

import gzip
import io
import json
import struct
import zipfile

_SPZ_MAGIC = 0x5053474E


def encode_spz(
    num_points: int, sh_degree: int = 0, fractional_bits: int = 12, flags: int = 0
) -> bytes:
    """Minimal valid .spz: header + zeroed packed payload, gzipped.
    Payload sizing follows the spec: 9 bytes/position+alpha+color is not
    modeled precisely — probes read only the header, so a deterministic
    stub payload of 4 bytes/point keeps fixtures small."""
    header = struct.pack(
        "<IIIBBBB", _SPZ_MAGIC, 2, num_points, sh_degree, fractional_bits, flags, 0
    )
    gz = io.BytesIO()
    # fixed mtime + no filename → byte-deterministic fixture output
    with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as f:
        f.write(header + bytes(4 * num_points))
    return gz.getvalue()


def spz_info(data: bytes) -> dict:
    """{numPoints, shDegree, version} from the gzipped header.  Works on
    a stream PREFIX (the ingest parser sees only the first 4 KiB): a raw
    inflate object decompresses whatever is available and the 16 header
    bytes sit at the very front of the stream."""
    import zlib

    if data[:2] != b"\x1f\x8b":
        raise ValueError("not gzip (not .spz)")
    head = zlib.decompressobj(wbits=31).decompress(data, 16)
    if len(head) < 16:
        raise ValueError("spz header truncated")
    magic, version, n, sh, frac, flags, _res = struct.unpack("<IIIBBBB", head)
    if magic != _SPZ_MAGIC:
        raise ValueError(f"bad spz magic {magic:#x}")
    return {
        "version": version,
        "numPoints": n,
        "shDegree": sh,
        "fractionalBits": frac,
        "antialiased": bool(flags & 1),
    }


def encode_3tz(geometric_error: float, n_children: int, version: str = "1.1") -> bytes:
    """Minimal OGC 3D Tiles archive: zip with a tileset.json."""
    tileset = {
        "asset": {"version": version},
        "geometricError": geometric_error,
        "root": {
            "boundingVolume": {"box": [0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1]},
            "geometricError": geometric_error / 2.0,
            "children": [
                {
                    "boundingVolume": {"box": [i, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0, 1]},
                    "geometricError": 0.0,
                    "content": {"uri": f"tile_{i}.b3dm"},
                }
                for i in range(n_children)
            ],
        },
    }
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        info = zipfile.ZipInfo("tileset.json", date_time=(2024, 1, 1, 0, 0, 0))
        zf.writestr(info, json.dumps(tileset, sort_keys=True))
    return buf.getvalue()


def tz3_info(data: bytes) -> dict:
    """{tilesetVersion, geometricError, nChildren} from tileset.json.
    Full archives go through zipfile; stream PREFIXES (no central
    directory in the ingest parser's 4 KiB window) fall back to walking
    local file headers — the 3D Tiles archive spec puts tileset.json
    first precisely to allow this streaming read."""
    if data[:2] != b"PK":
        raise ValueError("not a zip (not .3tz)")
    doc = None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = [n for n in zf.namelist() if n.lower().endswith("tileset.json")]
            if not names:
                raise ValueError("3tz without tileset.json")
            doc = json.loads(zf.read(sorted(names, key=len)[0]))
    except (zipfile.BadZipFile, ValueError):
        doc = _tz3_stream_tileset(data)
    if doc is None:
        raise ValueError("3tz without tileset.json")
    return {
        "tilesetVersion": doc.get("asset", {}).get("version"),
        "geometricError": doc.get("geometricError"),
        "nChildren": len(doc.get("root", {}).get("children", [])),
    }


def _tz3_stream_tileset(data: bytes) -> dict | None:
    """Walk zip LOCAL file headers from the stream start (PK\\x03\\x04
    magic, name/extra lengths, stored or deflate payload) until
    tileset.json is found within the available prefix."""
    import zlib

    pos = 0
    while pos + 30 <= len(data) and data[pos : pos + 4] == b"PK\x03\x04":
        method, = struct.unpack_from("<H", data, pos + 8)
        csize, = struct.unpack_from("<I", data, pos + 18)
        nlen, elen = struct.unpack_from("<HH", data, pos + 26)
        name = data[pos + 30 : pos + 30 + nlen].decode("utf-8", errors="replace")
        body_start = pos + 30 + nlen + elen
        body = data[body_start : body_start + csize]
        if name.lower().endswith("tileset.json"):
            if method == 8:
                body = zlib.decompressobj(wbits=-15).decompress(body)
            return json.loads(body)
        pos = body_start + csize
    return None
