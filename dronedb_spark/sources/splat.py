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
import struct

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
    """Minimal OGC 3D Tiles archive for probe fixtures: a box-volume
    tileset with n_children b3dm stubs, zipped via the shared writer in
    sources/tiles3d.py."""
    from dronedb_spark.sources.tiles3d import encode_3tz as _zip_tileset

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
    return _zip_tileset(tileset)


def tz3_info(data: bytes) -> dict:
    """{tilesetVersion, geometricError, nChildren} from tileset.json —
    full archives AND stream prefixes, via the shared loader in
    sources/tiles3d.py (the probe's key contract is kept for the ingest
    parser)."""
    if data[:2] != b"PK":
        raise ValueError("not a zip (not .3tz)")
    from dronedb_spark.sources.tiles3d import load_tileset

    doc = load_tileset(data)
    return {
        "tilesetVersion": doc.get("asset", {}).get("version"),
        "geometricError": doc.get("geometricError"),
        "nChildren": len(doc.get("root", {}).get("children", [])),
    }


