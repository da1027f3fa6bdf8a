"""OGC 3D Tiles support: .3tz archives, tileset.json, and .pnts point
tiles (reference tiles3d.cpp reads tileset metadata out of .3tz zips;
build.cpp:324-340 extracts the archive as the 3dtiles build artifact).

All formats are public specs: 3TZ is a ZIP with ``tileset.json`` at the
root (OGC 3D Tiles 1.1 archive convention); the Point Cloud tile format
is the published ``pnts`` layout (28-byte header + feature table JSON +
binary body of float32 XYZ triples, optional RGB bytes).

Scale shape: a .3tz is ONE binary cell; extraction is per-file local
work on the executor that owns it (the build pipeline's
one-file-per-task contract), and tileset metadata parse touches only
the central directory + one member, never the full archive payload.
"""

from __future__ import annotations

import io
import json
import math
import os
import struct
import zipfile

import numpy as np


def build_tileset(
    region: tuple[float, float, float, float, float, float],
    geometric_error: float,
    content_uri: str = "points.pnts",
) -> dict:
    """Minimal valid tileset document with the fields the reference's
    reader extracts (tiles3d.cpp:159-283): asset.version, root
    geometricError, root boundingVolume.region [w,s,e,n,minH,maxH] in
    WGS84 radians."""
    return {
        "asset": {"version": "1.0"},
        "geometricError": geometric_error,
        "root": {
            "boundingVolume": {"region": list(region)},
            "geometricError": geometric_error / 2.0,
            "refine": "ADD",
            "content": {"uri": content_uri},
        },
    }


def load_tileset(data: bytes) -> dict:
    """tileset document from raw JSON bytes or a .3tz archive — the ONE
    shared loader (splat.py's probe delegates here).  Full archives go
    through zipfile; stream PREFIXES (no central directory inside the
    ingest parser's header window) fall back to walking zip LOCAL file
    headers, which the 3D Tiles archive spec supports by putting
    tileset.json first."""
    if data[:2] != b"PK":
        return json.loads(data)
    doc = None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as z:
            names = [n for n in z.namelist() if n.lower().endswith("tileset.json")]
            if not names:
                raise ValueError("3tz without tileset.json")
            doc = json.loads(z.read(sorted(names, key=len)[0]))
    except (zipfile.BadZipFile, ValueError):
        doc = _stream_tileset(data)
    if doc is None:
        raise ValueError("3tz without tileset.json")
    return doc


def _stream_tileset(data: bytes) -> dict | None:
    """Walk zip LOCAL file headers from the stream start (PK\\x03\\x04
    magic, name/extra lengths, stored or deflate payload) until
    tileset.json is found within the available prefix."""
    import zlib

    pos = 0
    while pos + 30 <= len(data) and data[pos : pos + 4] == b"PK\x03\x04":
        (method,) = struct.unpack_from("<H", data, pos + 8)
        (csize,) = struct.unpack_from("<I", data, pos + 18)
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


def tiles3d_info(data: bytes) -> dict:
    """{asset_version, geometric_error, region_deg} from a tileset.json
    byte blob or a .3tz archive — the same fields tiles3d.cpp extracts
    for the entry footprint (region radians → degrees)."""
    doc = load_tileset(data)
    root = doc.get("root") or {}
    bv = (root.get("boundingVolume") or {}).get("region")
    region_deg = None
    if bv and len(bv) >= 6:
        region_deg = [math.degrees(v) for v in bv[:4]] + list(bv[4:6])
    return {
        "asset_version": (doc.get("asset") or {}).get("version"),
        "geometric_error": root.get("geometricError"),
        "region_deg": region_deg,
    }


def encode_3tz(tileset: dict, members: dict[str, bytes] | None = None) -> bytes:
    """ZIP archive with tileset.json at the root (3TZ convention);
    STORED members keep the fixture deterministic."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", compression=zipfile.ZIP_STORED) as z:
        info = zipfile.ZipInfo("tileset.json", date_time=(2024, 1, 1, 0, 0, 0))
        z.writestr(info, json.dumps(tileset, sort_keys=True))
        for name, blob in (members or {}).items():
            info = zipfile.ZipInfo(name, date_time=(2024, 1, 1, 0, 0, 0))
            z.writestr(info, blob)
    return buf.getvalue()


def extract_3tz(data: bytes, target_dir: str) -> list[str]:
    """build.cpp:324-340 parity: extract the archive into the artifact
    dir, hardened against Zip-Slip (absolute paths / ``..`` traversal
    raise).  Returns the extracted member names."""
    out = []
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        for m in z.infolist():
            name = m.filename
            if name.startswith(("/", "\\")) or ".." in name.replace("\\", "/").split("/"):
                raise ValueError(f"unsafe archive member path: {name!r}")
            dest = os.path.join(target_dir, name)
            if m.is_dir():
                os.makedirs(dest, exist_ok=True)
                continue
            os.makedirs(os.path.dirname(dest) or target_dir, exist_ok=True)
            with open(dest, "wb") as f:
                f.write(z.read(m))
            out.append(name)
    return out


# ------------------------------------------------------------- pnts ---

_PNTS_VERSION = 1


def encode_pnts(positions: np.ndarray, rgb: np.ndarray | None = None) -> bytes:
    """3D Tiles Point Cloud tile: 28-byte header, feature table JSON
    (8-byte aligned), float32 POSITION triples [+ u8 RGB]."""
    pos = np.ascontiguousarray(positions, dtype=np.float32)
    n = pos.shape[0]
    ft: dict = {"POINTS_LENGTH": n, "POSITION": {"byteOffset": 0}}
    body = pos.tobytes()
    if rgb is not None:
        ft["RGB"] = {"byteOffset": len(body)}
        body += np.ascontiguousarray(rgb, dtype=np.uint8).tobytes()
    ft_json = json.dumps(ft, sort_keys=True).encode()
    ft_json += b" " * ((8 - (28 + len(ft_json)) % 8) % 8)  # 8-byte alignment
    total = 28 + len(ft_json) + len(body)
    header = b"pnts" + struct.pack(
        "<IIIIII", _PNTS_VERSION, total, len(ft_json), len(body), 0, 0
    )
    return header + ft_json + body


def decode_pnts(data: bytes) -> dict:
    if data[:4] != b"pnts":
        raise ValueError("not a pnts tile")
    version, total, ftj_len, ftb_len, btj_len, btb_len = struct.unpack_from("<IIIIII", data, 4)
    if version != _PNTS_VERSION or total != len(data):
        raise ValueError("corrupt pnts header")
    ft = json.loads(data[28 : 28 + ftj_len])
    n = ft["POINTS_LENGTH"]
    body = 28 + ftj_len
    out: dict = {"n_points": n}
    off = body + ft["POSITION"]["byteOffset"]
    out["positions"] = np.frombuffer(data, dtype="<f4", count=n * 3, offset=off).reshape(n, 3)
    if "RGB" in ft:
        off = body + ft["RGB"]["byteOffset"]
        out["rgb"] = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=off).reshape(n, 3)
    return out
