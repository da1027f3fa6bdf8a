"""Minimal ISO BMFF (MP4/MOV) container parser — public ISO/IEC 14496-12
box layout.  Extracts the video metadata the reference pulls via
ffmpeg/GDAL when classifying video entries (entry.cpp:1086-1099):
duration (mvhd timescale/duration), track dimensions (tkhd 16.16 fixed
point), and track count.  Frame DECODE stays out of scope (no codec
libraries in this environment); this closes the metadata half of the
video seam so .mp4/.mov files classify with real properties.

A writer for the same subset builds deterministic fixtures.
"""

from __future__ import annotations

import struct


def _iter_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            header = 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < header or pos + size > end:
            break
        yield btype, pos + header, pos + size
        pos += size


def mp4_info(data: bytes) -> dict:
    """{duration_s, timescale, n_tracks, width, height, brand} from the
    moov box.  Width/height come from the first video track (tkhd with
    nonzero dimensions)."""
    boxes = dict()
    brand = None
    out: dict = {"duration_s": None, "timescale": None, "n_tracks": 0,
                 "width": None, "height": None, "brand": None}
    found_moov = False
    for btype, body, bend in _iter_boxes(data, 0, len(data)):
        if btype == b"ftyp":
            out["brand"] = data[body : body + 4].decode("ascii", errors="replace")
        elif btype == b"moov":
            found_moov = True
            for mtype, mbody, mend in _iter_boxes(data, body, bend):
                if mtype == b"mvhd":
                    ver = data[mbody]
                    if ver == 1:
                        timescale, duration = struct.unpack_from(">IQ", data, mbody + 20)
                    else:
                        timescale, duration = struct.unpack_from(">II", data, mbody + 12)
                    out["timescale"] = timescale
                    out["duration_s"] = duration / timescale if timescale else None
                elif mtype == b"trak":
                    out["n_tracks"] += 1
                    for ttype, tbody, tend in _iter_boxes(data, mbody, mend):
                        if ttype == b"tkhd":
                            ver = data[tbody]
                            # width/height are the LAST 8 bytes, 16.16 fixed
                            w_fix, h_fix = struct.unpack_from(">II", data, tend - 8)
                            if w_fix and h_fix and out["width"] is None:
                                out["width"] = w_fix >> 16
                                out["height"] = h_fix >> 16
    if not found_moov:
        raise ValueError("no moov box (not an MP4/MOV?)")
    return out


def encode_mp4_stub(
    duration_s: float, width: int, height: int, timescale: int = 1000,
    n_audio_tracks: int = 0,
) -> bytes:
    """Deterministic metadata-only MP4: ftyp + moov(mvhd + video trak +
    optional audio traks).  No mdat — fixtures exercise the box walk,
    fixed-point parse, and version-0 mvhd fields."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    duration = int(round(duration_s * timescale))
    mvhd = box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">IH2x8x", 0x00010000, 0x0100)  # rate, volume
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # predefined
        + struct.pack(">I", 2 + n_audio_tracks),  # next track id
    )

    def tkhd(track_id: int, w: int, h: int) -> bytes:
        return box(
            b"tkhd",
            struct.pack(">B3xIIIII4x", 0, 0, 0, track_id, 0, duration)
            + b"\x00" * 4  # reserved tail of duration area
            + struct.pack(">hhhh", 0, 0, 0, 0)  # layer, group, volume, pad
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )

    traks = box(b"trak", tkhd(1, width, height))
    for a in range(n_audio_tracks):
        traks += box(b"trak", tkhd(2 + a, 0, 0))
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + moov


# ----------------------------------------------------------- video XMP

# ISO BMFF XMP container uuid (public Adobe XMP-in-MP4 convention)
_XMP_UUID = bytes.fromhex("be7acfcb97a942e89c71999491e3afac")

# seconds between Jan 1st 1904 (Mac/QuickTime epoch) and Jan 1st 1970
_MAC_TO_UNIX_EPOCH = 2082844800


def parse_gps_coordinates(gps: str) -> tuple[float, float, float | None] | None:
    """Xmp.video.GPSCoordinates '+46.839139-91.999828+25.700' →
    (lat, lon, alt) — the reference's character scanner bug-for-bug
    (exif.cpp:326-392): digits/','/'.' accumulate, '+'/'-' delimit,
    at least 2 components required, extras ignored."""
    if not gps or gps[0] not in "+-":
        return None
    vals: list[float] = []
    buf = gps[0]
    s = gps + "$"
    for ch in s[1:]:
        if ch.isdigit() or ch in ",.":
            buf += ch
        elif ch in "+-$":
            try:
                vals.append(float(buf))
            except ValueError:
                return None
            buf = ch
    if len(vals) < 2:
        return None
    return (vals[0], vals[1], vals[2] if len(vals) > 2 else None)


def video_xmp(data: bytes) -> dict:
    """XMP-derived video metadata from the uuid box (top level or inside
    moov): GPS point (GeoVideo upgrade), Mac-epoch capture time
    (extractCaptureTime priority 0, exif.cpp:514-537), XMP dimensions."""
    from dronedb_spark.sources.xmp import parse_xmp

    def find_xmp(start: int, end: int, depth: int = 0):
        for btype, body, bend in _iter_boxes(data, start, end):
            if btype == b"uuid" and data[body : body + 16] == _XMP_UUID:
                return data[body + 16 : bend].decode("utf-8", errors="replace")
            if btype == b"moov" and depth == 0:
                inner = find_xmp(body, bend, 1)
                if inner:
                    return inner
        return None

    text = find_xmp(0, len(data))
    if not text:
        return {}
    xd = parse_xmp(text)
    out: dict = {}
    gps = parse_gps_coordinates(xd.get("video:GPSCoordinates", ""))
    if gps:
        out["point_lat"], out["point_lon"] = gps[0], gps[1]
        if gps[2] is not None:
            out["point_alt"] = gps[2]
    date = xd.get("video:DateUTC") or xd.get("video:MediaCreateDate")
    if date:
        try:
            ms = (int(float(date)) - _MAC_TO_UNIX_EPOCH) * 1000
            if ms > 0:
                out["captureTime"] = ms
        except ValueError:
            pass
    for k, prop in (("video:Width", "width"), ("video:Height", "height")):
        v = xd.get(k)
        if v and v.isdigit():
            out.setdefault(prop, int(v))
    return out


def encode_xmp_uuid_box(attrs: dict[str, str]) -> bytes:
    """Fixture builder: a real XMP uuid box for the given video attrs."""
    from dronedb_spark.sources.xmp import NS_PREFIXES, _RDF_NS

    uri_of = {v: k for k, v in NS_PREFIXES.items()}
    used = sorted({k.split(":", 1)[0] for k in attrs})
    decls = " ".join(f'xmlns:{p}="{uri_of[p]}"' for p in used)
    fields = " ".join(f'{k}="{v}"' for k, v in sorted(attrs.items()))
    xml = (
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">'
        f'<rdf:RDF xmlns:rdf="{_RDF_NS}">'
        f"<rdf:Description rdf:about='' {decls} {fields}/>"
        "</rdf:RDF></x:xmpmeta>"
    ).encode("utf-8")
    payload = _XMP_UUID + xml
    return struct.pack(">I", 8 + len(payload)) + b"uuid" + payload
