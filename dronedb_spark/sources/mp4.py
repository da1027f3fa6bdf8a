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
