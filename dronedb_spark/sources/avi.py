"""MJPEG-in-AVI container — real video frame decode, pure Python.

Closes the K9 video seam left open in r3 (multimodal/media.py raised for
every real video codec): Motion JPEG stores each frame as a complete
baseline JPEG, so the existing sources/jpeg.py decoder does the codec
work and this module only parses the public RIFF AVI layout (avih/strh/
strf headers, 'movi' LIST of '00dc' frame chunks, idx1 index).

Reference parity: entry.cpp:1086-1099 classifies videos and thumbs.cpp
grabs a frame via ffmpeg; MJPEG is the one mainstream video format whose
frames are decodable without codec libraries.  H.264/HEVC remain the
documented ffmpeg swap-in (decode_media docstring).

Writer + reader pair: fixtures use DC-block JPEG frames
(sources/jpeg.py encode_jpeg_dc_blocks) so the lossy codec is
integer-exact and the driver oracle can reproduce decoded pixels
relationally.
"""

from __future__ import annotations

import struct

import numpy as np


def _chunk(ckid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return ckid + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """RIFF AVI with one '00dc' chunk per JPEG frame + idx1 index."""
    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        0, 0,
        0x10,  # AVIF_HASINDEX
        n, 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII4H", 0, 0, 0, 0, 1, fps, 0, n, 0, 10000, 0, 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b""
    idx_entries = []
    for f in frames:
        # idx1 offsets are relative to the 'movi' fourcc position
        idx_entries.append((4 + len(movi_payload), len(f)))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, size) for off, size in idx_entries
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _iter_riff(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        ckid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        yield ckid, pos + 8, pos + 8 + size
        pos += 8 + size + (size % 2)


def avi_info(data: bytes) -> dict:
    """{width, height, n_frames, fps, handler} from the avih/strh headers."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI file")
    out = {"width": None, "height": None, "n_frames": None, "fps": None, "handler": None}
    for ckid, body, bend in _iter_riff(data, 12, len(data)):
        if ckid == b"LIST" and data[body : body + 4] == b"hdrl":
            for hid, hbody, hend in _iter_riff(data, body + 4, bend):
                if hid == b"avih":
                    v = struct.unpack_from("<14I", data, hbody)
                    out["n_frames"] = v[4]
                    out["width"], out["height"] = v[8], v[9]
                    if v[0]:
                        out["fps"] = round(1_000_000 / v[0])
                elif hid == b"LIST" and data[hbody : hbody + 4] == b"strl":
                    for sid, sbody, _send in _iter_riff(data, hbody + 4, hend):
                        if sid == b"strh" and data[sbody : sbody + 4] == b"vids":
                            out["handler"] = data[sbody + 4 : sbody + 8].decode(
                                "ascii", errors="replace"
                            )
    return out


def _video_stream_no(data: bytes) -> int:
    """Index of the first 'vids' stream among the strl headers — AVI
    frame chunks are named '<NN>dc' by STREAM ORDER, so a file whose
    audio strl precedes the video one carries its frames as '01dc'."""
    idx = 0
    for ckid, body, bend in _iter_riff(data, 12, len(data)):
        if ckid == b"LIST" and data[body : body + 4] == b"hdrl":
            for hid, hbody, hend in _iter_riff(data, body + 4, bend):
                if hid == b"LIST" and data[hbody : hbody + 4] == b"strl":
                    for sid, sbody, _send in _iter_riff(data, hbody + 4, hend):
                        if sid == b"strh":
                            if data[sbody : sbody + 4] == b"vids":
                                return idx
                            idx += 1
    return 0


def avi_frame_chunks(data: bytes) -> list[bytes]:
    """Raw per-frame payloads of the VIDEO stream ('<NN>dc'/'<NN>db'
    chunks inside 'movi'), descending into 'rec ' grouping LISTs — the
    interleaved layout other muxers emit — and skipping other streams'
    chunks (audio '<NN>wb', a second stream's 'dc')."""
    want = b"%02d" % _video_stream_no(data)
    frames: list[bytes] = []

    def walk(start: int, end: int) -> None:
        for fid, fbody, fend in _iter_riff(data, start, end):
            if fid == b"LIST" and data[fbody : fbody + 4] == b"rec ":
                walk(fbody + 4, fend)
            elif fid[:2] == want and fid[2:4] in (b"dc", b"db"):
                frames.append(data[fbody:fend])

    for ckid, body, bend in _iter_riff(data, 12, len(data)):
        if ckid == b"LIST" and data[body : body + 4] == b"movi":
            walk(body + 4, bend)
    return frames


def decode_avi_frames(data: bytes, indices: list[int] | None = None) -> np.ndarray:
    """Decode MJPEG frames → (n, h, w) or (n, h, w, 3) array.  ``indices``
    selects frames (e.g. first/middle/last sampling) without decoding the
    rest — per-frame JPEGs are independently decodable by design."""
    from dronedb_spark.sources.jpeg import decode_jpeg

    info = avi_info(data)
    if info["handler"] not in (None, "MJPG", "mjpg", "jpeg"):
        raise NotImplementedError(f"AVI codec {info['handler']} (only MJPEG)")
    chunks = avi_frame_chunks(data)
    if indices is not None:
        chunks = [chunks[i] for i in indices]
    return np.stack([decode_jpeg(c) for c in chunks])
