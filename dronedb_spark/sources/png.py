"""Pure-Python PNG codec (public spec: RFC 2083 / W3C PNG, stdlib zlib).

This makes image decode REAL for one ubiquitous public format: the
multimodal kernels (`multimodal/media.py:decode_media`) and the thumbnail
sink no longer depend on the FAKE container when the payload is a PNG.
Scope: 8- and 16-bit depths, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha) and 6 (RGBA), all five filter types, non-interlaced — the
shapes a training pipeline's image shards (and 16-bit DEM heightmaps)
actually use.  Reference role-equivalent:
thumbs.cpp (decode → resize) minus the GDAL dependency.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _filter_row(cur: np.ndarray, prev: np.ndarray, c: int, ftype: int) -> np.ndarray:
    """Apply filter ``ftype`` to one raw scanline (the encoder-side spec
    transform; exact inverse of ``_unfilter``)."""
    cur = cur.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.zeros_like(cur)
    left[c:] = cur[:-c]
    upleft = np.zeros_like(prev)
    upleft[c:] = prev[:-c]
    if ftype == 0:
        return cur.astype(np.uint8)
    if ftype == 1:
        return ((cur - left) & 0xFF).astype(np.uint8)
    if ftype == 2:
        return ((cur - prev) & 0xFF).astype(np.uint8)
    if ftype == 3:
        return ((cur - ((left + prev) >> 1)) & 0xFF).astype(np.uint8)
    if ftype == 4:
        pa, pb, pc = np.abs(prev - upleft), np.abs(left - upleft), np.abs(left + prev - 2 * upleft)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft))
        return ((cur - pred) & 0xFF).astype(np.uint8)
    raise ValueError(f"unknown PNG filter {ftype}")


def encode_png(arr: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Encode a uint8 or uint16 array — (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB or (h, w, 4) RGBA — as a non-interlaced PNG.
    ``filters`` names the per-row filter type (cycled); default all rows
    filter 0.  16-bit samples store big-endian per the spec."""
    arr = np.ascontiguousarray(arr)
    if arr.dtype == np.uint16:
        sample_bytes = 2
    else:
        arr = arr.astype(np.uint8)
        sample_bytes = 1
    if arr.ndim == 2:
        h, w, c = arr.shape[0], arr.shape[1], 1
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        h, w, c = arr.shape
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    if sample_bytes == 2:
        raw = np.frombuffer(
            arr.astype(">u2").tobytes(), dtype=np.uint8
        ).reshape(h, w * c * 2)
    else:
        raw = arr.reshape(h, w * c)
    bpp = c * sample_bytes
    if filters:
        parts = []
        prev = np.zeros(w * c * sample_bytes, dtype=np.uint8)
        for y in range(h):
            f = filters[y % len(filters)]
            parts.append(bytes([f]) + _filter_row(raw[y], prev, bpp, f).tobytes())
            prev = raw[y]
        scanlines = b"".join(parts)
    else:
        scanlines = b"".join(b"\x00" + raw[y].tobytes() for y in range(h))

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8 * sample_bytes, color_type, 0, 0, 0)
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


def _unfilter(data: bytes, h: int, w: int, c: int, sample_bytes: int = 1) -> np.ndarray:
    """Reverse the per-row filters.  Rows are sequential by spec (each row
    references the reconstructed previous row); columns are vectorized.
    Filters operate on BYTES at distance bpp = channels x sample bytes
    (PNG spec), regardless of sample depth."""
    bpp = c * sample_bytes
    stride = w * c * sample_bytes
    out = np.zeros((h, stride), dtype=np.uint8)
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size < h * (stride + 1):
        raise ValueError("truncated PNG pixel data")
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = y * (stride + 1)
        ftype = int(raw[base])
        line = raw[base + 1 : base + 1 + stride].astype(np.int32)
        if ftype == 0:
            rec = line
        elif ftype == 1:  # Sub — a running sum per byte lane: cumsum mod 256
            rec = (
                np.cumsum(line.reshape(stride // bpp, bpp), axis=0, dtype=np.int64)
                .reshape(stride) & 0xFF
            )
        elif ftype == 2:  # Up
            rec = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            p = prev.astype(np.int32)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + p[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            p = prev.astype(np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = p[x]
                cc = p[x - bpp] if x >= bpp else 0
                pa, pb, pc = abs(b - cc), abs(a - cc), abs(a + b - 2 * cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    if sample_bytes == 2:
        a = np.frombuffer(out.tobytes(), dtype=">u2").reshape(h, w, c).astype(np.uint16)
        return a if c > 1 else a.reshape(h, w)
    return out.reshape(h, w, c) if c > 1 else out.reshape(h, w)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG to uint8 ndarray — (h, w) for gray, (h, w, c) else."""
    if not data.startswith(_SIG):
        raise ValueError("not a PNG")
    pos = len(_SIG)
    w = h = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + payload + crc
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"tRNS":
            trns = np.frombuffer(payload, dtype=np.uint8)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth == 16 and color_type in _CHANNELS and interlace == 0:
        return _unfilter(
            zlib.decompress(bytes(idat)), h, w, _CHANNELS[color_type], sample_bytes=2
        )
    if color_type == 3 and bit_depth == 8 and interlace == 0:
        # palette: 1 index byte per pixel, expanded through PLTE to RGB;
        # a tRNS chunk (per-entry alpha, short tables pad opaque) makes
        # the result RGBA — real-world palettized icons carry it
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idx = _unfilter(zlib.decompress(bytes(idat)), h, w, 1)
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns[: len(plte)]
            return np.dstack([plte[idx], alpha[idx]])
        return plte[idx]
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} interlace={interlace}"
        )
    return _unfilter(zlib.decompress(bytes(idat)), h, w, _CHANNELS[color_type])


def png_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) — IHDR plus, for palette images only, a
    chunk-HEADER walk to spot a tRNS (which makes the decode RGBA).
    Still metadata-only: payloads are skipped, never inflated.

    Prefix caveat: on a stream PREFIX (the ingest sniffer's header
    window) the walk ends at the first chunk header past the available
    bytes; a tRNS hiding behind a large earlier chunk (e.g. an iCCP
    profile) then under-reports channels as 3 while a full decode
    returns RGBA — inherent to prefix sniffing, callers needing the
    exact band count must decode."""
    if not data.startswith(_SIG) or data[12:16] != b"IHDR":
        raise ValueError("not a PNG")
    w, h, _depth, color_type = struct.unpack(">IIBB", data[16:26])
    if color_type != 3:
        # unknown types report 0 and the parse stage omits the bands
        return w, h, _CHANNELS.get(color_type, 0)
    pos = len(_SIG)
    channels = 3
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if tag == b"tRNS":
            channels = 4
            break
        if tag in (b"IDAT", b"IEND"):
            break
        pos += 12 + length
    return w, h, channels
