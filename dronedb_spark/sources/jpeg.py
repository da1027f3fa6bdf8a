"""Pure-Python baseline JPEG codec (ITU-T T.81, public spec).

Decoder: baseline sequential DCT, Huffman entropy coding, 8-bit
precision; grayscale and YCbCr (4:4:4 and 4:2:0) with JFIF color
conversion; DRI/RSTn restart markers.  Encoder: the same subset, used to
build fixtures and round-trip tests (no Pillow in this environment).

Closes the K9 thumbnail-pipeline gap: the reference decodes JPEG via
GDAL/libjpeg in thumbs.cpp; here ``decode_media`` dispatches FFD8 bytes
to this module so every multimodal kernel (thumb_stats, media_features,
resize_images) runs on real JPEGs.

Oracle note: JPEG is lossy, so driver checks use DC-only grayscale
fixtures where the IDCT is exact integer arithmetic — pixel value =
128 + dc·q₀/8 with q₀ chosen divisible by 8 — making the decode
SQL-reproducible with no float rounding ambiguity.  The AC/color/
subsampling paths are covered by pytest round-trips against a direct
O(n⁴) IDCT reference.
"""

from __future__ import annotations

import struct

import numpy as np

# zig-zag order (T.81 Figure A.6)
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K example tables (public spec): luminance/chrominance quant +
# the standard Huffman code length/value lists.
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

_DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# 8x8 DCT basis matrix: A[u, x] = C(u)/2 * cos((2x+1)uπ/16);
# IDCT(block) = Aᵀ · block · A, forward DCT = A · pixels · Aᵀ.
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _huff_canonical(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol map from a BITS/HUFFVAL table pair."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (length, code)."""
    return {sym: (ln, code) for (ln, code), sym in _huff_canonical(bits, vals).items()}


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # byte stuffing
            elif 0xD0 <= nxt <= 0xD7:
                # restart marker mid-fill should not happen (handled at MCU
                # boundaries); treat as stream error
                raise ValueError("unexpected RST marker in entropy stream")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad Huffman code")

    def restart(self) -> None:
        """Align to byte boundary and consume an RSTn marker."""
        self.acc = 0
        self.n = 0
        if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
            self.pos += 2
        else:
            raise ValueError("expected RST marker")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG → uint8 array (h, w) for grayscale, (h, w, 3) RGB."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                qtables[tq] = np.frombuffer(seg, dtype=np.uint8, count=64, offset=p + 1).astype(
                    np.int64
                )
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = [0] + list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                htables[(tc, th)] = _huff_canonical(bits, vals)
                p += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(f"JPEG SOF{marker - 0xC0} (non-baseline)")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                for c in frame["comps"]:
                    if c["id"] == cs:
                        c["td"], c["ta"] = tdta >> 4, tdta & 0x0F
            pos += seg_len
            return _decode_scan(data, pos, frame, qtables, htables, restart_interval)
        pos += seg_len
    raise ValueError("no SOS in JPEG")


def _decode_scan(data, pos, frame, qtables, htables, restart_interval):
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64))
    r = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tab = htables[(0, c["td"])]
                ac_tab = htables[(1, c["ta"])]
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = r.huff(dc_tab)
                        diff = _extend(r.bits(t), t)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = r.huff(ac_tab)
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            zz[k] = _extend(r.bits(ss), ss)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz * q
                        px = _A.T @ block.reshape(8, 8) @ _A + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1
    # upsample subsampled planes to full resolution (nearest)
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def jpeg_info(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the SOF header alone."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker")
        marker = data[pos + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            _p, h, w, nc = struct.unpack_from(">BHHB", data, pos + 4)
            return w, h, nc
        if marker == 0xD9 or marker == 0xDA:
            break
        (seg_len,) = struct.unpack_from(">H", data, pos + 2)
        pos += 2 + seg_len
    raise ValueError("no SOF in JPEG")


# ----------------------------------------------------------------- encoder


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)  # 1-pad
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _category(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _encode_block(
    bw: _BitWriter, zz: np.ndarray, pred: int,
    dc_tab: dict, ac_tab: dict,
) -> int:
    diff = int(zz[0]) - pred
    t = _category(diff)
    ln, code = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_tab[0xF0]
            bw.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = ac_tab[(run << 4) | s]
        bw.write(code, ln)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = ac_tab[0x00]
        bw.write(code, ln)
    return int(zz[0])


def _quantize_plane(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H/8, W/8, 64) zig-zag quantized coefficient blocks."""
    h, w = plane.shape
    blocks = plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).astype(np.float64)
    coef = np.einsum("ux,ijxy,vy->ijuv", _A, blocks - 128.0, _A)
    qm = q.reshape(8, 8).astype(np.float64)
    zz = np.round(coef / qm).astype(np.int64).reshape(-1, 64)[:, :]
    # reorder natural → zigzag
    out = np.zeros_like(zz)
    out[:, np.arange(64)] = zz[:, _ZIGZAG]
    return out.reshape(h // 8, w // 8, 64)


def _pad_to(img: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = img.shape
    ph = (mult_y - h % mult_y) % mult_y
    pw = (mult_x - w % mult_x) % mult_x
    return np.pad(img, ((0, ph), (0, pw)), mode="edge")


def encode_jpeg(img: np.ndarray, subsample: bool = False) -> bytes:
    """Encode uint8 (h, w) grayscale or (h, w, 3) RGB as baseline JPEG
    with the Annex-K example tables (4:2:0 when ``subsample``)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    # DQT — the spec stores quant tables in zig-zag order
    seg(0xDB, b"\x00" + bytes(int(_Q_LUMA[_ZIGZAG[k]]) for k in range(64)))
    if not gray:
        seg(0xDB, b"\x01" + bytes(int(_Q_CHROMA[_ZIGZAG[k]]) for k in range(64)))
    # SOF0
    if gray:
        comps = [(1, 0x11, 0)]
    elif subsample:
        comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    else:
        comps = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv, tq in comps:
        sof += struct.pack(">BBB", cid, hv, tq)
    seg(0xC0, sof)
    # DHT
    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> None:
        seg(0xC4, bytes([(tc << 4) | th] + bits[1:17] + vals))

    dht(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS)
    dht(1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)
    if not gray:
        dht(0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS)
        dht(1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS)
    # SOS
    sos = bytes([len(comps)])
    for cid, _hv, tq in comps:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    seg(0xDA, sos)

    dc_l = _huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _huff_encode_table(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _huff_encode_table(_AC_CHROMA_BITS, _AC_CHROMA_VALS)

    bw = _BitWriter()
    if gray:
        zz = _quantize_plane(_pad_to(img, 8, 8), _Q_LUMA)
        pred = 0
        for by in range(zz.shape[0]):
            for bx in range(zz.shape[1]):
                pred = _encode_block(bw, zz[by, bx], pred, dc_l, ac_l)
    else:
        y = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        cb = -0.168736 * img[..., 0] - 0.331264 * img[..., 1] + 0.5 * img[..., 2] + 128.0
        cr = 0.5 * img[..., 0] - 0.418688 * img[..., 1] - 0.081312 * img[..., 2] + 128.0
        if subsample:
            ypad = _pad_to(y, 16, 16)
            # 2x2 box average then 8-align
            cbs = _pad_to(cb, 16, 16).reshape(ypad.shape[0] // 2, 2, ypad.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            crs = _pad_to(cr, 16, 16).reshape(ypad.shape[0] // 2, 2, ypad.shape[1] // 2, 2).mean(
                axis=(1, 3)
            )
            zzy = _quantize_plane(ypad, _Q_LUMA)
            zzb = _quantize_plane(cbs, _Q_CHROMA)
            zzr = _quantize_plane(crs, _Q_CHROMA)
            py = pb = pr = 0
            for my in range(zzy.shape[0] // 2):
                for mx in range(zzy.shape[1] // 2):
                    for by in range(2):
                        for bx in range(2):
                            py = _encode_block(
                                bw, zzy[my * 2 + by, mx * 2 + bx], py, dc_l, ac_l
                            )
                    pb = _encode_block(bw, zzb[my, mx], pb, dc_c, ac_c)
                    pr = _encode_block(bw, zzr[my, mx], pr, dc_c, ac_c)
        else:
            zzy = _quantize_plane(_pad_to(y, 8, 8), _Q_LUMA)
            zzb = _quantize_plane(_pad_to(cb, 8, 8), _Q_CHROMA)
            zzr = _quantize_plane(_pad_to(cr, 8, 8), _Q_CHROMA)
            py = pb = pr = 0
            for by in range(zzy.shape[0]):
                for bx in range(zzy.shape[1]):
                    py = _encode_block(bw, zzy[by, bx], py, dc_l, ac_l)
                    pb = _encode_block(bw, zzb[by, bx], pb, dc_c, ac_c)
                    pr = _encode_block(bw, zzr[by, bx], pr, dc_c, ac_c)
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


def encode_jpeg_dc_blocks(dc: np.ndarray, q0: int = 16) -> bytes:
    """Grayscale JPEG whose 8×8 blocks are flat: block (i, j) decodes to
    exactly clip(128 + dc[i,j]·q0/8) with NO float ambiguity (DC-only
    IDCT is c/8 uniform; q0 divisible by 8 keeps it integral).  This is
    the oracle-exact fixture generator for the driver check."""
    if q0 % 8:
        raise ValueError("q0 must be divisible by 8 for integer-exact decode")
    by, bx = dc.shape
    h, w = by * 8, bx * 8
    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2))
        out.extend(payload)

    qtab = bytes([q0] + [99] * 63)
    seg(0xDB, b"\x00" + qtab)
    seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + struct.pack(">BBB", 1, 0x11, 0))
    seg(0xC4, bytes([0x00] + _DC_LUMA_BITS[1:17] + _DC_LUMA_VALS))
    seg(0xC4, bytes([0x10] + _AC_LUMA_BITS[1:17] + _AC_LUMA_VALS))
    seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    dc_l = _huff_encode_table(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_l = _huff_encode_table(_AC_LUMA_BITS, _AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    zz = np.zeros(64, dtype=np.int64)
    for i in range(by):
        for j in range(bx):
            zz[0] = int(dc[i, j])
            pred = _encode_block(bw, zz, pred, dc_l, ac_l)
    out.extend(bw.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)
