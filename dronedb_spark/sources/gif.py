"""GIF decoder/encoder (GIF87a/89a, public spec) — the reference types
``.gif`` as an Image entry (entry.cpp:1040) and serves ``image/gif``
assets through STAC (stac.cpp:98), so the thumbnail path must decode
them.  Pure-numpy implementation of the published format: logical
screen descriptor, global/local color tables, sub-block framing,
graphic control extensions (transparency + disposal), 4-pass interlace,
and GIF-variant LZW (LSB-first variable-width codes, NO early change —
unlike the TIFF variant in sources/tiff.py).

Scale shape: one GIF is ONE binary cell decoded where it lives (the
multimodal mapInPandas contract); frame extraction composits only the
requested indices.
"""

from __future__ import annotations

import struct

import numpy as np


# ------------------------------------------------------------- LZW ----


def _lzw_decode_gif(data: bytes, min_code_size: int) -> list[int]:
    """GIF LZW: codes are LSB-first, width starts min_code_size+1, grows
    when the next assignable code no longer fits (standard change, at
    2^width), caps at 12 bits until a Clear."""
    clear = 1 << min_code_size
    eoi = clear + 1
    nbits = len(data) * 8

    pos = 0
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None

    while pos + width <= nbits:
        code = 0
        for k in range(width):
            code |= ((data[(pos + k) >> 3] >> ((pos + k) & 7)) & 1) << k
        pos += width
        if code == clear:
            table = table[: clear + 2]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        prev = entry
        # widen when the table is FULL at the current width (giflib's
        # RunningCode >= MaxCode1 after the add) — validated against a
        # real-encoder stream in tests/test_golden_vectors.py; note this
        # is one entry LATER than TIFF LZW's early change
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _lzw_encode_gif(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    accn = 0

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, accn
        acc |= code << accn
        accn += width
        while accn >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accn -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = clear + 2
    emit(clear)
    run: tuple[int, ...] = ()
    for s in indices:
        cand = run + (s,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        # the decoder's table lags the encoder's by one entry and widens
        # when ITS table fills, so the encoder widens at 2^width + 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4095:  # table cap: reset
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = clear + 2
            width = min_code_size + 1
        run = (s,)
    if run:
        emit(table[run])
    emit(eoi)
    if accn:
        out.append(acc & 0xFF)
    return bytes(out)


# ----------------------------------------------------------- format ----

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF (sub-block length past end)")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        if pos + n > len(data):
            raise ValueError("truncated GIF (sub-block payload past end)")
        chunks.append(data[pos : pos + n])
        pos += n
    return b"".join(chunks), pos


def parse_gif(data: bytes, max_frames: int | None = None) -> dict:
    """Full structural parse → {width, height, version, bg_index,
    gct (Nx3|None), frames: [{left, top, width, height, indices(np 2-D),
    palette, transparent, disposal, delay_cs}]}.  ``max_frames`` stops
    the walk (and its LZW work) after that many image blocks — the lazy
    path for first-frame thumbnails of long animations."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    if len(data) < 13:
        raise ValueError("truncated GIF (no logical screen descriptor)")
    w, h, packed, bg, _aspect = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + n * 3 > len(data):
            raise ValueError("truncated GIF (global color table past end)")
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3

    frames = []
    transparent = None
    disposal = 0
    delay_cs = 0
    while pos < len(data):
        if max_frames is not None and len(frames) >= max_frames:
            break
        b = data[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF (extension label past end)")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                flags, delay_cs, tidx = struct.unpack_from("<BHB", payload, 0)
                disposal = (flags >> 2) & 0x7
                transparent = tidx if flags & 1 else None
            continue
        if b == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("truncated GIF (image descriptor past end)")
            left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", data, pos)
            pos += 9
            pal = gct
            if fpacked & 0x80:
                n = 2 << (fpacked & 0x07)
                if pos + n * 3 > len(data):
                    raise ValueError("truncated GIF (local color table past end)")
                pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            min_code = data[pos]
            pos += 1
            lzw, pos = _sub_blocks(data, pos)
            idx = np.array(_lzw_decode_gif(lzw, min_code), dtype=np.uint8)
            if idx.size < fw * fh:
                idx = np.pad(idx, (0, fw * fh - idx.size))
            idx = idx[: fw * fh].reshape(fh, fw)
            if fpacked & 0x40:
                idx = _deinterlace(idx)
            frames.append(
                {
                    "left": left, "top": top, "width": fw, "height": fh,
                    "indices": idx, "palette": pal,
                    "transparent": transparent, "disposal": disposal,
                    "delay_cs": delay_cs,
                }
            )
            transparent = None
            disposal = 0
            delay_cs = 0
            continue
        raise ValueError(f"unknown GIF block 0x{b:02x} at {pos - 1}")
    return {
        "width": w, "height": h,
        "version": data[3:6].decode("ascii"),
        "bg_index": bg, "gct": gct, "frames": frames,
    }


def gif_info(data: bytes) -> dict:
    g = parse_gif(data)
    return {
        "width": g["width"], "height": g["height"],
        "version": g["version"], "n_frames": len(g["frames"]),
    }


def decode_gif_frames(data: bytes, indices: list[int] | None = None) -> np.ndarray:
    """Composited RGBA frames (n, h, w, 4).  Disposal semantics per the
    89a spec: 0/1 leave the canvas, 2 restores the frame region to
    transparent background, 3 restores the previous canvas.  Compositing
    is sequential from frame 0 (GIF frames are deltas), but parsing and
    LZW work STOP after the highest requested frame — first-frame
    thumbnails of a long animation decode exactly one frame."""
    if indices is None:
        g = parse_gif(data)
        want = set(range(len(g["frames"])))
    else:
        want = set(indices)
        g = parse_gif(data, max_frames=(max(want) + 1) if want else 0)
    canvas = np.zeros((g["height"], g["width"], 4), dtype=np.uint8)
    out: dict[int, np.ndarray] = {}
    for fi, fr in enumerate(g["frames"]):
        if fr["disposal"] == 3:
            saved = canvas.copy()
        # clip the frame rectangle to the logical screen (malformed
        # encoders may overhang; browsers clip, so do we)
        ch = max(0, min(fr["height"], g["height"] - fr["top"]))
        cw = max(0, min(fr["width"], g["width"] - fr["left"]))
        sl = np.s_[fr["top"] : fr["top"] + ch, fr["left"] : fr["left"] + cw]
        idx = fr["indices"][:ch, :cw]
        pal = fr["palette"]
        if pal is None:
            raise ValueError("GIF frame has no color table")
        if idx.size and int(idx.max()) >= len(pal):
            raise ValueError("corrupt GIF: palette index out of range")
        rgb = pal[idx]
        alpha = np.full(idx.shape, 255, dtype=np.uint8)
        if fr["transparent"] is not None:
            alpha[idx == fr["transparent"]] = 0
        region = canvas[sl]
        mask = alpha > 0
        region[mask] = np.dstack([rgb, alpha])[mask]
        canvas[sl] = region
        if fi in want:
            out[fi] = canvas.copy()
        if fr["disposal"] == 2:
            canvas[sl] = 0
        elif fr["disposal"] == 3:
            canvas = saved
    missing = want - set(out)
    if missing:
        raise IndexError(f"GIF has no frames {sorted(missing)}")
    return np.stack([out[i] for i in sorted(want)])


def decode_gif(data: bytes) -> np.ndarray:
    """First composited frame as RGB (the thumbnail contract)."""
    return decode_gif_frames(data, [0])[0][..., :3]


def encode_gif(frames: list[np.ndarray], delay_cs: int = 10) -> bytes:
    """Encode uint8 RGB frames (all same shape, ≤256 distinct colors
    across the set) as GIF89a with one global palette; multi-frame
    inputs get graphic-control delays (looping NETSCAPE ext omitted —
    deterministic fixtures don't need it)."""
    arrs = [np.ascontiguousarray(f, dtype=np.uint8) for f in frames]
    h, w = arrs[0].shape[:2]
    flat = np.concatenate([a.reshape(-1, 3) for a in arrs])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256")
    # pad palette to a power of two ≥ 2
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | ((bits - 1) & 7) | ((bits - 1) << 4), 0, 0)
    out += pal.tobytes()
    min_code = max(bits, 2)
    per = h * w
    pos0 = 0
    for a in arrs:
        idx = inverse[pos0 : pos0 + per]
        pos0 += per
        if len(arrs) > 1:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0, delay_cs, 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code)
        lzw = _lzw_encode_gif([int(v) for v in idx], min_code)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)
