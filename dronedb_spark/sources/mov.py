"""QuickTime MOV container with a Photo-JPEG ('jpeg') video track —
the MJPEG-in-MOV half of the reference's video thumbnail path
(thumbs.cpp video branch; entry.cpp:1086-1099 routes .mov through the
same ffmpeg frame grab).  Public ISO BMFF / QuickTime File Format
layout; frames are baseline JPEGs decoded by ``sources/jpeg.py``.

The reader walks the REAL sample table: ``stsd`` (codec check),
``stsz`` (per-sample sizes), ``stsc`` (sample-per-chunk runs, expanded
per the spec), ``stco``/``co64`` (chunk offsets) — so files written by
other muxers (one chunk for all samples, or interleaved chunks) resolve
correctly, not just our own one-sample-per-chunk layout.

Scale shape: a video file is ONE binary cell; frame sampling decodes
only the requested indices (byte ranges from the sample table), never
the whole clip — the same independent-frame contract as the AVI path.
"""

from __future__ import annotations

import struct

import numpy as np

from dronedb_spark.sources.mp4 import _iter_boxes


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def encode_mov_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """ftyp('qt  ') + mdat(frames) + moov with a full sample table.
    moov goes LAST so stco can hold absolute mdat offsets."""
    ftyp = _box(b"ftyp", b"qt  " + struct.pack(">I", 0x20050300) + b"qt  ")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)

    # absolute file offset of each frame (one chunk per sample)
    base = len(ftyp) + 8
    offsets = []
    pos = base
    for fr in frames:
        offsets.append(pos)
        pos += len(fr)

    n = len(frames)
    timescale = fps * 100
    sample_dur = 100
    duration = n * sample_dur

    # stsd: one 'jpeg' (Photo JPEG) sample description
    jpeg_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)           # reserved, data_ref_index
        + struct.pack(">HH", 0, 0)                    # version, revision
        + b"appl" + struct.pack(">II", 0, 0)          # vendor, temporal/spatial q
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)                        # data size
        + struct.pack(">H", 1)                        # frame count
        + b"\x0aPhoto JPEG" + b"\x00" * 21            # pascal compressor name
        + struct.pack(">Hh", 24, -1),                 # depth, color table id
    )
    stsd = _box(b"stsd", struct.pack(">BxxxI", 0, 1) + jpeg_entry)
    stts = _box(b"stts", struct.pack(">BxxxIII", 0, 1, n, sample_dur))
    stsc = _box(b"stsc", struct.pack(">BxxxIIII", 0, 1, 1, 1, 1))
    stsz = _box(
        b"stsz",
        struct.pack(">BxxxII", 0, 0, n) + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _box(
        b"stco",
        struct.pack(">BxxxI", 0, n) + b"".join(struct.pack(">I", o) for o in offsets),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    vmhd = _box(b"vmhd", struct.pack(">BxxxHHHH", 0, 0, 0, 0, 0)[:4+8])
    dref = _box(b"dref", struct.pack(">BxxxI", 0, 1) + _box(b"url ", b"\x00\x00\x00\x01"))
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)

    mdhd = _box(b"mdhd", struct.pack(">BxxxIIIIHH", 0, 0, 0, timescale, duration, 0, 0))
    hdlr = _box(b"hdlr", struct.pack(">Bxxx", 0) + b"mhlr" + b"vide" + b"\x00" * 12 + b"\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)

    # tkhd v0 (84-byte body): version u8 + flags u24 (0x7 = enabled |
    # in-movie | in-preview), creation/modification u32, track id u32,
    # reserved u32, duration u32, reserved u64, layer/alt-group/volume
    # i16 + reserved i16, 3x3 fixed matrix, width/height 16.16
    tkhd = _box(
        b"tkhd",
        struct.pack(">B", 0) + b"\x00\x00\x07"
        + struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">hhhh", 0, 0, 0, 0)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _box(
        b"mvhd",
        struct.pack(">B3xIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">IH2x8x", 0x00010000, 0x0100)
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """(body, end) of the first box matching the nested type path."""
    for btype, body, bend in _iter_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return body, bend
            return _find_box(data, body, bend, path[1:])
    return None


def mov_sample_table(data: bytes) -> dict:
    """Parse the first video track's sample table → {codec, sizes,
    offsets} with offsets resolved through the stsc chunk-run expansion
    (QTFF §"Sample-to-Chunk Atoms")."""
    moov = _find_box(data, 0, len(data), [b"moov"])
    if moov is None:
        raise ValueError("no moov box")
    for btype, body, bend in _iter_boxes(data, *moov):
        if btype != b"trak":
            continue
        mdia = _find_box(data, body, bend, [b"mdia"])
        if mdia is None:
            continue
        # only video tracks: a file whose audio trak precedes the video
        # trak must not resolve the audio sample description (QTFF
        # "Handler Reference Atoms" — component subtype at payload+8)
        hdlr = _find_box(data, *mdia, [b"hdlr"])
        if hdlr is not None and data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        stbl = _find_box(data, *mdia, [b"minf", b"stbl"])
        if stbl is None:
            continue
        boxes = {t: (b, e) for t, b, e in _iter_boxes(data, *stbl)}
        if b"stsd" not in boxes:
            continue
        sb, _se = boxes[b"stsd"]
        codec = data[sb + 12 : sb + 16].decode("ascii", errors="replace")

        zb, _ze = boxes[b"stsz"]
        uniform, count = struct.unpack_from(">II", data, zb + 4)
        if uniform:
            sizes = [uniform] * count
        else:
            sizes = list(struct.unpack_from(f">{count}I", data, zb + 12))

        if b"stco" in boxes:
            cb, _ce = boxes[b"stco"]
            (n_chunks,) = struct.unpack_from(">I", data, cb + 4)
            chunk_offsets = list(struct.unpack_from(f">{n_chunks}I", data, cb + 8))
        else:
            cb, _ce = boxes[b"co64"]
            (n_chunks,) = struct.unpack_from(">I", data, cb + 4)
            chunk_offsets = list(struct.unpack_from(f">{n_chunks}Q", data, cb + 8))

        scb, _sce = boxes[b"stsc"]
        (n_runs,) = struct.unpack_from(">I", data, scb + 4)
        runs = [
            struct.unpack_from(">III", data, scb + 8 + 12 * i) for i in range(n_runs)
        ]
        # expand runs: each run (first_chunk 1-based, samples_per_chunk, _)
        # applies until the next run's first_chunk
        per_chunk = []
        for i, (first, spc, _desc) in enumerate(runs):
            last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            per_chunk += [spc] * (last - first + 1)

        offsets = []
        si = 0
        for ci, coff in enumerate(chunk_offsets):
            pos = coff
            for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
                if si >= count:
                    break
                offsets.append(pos)
                pos += sizes[si]
                si += 1
        return {"codec": codec, "sizes": sizes, "offsets": offsets}
    raise ValueError("no video sample table")


def mov_frame_chunks(data: bytes) -> list[bytes]:
    st = mov_sample_table(data)
    if st["codec"] != "jpeg":
        raise NotImplementedError(f"MOV codec {st['codec']!r} (only Photo JPEG)")
    return [data[o : o + s] for o, s in zip(st["offsets"], st["sizes"])]


def mov_info(data: bytes) -> dict:
    from dronedb_spark.sources.mp4 import mp4_info

    out = mp4_info(data)
    out["n_frames"] = len(mov_sample_table(data)["sizes"])
    return out


def decode_mov_frames(data: bytes, indices: list[int] | None = None) -> np.ndarray:
    """Decode selected frames only — byte ranges come from the sample
    table, so unsampled frames are never touched."""
    from dronedb_spark.sources.jpeg import decode_jpeg

    st = mov_sample_table(data)
    if st["codec"] != "jpeg":
        raise NotImplementedError(f"MOV codec {st['codec']!r} (only Photo JPEG)")
    idx = indices if indices is not None else range(len(st["sizes"]))
    frames = [
        decode_jpeg(data[st["offsets"][i] : st["offsets"][i] + st["sizes"][i]])
        for i in idx
    ]
    return np.stack(frames)
