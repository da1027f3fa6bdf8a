"""MJPEG-in-MOV container tests (sources/mov.py): writer/reader round
trip, selective frame decode, and sample-table generality beyond our own
one-sample-per-chunk layout."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dronedb_spark.sources.jpeg import encode_jpeg_dc_blocks
from dronedb_spark.sources.mov import (
    decode_mov_frames,
    encode_mov_mjpeg,
    mov_frame_chunks,
    mov_info,
    mov_sample_table,
)


def _frames(n=5):
    return [encode_jpeg_dc_blocks(np.full((2, 3), t * 4 - 8), q0=16) for t in range(n)]


def test_mov_roundtrip_exact_pixels():
    frames = _frames()
    mov = encode_mov_mjpeg(frames, 24, 16)
    info = mov_info(mov)
    assert info["brand"] == "qt  "
    assert (info["width"], info["height"], info["n_frames"]) == (24, 16, 5)
    arr = decode_mov_frames(mov)
    assert arr.shape == (5, 16, 24)
    for t in range(5):
        assert np.all(arr[t] == 128 + 2 * (t * 4 - 8))


def test_mov_selective_decode_matches_full():
    frames = _frames(7)
    mov = encode_mov_mjpeg(frames, 24, 16)
    full = decode_mov_frames(mov)
    sel = decode_mov_frames(mov, [1, 6])
    assert np.array_equal(sel[0], full[1])
    assert np.array_equal(sel[1], full[6])


def test_mov_frame_chunks_are_original_jpegs():
    frames = _frames(4)
    mov = encode_mov_mjpeg(frames, 24, 16)
    assert mov_frame_chunks(mov) == frames


def test_mov_stsc_multi_run_expansion():
    """A muxer may pack several samples per chunk with multiple stsc
    runs; rewrite our file's sample table into 2 chunks of sizes (3, 2)
    samples and re-resolve — offsets must follow the run expansion, not
    assume one sample per chunk."""
    frames = _frames(5)
    mov = encode_mov_mjpeg(frames, 24, 16)
    st = mov_sample_table(mov)
    # chunk 1 holds samples 0-2, chunk 2 holds samples 3-4 (contiguous in
    # our mdat, so chunk offsets are just the first sample of each)
    c1, c2 = st["offsets"][0], st["offsets"][3]
    new_stsc = struct.pack(">I", 8 + 4 + 4 + 24) + b"stsc" + struct.pack(
        ">BxxxI", 0, 2
    ) + struct.pack(">III", 1, 3, 1) + struct.pack(">III", 2, 2, 1)
    new_stco = struct.pack(">I", 8 + 4 + 4 + 8) + b"stco" + struct.pack(
        ">BxxxI", 0, 2
    ) + struct.pack(">II", c1, c2)
    # splice: find the old stsc/stco boxes and replace them
    def replace_box(blob: bytes, fourcc: bytes, new: bytes) -> bytes:
        i = blob.rindex(fourcc) - 4
        (size,) = struct.unpack_from(">I", blob, i)
        out = blob[:i] + new + blob[i + size :]
        # fix enclosing box sizes (stbl/minf/mdia/trak/moov all grow/shrink)
        delta = len(new) - size
        if delta:
            for outer in (b"stbl", b"minf", b"mdia", b"trak", b"moov"):
                j = out.rindex(outer) - 4
                (osz,) = struct.unpack_from(">I", out, j)
                out = out[:j] + struct.pack(">I", osz + delta) + out[j + 4 :]
        return out

    mov2 = replace_box(mov, b"stsc", new_stsc)
    mov2 = replace_box(mov2, b"stco", new_stco)
    st2 = mov_sample_table(mov2)
    assert st2["offsets"] == st["offsets"]
    assert st2["sizes"] == st["sizes"]
    arr = decode_mov_frames(mov2)
    for t in range(5):
        assert np.all(arr[t] == 128 + 2 * (t * 4 - 8))


def test_mov_non_jpeg_codec_raises():
    frames = _frames(2)
    mov = bytearray(encode_mov_mjpeg(frames, 24, 16))
    i = mov.rindex(b"jpeg")  # the stsd sample-entry fourcc (written last)
    # the LAST 'jpeg' occurrence inside moov is the sample description
    mov[i : i + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        mov_frame_chunks(bytes(mov))


# ---------------------------------------------------------------------------
# Foreign-muxer fixture: a spec-assembled QTFF layout that
# encode_mov_mjpeg NEVER produces — audio trak ordered before the video
# trak (hdlr 'soun' must be skipped), video samples packed 2-per-chunk
# with a multi-run stsc, chunks INTERLEAVED with audio data in mdat, and
# 64-bit co64 chunk offsets.  Pins the reader's "handles other muxers"
# claim (sources/mov.py:9-12) against bytes our writer can't emit.
# ---------------------------------------------------------------------------


def _qt_box(t: bytes, p: bytes) -> bytes:
    return struct.pack(">I", 8 + len(p)) + t + p


def _foreign_muxer_mov(frames: list[bytes], width: int, height: int) -> bytes:
    ftyp = _qt_box(b"ftyp", b"qt  " + struct.pack(">I", 0x20050300) + b"qt  ")
    audio = bytes(range(128))  # two PCM chunks of 32 uniform 2-byte samples
    # mdat layout: V[f0 f1] A[64] V[f2 f3] A[64] V[f4]
    mdat_payload = (
        frames[0] + frames[1] + audio[:64] + frames[2] + frames[3]
        + audio[64:] + frames[4]
    )
    mdat = _qt_box(b"mdat", mdat_payload)
    base = len(ftyp) + 8
    v_off = [
        base,
        base + len(frames[0]) + len(frames[1]) + 64,
        base + len(frames[0]) + len(frames[1]) + 64 + len(frames[2]) + len(frames[3]) + 64,
    ]
    a_off = [base + len(frames[0]) + len(frames[1]), v_off[1] + len(frames[2]) + len(frames[3])]

    def _full(t, payload):
        return _qt_box(t, struct.pack(">Bxxx", 0) + payload)

    def _trak(hdlr_sub: bytes, stbl: bytes) -> bytes:
        hdlr = _full(b"hdlr", b"mhlr" + hdlr_sub + b"\x00" * 12 + b"\x00")
        mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 1000, 500, 0, 0))
        minf = _qt_box(b"minf", _qt_box(b"dinf", _full(
            b"dref", struct.pack(">I", 1) + _qt_box(b"url ", b"\x00\x00\x00\x01"))) + stbl)
        mdia = _qt_box(b"mdia", mdhd + hdlr + minf)
        tkhd = _qt_box(b"tkhd", struct.pack(">B", 0) + b"\x00\x00\x07" + b"\x00" * 80)
        return _qt_box(b"trak", tkhd + mdia)

    # audio trak FIRST: 'twos' PCM, uniform stsz, plain stco
    twos = _qt_box(b"twos", b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 20)
    a_stbl = _qt_box(
        b"stbl",
        _full(b"stsd", struct.pack(">I", 1) + twos)
        + _full(b"stts", struct.pack(">III", 1, 64, 1))
        + _full(b"stsc", struct.pack(">IIII", 1, 1, 32, 1))
        + _full(b"stsz", struct.pack(">II", 2, 64))
        + _full(b"stco", struct.pack(">I", 2) + struct.pack(">II", *a_off)),
    )

    jpeg_entry = _qt_box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)
        + struct.pack(">HH", 0, 0) + b"appl" + struct.pack(">II", 0, 0)
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)
        + struct.pack(">I", 0) + struct.pack(">H", 1)
        + b"\x0aPhoto JPEG" + b"\x00" * 21 + struct.pack(">Hh", 24, -1),
    )
    # stsc runs: chunks 1-2 carry 2 samples each, chunk 3 carries 1
    v_stbl = _qt_box(
        b"stbl",
        _full(b"stsd", struct.pack(">I", 1) + jpeg_entry)
        + _full(b"stts", struct.pack(">III", 1, 5, 100))
        + _full(b"stsc", struct.pack(">I", 2)
                + struct.pack(">III", 1, 2, 1) + struct.pack(">III", 3, 1, 1))
        + _full(b"stsz", struct.pack(">II", 0, 5)
                + b"".join(struct.pack(">I", len(f)) for f in frames))
        + _full(b"co64", struct.pack(">I", 3)
                + b"".join(struct.pack(">Q", o) for o in v_off)),
    )

    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 500) + b"\x00" * 80)
    moov = _qt_box(b"moov", mvhd + _trak(b"soun", a_stbl) + _trak(b"vide", v_stbl))
    return ftyp + mdat + moov


def test_mov_foreign_muxer_layout_decodes():
    frames = _frames(5)
    mov = _foreign_muxer_mov(frames, 24, 16)
    st = mov_sample_table(mov)
    assert st["codec"] == "jpeg"
    assert st["sizes"] == [len(f) for f in frames]
    assert mov_frame_chunks(mov) == frames  # interleaving resolved exactly
    arr = decode_mov_frames(mov, [0, 2, 4])
    full = decode_mov_frames(mov)
    assert arr.shape == (3, 16, 24)
    for t in range(5):
        assert np.all(full[t] == 128 + 2 * (t * 4 - 8))
    assert np.array_equal(arr[1], full[2])


def test_mov_audio_only_file_has_no_video_table():
    frames = _frames(5)
    mov = _foreign_muxer_mov(frames, 24, 16)
    # strip the video trak: keep bytes up to its start
    i = mov.rindex(b"trak") - 4
    (sz,) = struct.unpack_from(">I", mov, i)
    body = mov[:i] + mov[i + sz:]
    j = body.rindex(b"moov") - 4
    (msz,) = struct.unpack_from(">I", body, j)
    body = body[:j] + struct.pack(">I", msz - sz) + body[j + 4:]
    with pytest.raises(ValueError, match="no video sample table"):
        mov_sample_table(body)
