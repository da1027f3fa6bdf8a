"""MJPEG-in-AVI container round-trips (sources/avi.py)."""

import struct

import numpy as np
import pytest

from dronedb_spark.sources.avi import (
    avi_frame_chunks,
    avi_info,
    decode_avi_frames,
    encode_avi_mjpeg,
)
from dronedb_spark.sources.jpeg import encode_jpeg_dc_blocks


def _mjpeg(n_frames=6, by=3, bx=4):
    frames = [
        encode_jpeg_dc_blocks(
            (np.arange(by * bx).reshape(by, bx) * 5 + t * 11) % 120 - 60, q0=16
        )
        for t in range(n_frames)
    ]
    return frames, encode_avi_mjpeg(frames, bx * 8, by * 8, fps=12)


def test_avi_info():
    _frames, avi = _mjpeg()
    info = avi_info(avi)
    assert info == {"width": 32, "height": 24, "n_frames": 6, "fps": 12, "handler": "MJPG"}


def test_frame_chunks_are_the_jpegs():
    frames, avi = _mjpeg()
    assert avi_frame_chunks(avi) == frames


def test_decode_exact():
    _frames, avi = _mjpeg()
    arr = decode_avi_frames(avi)
    assert arr.shape == (6, 24, 32)
    dc = (np.arange(12).reshape(3, 4) * 5 + 2 * 11) % 120 - 60
    exp = 128 + 2 * np.repeat(np.repeat(dc, 8, axis=0), 8, axis=1)
    assert (arr[2] == exp).all()


def test_indexed_sampling_skips_decode():
    _frames, avi = _mjpeg()
    full = decode_avi_frames(avi)
    sel = decode_avi_frames(avi, indices=[0, 3, 5])
    assert (sel == full[[0, 3, 5]]).all()


def test_decode_media_dispatch():
    from dronedb_spark.multimodal.media import decode_media

    _frames, avi = _mjpeg()
    assert decode_media(avi).shape == (6, 24, 32)


def test_non_mjpeg_codec_raises():
    _frames, avi = _mjpeg()
    avi = avi.replace(b"vidsMJPG", b"vidsH264")
    with pytest.raises(NotImplementedError):
        decode_avi_frames(avi)


# ---------------------------------------------------------------------------
# Foreign-muxer fixture: interleaved RIFF layout encode_avi_mjpeg never
# produces — audio strl FIRST in hdrl (video frames are therefore
# '01dc', not '00dc'), frames wrapped in 'rec ' grouping LISTs and
# interleaved with '00wb' audio chunks.
# ---------------------------------------------------------------------------


def _foreign_muxer_avi(frames: list[bytes], width: int, height: int) -> bytes:
    from dronedb_spark.sources.avi import _chunk, _list

    n = len(frames)
    avih = struct.pack("<14I", 100000, 0, 0, 0x10, n, 0, 2, 0, width, height, 0, 0, 0, 0)
    a_strh = b"auds" + b"\x00" * 4 + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, 8000, 0, 64, 0, 2, 0, 0, 0, 0, 0
    )
    a_strf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)  # WAVEFORMATEX-ish
    v_strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIII4H", 0, 0, 0, 0, 1, 10, 0, n, 0, 10000, 0, 0, 0, 0, 0
    )
    v_strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", a_strh) + _chunk(b"strf", a_strf))
        + _list(b"strl", _chunk(b"strh", v_strh) + _chunk(b"strf", v_strf)),
    )
    audio = bytes(range(32))
    movi = b"movi"
    for f in frames:
        movi += _list(b"rec ", _chunk(b"01dc", f) + _chunk(b"00wb", audio))
    return b"RIFF" + struct.pack("<I", 4 + len(hdrl) + 8 + len(movi)) + b"AVI " + hdrl + _chunk(
        b"LIST", movi
    )


def test_avi_foreign_muxer_interleaved_rec_lists():
    from dronedb_spark.sources.avi import avi_frame_chunks, avi_info, decode_avi_frames

    frames = [encode_jpeg_dc_blocks(np.full((2, 3), t * 4 - 8), q0=16) for t in range(5)]
    avi = _foreign_muxer_avi(frames, 24, 16)
    info = avi_info(avi)
    assert info["handler"] == "MJPG" and info["n_frames"] == 5
    assert avi_frame_chunks(avi) == frames  # 01dc found, 00wb audio skipped
    arr = decode_avi_frames(avi, [0, 4])
    full = decode_avi_frames(avi)
    for t in range(5):
        assert np.all(full[t] == 128 + 2 * (t * 4 - 8))
    assert np.array_equal(arr[1], full[4])
