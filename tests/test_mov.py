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
