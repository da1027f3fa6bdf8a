"""GIF codec unit tests beyond the external golden vectors: interlace
reordering, disposal compositing, sub-block framing edge cases."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from dronedb_spark.sources.gif import (
    _deinterlace,
    _lzw_decode_gif,
    _lzw_encode_gif,
    decode_gif_frames,
    encode_gif,
    parse_gif,
)


def test_deinterlace_pass_order():
    """GIF 4-pass interlace: rows 0,8,16.. then 4,12.. then 2,6,10..
    then odd rows.  A 17-row identity grid must land on the spec order."""
    h = 17
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    # stored[i] is the row a file stores i-th; it belongs at canvas row
    # order[i]
    stored = np.arange(h)[:, None].repeat(3, axis=1)
    out = _deinterlace(stored)
    for i, target_row in enumerate(order):
        assert out[target_row, 0] == stored[i, 0]


def test_lzw_gif_roundtrip_small_alphabet():
    """min_code_size 2 (the GIF floor) with a 3-symbol alphabet — width
    starts at 3 bits and grows quickly; includes the KwKwK pattern."""
    seq = [0, 1, 0, 1, 0, 0, 1, 1, 2, 2, 2, 2, 0, 1, 0, 1, 0, 1, 0] * 40
    enc = _lzw_encode_gif(seq, 2)
    assert _lzw_decode_gif(enc, 2) == seq


def test_lzw_gif_table_reset_roundtrip():
    """Enough random symbols to hit the 4095-entry table cap and force a
    mid-stream Clear."""
    rng = np.random.RandomState(5)
    seq = [int(x) for x in rng.randint(0, 256, 30000)]
    enc = _lzw_encode_gif(seq, 8)
    assert _lzw_decode_gif(enc, 8) == seq


def test_disposal_restore_background():
    """Disposal 2 clears the frame region to transparent before the next
    frame; a partial second frame must not inherit frame 1's pixels in
    the cleared area."""
    f0 = np.full((8, 8, 3), 10, dtype=np.uint8)
    f1 = np.full((8, 8, 3), 200, dtype=np.uint8)
    blob = bytearray(encode_gif([f0, f1]))
    # flip frame 0's GCE disposal bits (packed byte after 0x21 0xF9 0x04)
    i = blob.index(bytes([0x21, 0xF9, 0x04]))
    blob[i + 3] |= 2 << 2
    g = parse_gif(bytes(blob))
    assert g["frames"][0]["disposal"] == 2
    frames = decode_gif_frames(bytes(blob))
    assert np.all(frames[0][..., :3] == 10)
    assert np.all(frames[1][..., :3] == 200)


def test_gif_palette_cap():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (20, 20, 3), dtype=np.uint8)  # ~400 colors
    with pytest.raises(ValueError, match="exceed"):
        encode_gif([img])
