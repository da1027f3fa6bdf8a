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


_DESC = b"\x2c\x00\x00\x00\x00\x08\x00\x08\x00\x00"  # descriptor @ (0,0) 8x8


def _nth_descriptor(blob: bytes, n: int) -> int:
    pos = -1
    for _ in range(n):
        pos = blob.index(_DESC, pos + 1)
    return pos


def test_truncated_gif_raises_value_error():
    from dronedb_spark.sources.gif import parse_gif

    img = np.full((8, 8, 3), 9, dtype=np.uint8)
    blob = encode_gif([img])
    desc = _nth_descriptor(blob, 1)
    # header cut, LSD cut, GCT cut, mid-LZW-sub-block cut
    for cut in (5, 12, 20, desc + 14):
        with pytest.raises(ValueError):
            parse_gif(blob[:cut])


def test_first_frame_decode_is_lazy():
    """decode_gif must not LZW-decode later frames: corrupt frame 2's
    data and frame 0 still decodes cleanly."""
    from dronedb_spark.sources.gif import decode_gif, decode_gif_frames

    frames = [np.full((8, 8, 3), v, dtype=np.uint8) for v in (10, 20, 30)]
    blob = bytearray(encode_gif(frames))
    # find the THIRD image descriptor and wreck its LZW payload
    pos = _nth_descriptor(bytes(blob), 3)
    blob[pos + 11 : pos + 18] = b"\xff" * 7
    assert np.all(decode_gif(bytes(blob)) == 10)  # lazy: frame 2 untouched
    with pytest.raises(ValueError):
        decode_gif_frames(bytes(blob), [2])


def test_overhanging_frame_clips_to_canvas():
    """A frame rectangle past the logical screen clips (browser
    behavior) instead of raising a numpy broadcast error."""
    from dronedb_spark.sources.gif import decode_gif_frames, encode_gif
    import struct

    img = np.full((8, 8, 3), 50, dtype=np.uint8)
    blob = bytearray(encode_gif([img]))
    i = blob.index(0x2C)
    # move the frame 3px right/down without shrinking it
    struct.pack_into("<HH", blob, i + 1, 3, 3)
    out = decode_gif_frames(bytes(blob))
    assert out.shape == (1, 8, 8, 4)
    assert np.all(out[0, 3:, 3:, :3] == 50)
    assert np.all(out[0, :3, :, 3] == 0)  # untouched canvas is transparent


def test_lzw_first_code_out_of_range_raises_value_error():
    """A corrupt stream whose FIRST code after a clear is beyond the
    table must raise the module's ValueError contract, not IndexError."""
    # min_code_size=2 → clear=4, eoi=5, table len 6; code 7 is invalid
    # as the first code.  3-bit LSB-first packing: first code = 7.
    with pytest.raises(ValueError, match="corrupt GIF LZW"):
        _lzw_decode_gif(bytes([0b00000111]), 2)
