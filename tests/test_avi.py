"""MJPEG-in-AVI container round-trips (sources/avi.py)."""

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
