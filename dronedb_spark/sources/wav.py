"""Pure-Python WAV (RIFF/WAVE PCM) codec — public Microsoft/IBM spec.

Makes audio decode REAL for the canonical uncompressed format: the
audio-feature kernels run on actual WAV bytes instead of the FAKE
container.  Scope: PCM (format 1) 8-bit unsigned / 16-bit signed,
any channel count and sample rate.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 (n,) or (n, channels) samples as PCM16 WAV."""
    arr = np.ascontiguousarray(samples, dtype=np.int16)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    byte_rate = sample_rate * ch * 2
    data = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode PCM WAV → (sample_rate, float64 array (n,) mono or (n, ch)).

    8-bit is unsigned per spec (rebased to signed); 16-bit little-endian
    signed.  Returns float64 so downstream feature math (RMS, ZCR) is
    precision-stable.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    sample_rate = channels = bits = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, sample_rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt not in (1, 3):  # PCM / IEEE float
                raise NotImplementedError(f"non-PCM WAV format {audio_fmt}")
        elif tag == b"data":
            raw = payload
    if raw is None or sample_rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    if audio_fmt == 3 and bits == 32:
        arr = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    elif audio_fmt == 3:
        raise NotImplementedError(f"{bits}-bit IEEE float WAV")
    elif bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif bits == 8:
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    elif bits == 24:
        b3 = np.frombuffer(raw[: len(raw) - len(raw) % 3], dtype=np.uint8).reshape(-1, 3)
        arr = (
            b3[:, 0].astype(np.int32)
            | (b3[:, 1].astype(np.int32) << 8)
            | (b3[:, 2].astype(np.int8).astype(np.int32) << 16)
        ).astype(np.float64)
    elif bits == 32:
        arr = np.frombuffer(raw, dtype="<i4").astype(np.float64)
    else:
        raise NotImplementedError(f"{bits}-bit PCM")
    if channels > 1:
        arr = arr[: (len(arr) // channels) * channels].reshape(-1, channels)
    return sample_rate, arr
