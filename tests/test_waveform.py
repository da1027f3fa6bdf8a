"""LAS 1.4 full-waveform tests (sources/waveform.py): PDRF 9/10 record
layout, descriptor VLR parsing, EVLR random access, metric reductions."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.sources.las import decode_las, las_info
from dronedb_spark.sources.waveform import (
    encode_las14_waveform,
    parse_descriptors,
    read_waveform,
    waveform_metrics,
)


def _fixture(n=10, fmt10=False):
    waves = [np.arange(16 + 4 * (i % 2), dtype=np.uint16) * (i + 1) % 4096
             for i in range(n)]
    kw = {}
    if fmt10:
        kw["rgb"] = [[i, i + 1, i + 2] for i in range(n)]
        kw["nir"] = list(range(n))
    blob = encode_las14_waveform(
        x=np.arange(n) * 0.5, y=np.arange(n) * 0.25, z=(np.arange(n) % 7).astype(float),
        waveforms=waves, classification=(np.arange(n) % 5),
        gps_time=1000.0 + np.arange(n), return_point_ps=np.arange(n) * 10.0,
        **kw,
    )
    return blob, waves


def test_pdrf9_layout_and_fields():
    blob, waves = _fixture()
    info = las_info(blob)
    assert info["point_format"] == 9
    assert info["record_length"] == 59
    d = decode_las(blob)
    np.testing.assert_allclose(d["x"], np.arange(10) * 0.5)
    assert d["classification"].tolist() == [i % 5 for i in range(10)]
    assert d["wpd_index"].tolist() == [1 + (i % 2) for i in range(10)]
    assert d["wf_size"].tolist() == [2 * len(w) for w in waves]
    np.testing.assert_allclose(d["wf_return_point"], np.arange(10) * 10.0)


def test_pdrf10_adds_rgb_nir():
    blob, _ = _fixture(fmt10=True)
    info = las_info(blob)
    assert info["point_format"] == 10
    assert info["record_length"] == 67
    d = decode_las(blob)
    assert d["red"].tolist() == list(range(10))
    assert d["nir"].tolist() == list(range(10))
    assert "wf_offset" in d


def test_descriptor_vlrs():
    blob, _ = _fixture()
    descs = parse_descriptors(blob)
    assert sorted(descs) == [1, 2]
    assert descs[1]["n_samples"] == 16
    assert descs[2]["n_samples"] == 20
    assert descs[1]["bits_per_sample"] == 16
    assert descs[1]["compression"] == 0


def test_random_access_waveform_read():
    blob, waves = _fixture()
    for i in (0, 3, 9):
        w = read_waveform(blob, i)
        np.testing.assert_array_equal(w["samples"], waves[i])
        np.testing.assert_allclose(w["volts"], waves[i] * 0.01)


def test_waveform_metrics_reductions():
    blob, waves = _fixture()
    m = waveform_metrics(blob)
    assert m["n_samples"].tolist() == [len(w) for w in waves]
    assert m["energy"].tolist() == [int(w.sum()) for w in waves]
    assert m["peak"].tolist() == [int(w.max()) for w in waves]


def test_offsets_relative_to_evlr_record_start():
    """LAS 1.4 R15: a packet's absolute position is header-field-227 +
    wf_offset, where 227 points at the EVLR HEADER — so the first
    packet's wf_offset must be 60 (the EVLR header length), never 0, or
    conformant readers (PDAL/laspy) locate every packet 60 bytes early."""
    import struct

    blob, waves = _fixture()
    d = decode_las(blob)
    assert int(d["wf_offset"][0]) == 60
    (start_227,) = struct.unpack_from("<Q", blob, 227)
    # resolving the spec way lands exactly on the first packet's bytes
    first = blob[start_227 + int(d["wf_offset"][0]):][: int(d["wf_size"][0])]
    assert first == waves[0].tobytes()


def test_global_encoding_marks_internal_waveforms():
    import struct

    blob, _ = _fixture()
    (ge,) = struct.unpack_from("<H", blob, 6)
    assert ge & 0x0002  # bit 1: waveform data packets internal
