"""Property-based round-trips for the round-4 binary codecs (RAD splat
containers, ZoneDetect databases) — hypothesis generates adversarial
shapes the hand-written fixtures don't."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from dronedb_spark.sources.rad import encode_rad, rad_bounds, read_rad_coarse
from dronedb_spark.sources.zonedetect import ZoneDetectDB, encode_zonedetect

_ENCODINGS = ["f32", "f32_lebytes", "f16", "f16_lebytes", "r8", "r8_delta"]


@st.composite
def _rad_chunks(draw):
    n_chunks = draw(st.integers(1, 3))
    chunks = []
    for _ in range(n_chunks):
        n = draw(st.integers(1, 40))
        # centers on the binary16-exact grid keep all six encodings
        # comparable at their own precision
        grid = st.integers(-2048, 2048)
        center = np.array(
            [[draw(grid) / 16.0, draw(grid) / 16.0, draw(grid) / 16.0]
             for _ in range(n)]
        )
        enc = draw(st.sampled_from(_ENCODINGS))
        with_color = draw(st.booleans())
        ch = {"center": center,
              "encodings": {"center": enc, "rgb": "r8", "alpha": "r8"},
              "gz": set(draw(st.sampled_from([[], ["center"]])))}
        if with_color:
            ch["rgb"] = np.array(
                [[draw(st.integers(0, 255)) / 255.0 for _ in range(3)]
                 for _ in range(n)]
            )
            ch["alpha"] = np.array(
                [draw(st.integers(0, 255)) / 255.0 for _ in range(n)]
            )
        chunks.append(ch)
    return chunks


@settings(max_examples=20, deadline=None)
@given(_rad_chunks())
def test_rad_roundtrip_any_shape(chunks):
    data = encode_rad(chunks)
    d = read_rad_coarse(data, max_chunks=0)
    total = sum(len(c["center"]) for c in chunks)
    assert d["count"] == total
    want = np.vstack([c["center"] for c in chunks])
    got = d["positions"]
    # f16 carries ~3 decimal digits at this range; 8-bit within a step
    assert np.allclose(got, want, atol=max(1.0, np.ptp(want)) / 250.0)
    mn, mx = rad_bounds(data)
    assert np.all(mn <= want.min(axis=0) + 1e-6 + np.ptp(want) / 250.0)
    assert np.all(mx >= want.max(axis=0) - 1e-6 - np.ptp(want) / 250.0)


@st.composite
def _zones(draw):
    n = draw(st.integers(1, 4))
    out = []
    for z in range(n):
        # disjoint rectangles: one per 40-degree longitude band
        lon0 = -80 + z * 40 + 2
        lat0 = draw(st.integers(-60, 20))
        h = draw(st.integers(5, 30))
        w = draw(st.integers(5, 30))
        out.append({
            "fields": [f"Z{z}/", f"id{z}", "XX", f"zone {z}"],
            "polygon": [(lat0, lon0), (lat0, lon0 + w),
                        (lat0 + h, lon0 + w), (lat0 + h, lon0)],
        })
    return out


@settings(max_examples=20, deadline=None)
@given(_zones(), st.randoms())
def test_zonedetect_roundtrip_rectangles(zones, rng):
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        f.write(encode_zonedetect(zones))
        f.flush()
        db = ZoneDetectDB(f.name)
    for zi, z in enumerate(zones):
        las = [q[0] for q in z["polygon"]]
        los = [q[1] for q in z["polygon"]]
        lat = rng.uniform(min(las) + 1, max(las) - 1)
        lon = rng.uniform(min(los) + 1, max(los) - 1)
        assert db.timezone_id(lat, lon) == f"Z{zi}/id{zi}", (lat, lon)
        # just outside the rectangle → not this zone
        assert db.timezone_id(max(las) + 2.0, lon) != f"Z{zi}/id{zi}"
