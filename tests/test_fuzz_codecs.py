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


# ------------------------------------------------- round-5 codecs -----


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 30), st.integers(1, 30)), min_size=1, max_size=4
    ),
    st.integers(0, 2**31 - 1),
    st.integers(2, 6),
)
def test_gif_roundtrip_any_shape(shapes, seed, n_colors):
    """Every frame shares the canvas size (GIF constraint), palette is
    capped, frame count varies — pixel-exact through palette induction,
    LZW, and sub-block framing."""
    from dronedb_spark.sources.gif import decode_gif_frames, encode_gif

    h, w = shapes[0]
    rng = np.random.RandomState(seed % 2**32)
    frames = [
        (rng.randint(0, n_colors, (h, w, 1)) * (255 // max(n_colors - 1, 1)))
        .repeat(3, axis=2)
        .astype(np.uint8)
        for _ in shapes
    ]
    out = decode_gif_frames(encode_gif(frames))
    assert out.shape == (len(frames), h, w, 4)
    for t, f in enumerate(frames):
        assert np.array_equal(out[t][..., :3], f)
        assert np.all(out[t][..., 3] == 255)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 12), st.integers(1, 2**31 - 1), st.integers(2, 32))
def test_mov_roundtrip_any_count(n_frames, seed, blocks):
    """Frame count and DC-block geometry vary; every sampled frame must
    be byte-identical to the stored JPEG's decode."""
    from dronedb_spark.sources.jpeg import decode_jpeg, encode_jpeg_dc_blocks
    from dronedb_spark.sources.mov import decode_mov_frames, encode_mov_mjpeg, mov_info

    rng = np.random.RandomState(seed % 2**32)
    by, bx = 1 + blocks % 3, 1 + blocks % 4
    frames = [
        encode_jpeg_dc_blocks(rng.randint(-60, 60, (by, bx)), q0=16)
        for _ in range(n_frames)
    ]
    mov = encode_mov_mjpeg(frames, bx * 8, by * 8)
    assert mov_info(mov)["n_frames"] == n_frames
    pick = sorted({0, n_frames // 2, n_frames - 1})
    got = decode_mov_frames(mov, pick)
    for gi, fi in enumerate(pick):
        assert np.array_equal(got[gi], decode_jpeg(frames[fi]))


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 200), st.integers(1, 2**31 - 1), st.booleans())
def test_pnts_roundtrip_any_count(n, seed, with_rgb):
    from dronedb_spark.sources.tiles3d import decode_pnts, encode_pnts

    rng = np.random.RandomState(seed % 2**32)
    pos = rng.randn(n, 3).astype(np.float32)
    rgb = rng.randint(0, 256, (n, 3), dtype=np.uint8) if with_rgb else None
    d = decode_pnts(encode_pnts(pos, rgb))
    assert d["n_points"] == n
    np.testing.assert_array_equal(d["positions"], pos)
    if with_rgb:
        np.testing.assert_array_equal(d["rgb"], rgb)


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 40), st.integers(1, 2**31 - 1),
       st.sampled_from([8, 16, 32]), st.booleans())
def test_waveform_roundtrip_any_count(n, seed, bits, fmt10):
    from dronedb_spark.sources.las import decode_las
    from dronedb_spark.sources.waveform import (
        encode_las14_waveform,
        waveform_metrics,
    )

    rng = np.random.RandomState(seed % 2**32)
    hi = {8: 255, 16: 65535, 32: 2**31}[bits]
    waves = [
        rng.randint(0, hi, rng.randint(1, 50)).astype(
            {8: np.uint8, 16: np.uint16, 32: np.uint32}[bits]
        )
        for _ in range(n)
    ]
    kw = {}
    if fmt10:
        kw["rgb"] = rng.randint(0, 65536, (n, 3))
        kw["nir"] = rng.randint(0, 65536, n)
    blob = encode_las14_waveform(
        x=rng.randn(n), y=rng.randn(n), z=rng.randn(n),
        waveforms=waves, bits_per_sample=bits, **kw,
    )
    d = decode_las(blob)
    assert len(d["x"]) == n
    if n:
        m = waveform_metrics(blob)
        assert m["n_samples"].tolist() == [len(w) for w in waves]
        assert m["energy"].tolist() == [int(w.sum()) for w in waves]
