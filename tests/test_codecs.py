"""Round-trip and metadata tests for the pure-Python format codecs
(PNG, WAV, PLY, LAS, GeoTIFF) and the multi-format default parser."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.sources.las import decode_las, encode_las, las_info
from dronedb_spark.sources.parse import parse_entry
from dronedb_spark.sources.ply import decode_ply, encode_ply
from dronedb_spark.sources.png import decode_png, encode_png, png_info
from dronedb_spark.sources.tiff import decode_tiff, encode_tiff
from dronedb_spark.sources.wav import decode_wav, encode_wav

rng = np.random.RandomState(42)


@pytest.mark.parametrize("shape", [(12, 16), (9, 7, 3), (5, 4, 4), (6, 3, 2)])
def test_png_roundtrip_filter0(shape):
    a = rng.randint(0, 256, shape).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(a)), a)


@pytest.mark.parametrize("filters", [[0, 1, 2, 3, 4], [4, 3, 2, 1, 0], [1], [3], [4]])
def test_png_roundtrip_all_filters(filters):
    a = rng.randint(0, 256, (11, 6, 3)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(a, filters=filters)), a)


def test_png_info():
    a = rng.randint(0, 256, (7, 9, 3)).astype(np.uint8)
    assert png_info(encode_png(a)) == (9, 7, 3)


def test_wav_roundtrip_mono_stereo():
    s = (rng.randn(1000) * 3000).astype(np.int16)
    sr, dec = decode_wav(encode_wav(s, 22050))
    assert sr == 22050 and np.array_equal(dec, s.astype(np.float64))
    st = (rng.randn(500, 2) * 3000).astype(np.int16)
    _, dec2 = decode_wav(encode_wav(st, 8000))
    assert dec2.shape == (500, 2) and np.array_equal(dec2, st.astype(np.float64))


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(binary):
    pts = {
        "x": np.round(rng.randn(400) * 8, 2),  # f4-safe magnitudes
        "y": np.round(rng.randn(400) * 8, 2),
        "z": np.round(rng.rand(400) * 4, 2),
        "intensity": rng.randint(0, 65535, 400).astype(float),
    }
    d = decode_ply(encode_ply(pts, binary=binary, dtypes={"intensity": "ushort"}))
    assert set(d) == {"x", "y", "z", "intensity"}
    atol = 1e-4 if binary else 0.0  # binary stores f4
    assert np.allclose(d["x"], pts["x"], atol=atol)
    assert np.array_equal(d["intensity"], pts["intensity"])


def test_ply_skips_face_element():
    # vertex + face elements; face list records must be skipped cleanly
    pts = {"x": np.array([1.0, 2.0, 3.0]), "y": np.zeros(3), "z": np.zeros(3)}
    blob = encode_ply(pts, binary=False)
    body = blob.decode("ascii")
    body = body.replace(
        "end_header", "element face 1\nproperty list uchar int vertex_indices\nend_header"
    )
    body += "3 0 1 2\n"
    d = decode_ply(body.encode("ascii"))
    assert np.array_equal(d["x"], pts["x"])


def test_las_roundtrip_and_header():
    n = 300
    x = np.round(rng.rand(n) * 1000, 3)
    y = np.round(rng.rand(n) * 1000, 3)
    z = np.round(rng.rand(n) * 100, 3)
    cls = rng.randint(0, 10, n)
    gt = np.sort(rng.rand(n) * 1e5)
    blob = encode_las(x, y, z, classification=cls, gps_time=gt)
    info = las_info(blob)
    assert info["n_points"] == n and info["point_format"] == 1 and not info["compressed"]
    assert abs(info["bounds"][0][0] - x.min()) < 1e-9
    d = decode_las(blob)
    assert np.allclose(d["x"], x, atol=1e-9) and np.allclose(d["z"], z, atol=1e-9)
    assert np.array_equal(d["classification"], cls)
    assert np.allclose(d["gps_time"], gt)


@pytest.mark.parametrize("dt", [np.uint8, np.uint16, np.int16, np.float32, np.float64])
def test_tiff_roundtrip(dt):
    a = (rng.rand(70, 53) * 1000).astype(dt)
    blob = encode_tiff(
        a, pixel_scale=(0.5, 0.5), tiepoint=(100.0, 200.0), nodata=-9999.0, rows_per_strip=16
    )
    dec, geo = decode_tiff(blob)
    assert dec.dtype == a.dtype and np.array_equal(dec, a)
    assert geo["pixel_scale"] == (0.5, 0.5) and geo["nodata"] == -9999.0
    assert geo["tiepoint"] == (100.0, 200.0)


def test_tiff_single_strip_inline_offsets():
    a = (rng.rand(8, 8) * 255).astype(np.uint8)
    dec, geo = decode_tiff(encode_tiff(a, rows_per_strip=64))
    assert np.array_equal(dec, a) and geo["pixel_scale"] is None


def test_parse_entry_dispatch():
    png = encode_png(rng.randint(0, 256, (6, 10, 3)).astype(np.uint8))
    assert parse_entry("a.png", png[:4096]) == {"width": 10, "height": 6, "bands": 3}

    las = encode_las(np.array([1.0, 2.0]), np.array([3.0, 4.0]), np.array([5.0, 6.0]))
    p = parse_entry("b.las", las[:4096])
    assert p["pointCount"] == 2 and p["lasVersion"] == "1.2" and p["maxZ"] == 6.0

    ply = encode_ply({"x": np.arange(5.0), "y": np.zeros(5), "z": np.zeros(5)}, binary=True)
    p = parse_entry("c.ply", ply[:4096])
    assert p["vertexCount"] == 5 and p["dimensions"] == "x,y,z"

    wav = encode_wav((rng.randn(1600) * 100).astype(np.int16), 16000)
    p = parse_entry("d.wav", wav[:4096])
    assert p == {
        "sampleRate": 16000, "channels": 1, "bitsPerSample": 16,
        "sampleCount": 1600, "durationMs": 100,
    }

    tif = encode_tiff(
        (rng.rand(16, 16) * 100).astype(np.float32),
        pixel_scale=(2.0, 2.0), tiepoint=(500.0, 600.0), nodata=0.0,
    )
    p = parse_entry("e.tif", tif[:4096])
    assert p["width"] == 16 and p["pixelScaleX"] == 2.0 and p["noData"] == 0.0
    assert p["tiepointX"] == 500.0

    assert parse_entry("f.txt", b"hello world") == {}


def test_laz_roundtrip_formats_0_and_1():
    import numpy as np

    from dronedb_spark.sources.las import decode_las, encode_las, las_info
    from dronedb_spark.sources.laz import decode_laz, encode_laz

    rng = np.random.RandomState(3)
    n = 2500
    k = np.arange(n)
    x = ((k * 5 + 13) % 100000) * 0.001
    y = ((k * 9 + 31) % 100000) * 0.001
    z = ((k * 3 + 7) % 50000) * 0.001
    cls = (k % 12).astype(np.uint8)
    inten = ((k * 17) % 4096).astype(np.uint16)
    gps = 300000.0 + k * 0.0001

    laz = encode_laz(x, y, z, classification=cls, intensity=inten, gps_time=gps,
                     chunk_size=700)
    las = encode_las(x, y, z, classification=cls, intensity=inten, gps_time=gps)
    got, want = decode_laz(laz), decode_las(las)
    for f in ("x", "y", "z", "intensity", "classification", "gps_time"):
        assert np.array_equal(got[f], want[f]), f
    info = las_info(laz)
    assert info["compressed"] and info["point_format"] == 1 and info["n_points"] == n
    assert len(laz) < len(las) / 3  # actually compresses
    # decode_las dispatches compressed input to the LASzip decoder
    via_las = decode_las(laz)
    assert np.array_equal(via_las["z"], want["z"])


def test_laz_roundtrip_random_walk():
    import numpy as np

    from dronedb_spark.sources.las import decode_las, encode_las
    from dronedb_spark.sources.laz import decode_laz, encode_laz

    rng = np.random.RandomState(11)
    n = 4000
    x = np.cumsum(rng.randint(-500, 500, n)) * 0.001
    y = np.cumsum(rng.randint(-500, 500, n)) * 0.001
    z = np.cumsum(rng.randint(-50, 50, n)) * 0.001
    # gps with resync-forcing jumps (full 64-bit path + sequence switches)
    k = np.arange(n)
    gps = np.where(k % 97 == 0, 1e9 + k * 1000.0, 1e5 + k * 0.0001)
    got = decode_laz(encode_laz(x, y, z, gps_time=gps, chunk_size=900))
    want = decode_las(encode_las(x, y, z, gps_time=gps))
    for f in ("x", "y", "z", "gps_time"):
        assert np.array_equal(got[f], want[f]), f


def test_jpeg_dc_blocks_exact():
    import numpy as np

    from dronedb_spark.sources.jpeg import decode_jpeg, encode_jpeg_dc_blocks, jpeg_info

    dc = np.arange(20).reshape(4, 5) * 5 - 50
    data = encode_jpeg_dc_blocks(dc, q0=16)
    img = decode_jpeg(data)
    want = np.clip(128 + 2 * dc, 0, 255).astype(np.uint8)
    assert np.array_equal(img, np.repeat(np.repeat(want, 8, 0), 8, 1))
    assert jpeg_info(data) == (40, 32, 1)


def test_jpeg_idct_matches_direct_formula():
    """Decoder IDCT (matrix form) vs the textbook O(n^4) double loop."""
    import numpy as np

    from dronedb_spark.sources.jpeg import _A

    rng = np.random.RandomState(5)
    coef = rng.randint(-200, 200, (8, 8)).astype(np.float64)
    fast = _A.T @ coef @ _A
    slow = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            slow[x, y] = s / 4.0
    assert np.allclose(fast, slow, atol=1e-9)


def test_jpeg_roundtrip_color_and_gray():
    import numpy as np

    from dronedb_spark.sources.jpeg import decode_jpeg, encode_jpeg

    g = (np.linspace(0, 255, 56)[None, :] * np.ones((40, 1))).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(g))
    assert d.shape == g.shape
    assert float(np.sqrt(np.mean((d.astype(float) - g.astype(float)) ** 2))) < 3.0

    c = np.zeros((33, 49, 3), np.uint8)
    c[..., 0] = np.linspace(0, 255, 49)[None, :]
    c[..., 1] = np.linspace(0, 255, 33)[:, None]
    c[..., 2] = 128
    for ss in (False, True):
        d = decode_jpeg(encode_jpeg(c, subsample=ss))
        assert d.shape == c.shape
        rmse = float(np.sqrt(np.mean((d.astype(float) - c.astype(float)) ** 2)))
        assert rmse < 6.0, (ss, rmse)


def test_mp4_info_roundtrip():
    from dronedb_spark.sources.mp4 import encode_mp4_stub, mp4_info

    info = mp4_info(encode_mp4_stub(12.5, 1920, 1080, n_audio_tracks=2))
    assert info["duration_s"] == 12.5
    assert (info["width"], info["height"]) == (1920, 1080)
    assert info["n_tracks"] == 3 and info["brand"] == "isom"

    import pytest

    with pytest.raises(ValueError):
        mp4_info(b"\x00\x00\x00\x08ftypisom")  # ftyp only, no moov


def test_spz_and_3tz_probes():
    import pytest

    from dronedb_spark.sources.splat import encode_3tz, encode_spz, spz_info, tz3_info

    spz = encode_spz(num_points=4321, sh_degree=3)
    info = spz_info(spz)
    assert info["numPoints"] == 4321 and info["shDegree"] == 3 and info["version"] == 2
    # header probe works on a 4 KiB stream prefix (the ingest window)
    assert spz_info(spz[:4096])["numPoints"] == 4321

    tz = encode_3tz(geometric_error=24.0, n_children=3)
    info = tz3_info(tz)
    assert info == {"tilesetVersion": "1.1", "geometricError": 24.0, "nChildren": 3}
    # stream-prefix parse (no central directory in the window)
    assert tz3_info(tz[:4096])["nChildren"] == 3

    with pytest.raises(ValueError):
        spz_info(b"\x00\x01")
    with pytest.raises(ValueError):
        tz3_info(b"nope")


def test_kml_parse_and_kmz():
    import io
    import zipfile

    from dronedb_spark.sources.kml import parse_kml

    doc = (
        '<?xml version="1.0"?><kml xmlns="http://www.opengis.net/kml/2.2">'
        "<Document><Placemark><name>a</name>"
        "<Point><coordinates>-120.5,45.25,0</coordinates></Point></Placemark>"
        "<Placemark><name>b</name><ExtendedData>"
        '<Data name="k"><value>1</value></Data></ExtendedData>'
        "<Polygon><outerBoundaryIs><LinearRing><coordinates>"
        "0,0 1,0 1,1 0,1 0,0</coordinates></LinearRing></outerBoundaryIs></Polygon>"
        "</Placemark></Document></kml>"
    ).encode()
    pms = parse_kml(doc)
    assert [p["geom_type"] for p in pms] == ["Point", "Polygon"]
    assert pms[0]["points"] == [(-120.5, 45.25)]
    assert pms[1]["n_props"] == 1 and len(pms[1]["points"]) == 5

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("doc.kml", doc)
    assert [p["name"] for p in parse_kml(buf.getvalue())] == ["a", "b"]


def test_mvt_pbf_roundtrip_bytes():
    from dronedb_spark.functions.mvt import decode_tile_pbf, encode_tile_pbf

    feats = [
        {"fid": 7, "u": 0, "v": 4095, "geom_type": "Polygon"},
        {"fid": 2, "u": 300, "v": 17, "geom_type": "Point"},
        {"fid": 1023, "u": 2048, "v": 2048, "geom_type": "LineString"},
    ]
    pbf = encode_tile_pbf("vec1/parcels", feats)
    got = sorted(decode_tile_pbf(pbf), key=lambda f: f["fid"])
    assert [f["fid"] for f in got] == [2, 7, 1023]
    assert got[1]["u"] == 0 and got[1]["v"] == 4095
    assert got[0]["geom_type"] == "Point" and got[2]["geom_type"] == "LineString"
    assert all(f["layer"] == "vec1/parcels" and f["extent"] == 4096 for f in got)


def test_laz_roundtrip_rgb_formats_2_and_3():
    import numpy as np

    from dronedb_spark.sources.las import decode_las, encode_las
    from dronedb_spark.sources.laz import decode_laz, encode_laz

    rng = np.random.RandomState(9)
    n = 2000
    k = np.arange(n)
    x = np.cumsum(rng.randint(-300, 300, n)) * 0.001
    y = np.cumsum(rng.randint(-300, 300, n)) * 0.001
    z = np.cumsum(rng.randint(-40, 40, n)) * 0.001
    gps = 1e5 + np.cumsum(np.abs(rng.randn(n)) * 1e-4)
    rgb = np.zeros((n, 3), np.uint16)
    rgb[:, 0] = (k * 97) % 65536
    # grayscale runs exercise the sym bit-6 short path
    rgb[:, 1] = np.where(k % 11 == 0, rgb[:, 0], (k * 53 + 1000) % 65536)
    rgb[:, 2] = np.where(k % 11 == 0, rgb[:, 0], (k * 29 + 7) % 65536)

    for kwargs in (dict(rgb=rgb), dict(gps_time=gps, rgb=rgb)):
        got = decode_laz(encode_laz(x, y, z, chunk_size=800, **kwargs))
        want = decode_las(encode_las(x, y, z, **kwargs))
        assert set(got) == set(want)
        for f in want:
            assert np.array_equal(got[f], want[f]), f


def test_laz_roundtrip_property():
    """Property-style fuzz: random walks + random colors/classes must
    round-trip bit-exactly through the LASzip codec at any chunk size."""
    import numpy as np

    from dronedb_spark.sources.las import decode_las, encode_las
    from dronedb_spark.sources.laz import decode_laz, encode_laz

    for seed in range(5):
        rng = np.random.RandomState(100 + seed)
        n = int(rng.randint(1, 1500))
        x = np.cumsum(rng.randint(-10**6, 10**6, n)) * 0.001
        y = np.cumsum(rng.randint(-10**6, 10**6, n)) * 0.001
        z = np.cumsum(rng.randint(-10**4, 10**4, n)) * 0.001
        cls = rng.randint(0, 256, n).astype(np.uint8)
        inten = rng.randint(0, 65536, n).astype(np.uint16)
        gps = rng.rand(n) * 1e9 - 5e8  # wild jumps: full-resync path
        rgb = rng.randint(0, 65536, (n, 3)).astype(np.uint16)
        chunk = int(rng.choice([1, 7, 100, 50000]))
        got = decode_laz(
            encode_laz(x, y, z, classification=cls, intensity=inten,
                       gps_time=gps, rgb=rgb, chunk_size=chunk)
        )
        want = decode_las(
            encode_las(x, y, z, classification=cls, intensity=inten,
                       gps_time=gps, rgb=rgb)
        )
        for f in want:
            assert np.array_equal(got[f], want[f]), (seed, f, chunk)


def test_tiff_compression_variants():
    import numpy as np

    from dronedb_spark.sources.tiff import _lzw_decode, _lzw_encode, decode_tiff, encode_tiff

    base = (np.arange(40 * 50, dtype=np.uint16).reshape(40, 50) * 37) % 7919
    fl = (base * 0.25).astype(np.float32)
    for comp in ("none", "deflate", "lzw"):
        for pred in (False, True):
            data = encode_tiff(
                base, pixel_scale=(0.5, 0.5), tiepoint=(100.0, 200.0),
                rows_per_strip=16, compression=comp, predictor=pred,
            )
            arr, geo = decode_tiff(data)
            assert np.array_equal(arr, base), (comp, pred)
            assert geo["pixel_scale"] == (0.5, 0.5)
        arr, _ = decode_tiff(encode_tiff(fl, compression=comp))
        assert np.array_equal(arr, fl), comp
    # LZW fuzz incl. the table-reset path (low-entropy long input)
    rng = np.random.RandomState(3)
    for payload in (
        bytes(rng.randint(0, 256, 30000, dtype=np.uint8)),
        bytes(rng.randint(0, 4, 50000, dtype=np.uint8)),
        b"", b"a", b"ab" * 5000,
    ):
        assert _lzw_decode(_lzw_encode(payload)) == payload


def test_png_palette_decode():
    import struct
    import zlib

    import numpy as np

    from dronedb_spark.sources.png import decode_png, png_info

    # hand-build a palette PNG: 4x3, PLTE with 5 colors
    w, h = 4, 3
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30], [200, 200, 0]],
        dtype=np.uint8,
    )
    idx = np.array([[0, 1, 2, 3], [4, 3, 2, 1], [0, 0, 4, 4]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)  # filter 0 rows

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette.tobytes())
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    img = decode_png(data)
    assert img.shape == (3, 4, 3)
    assert np.array_equal(img, palette[idx])
    assert png_info(data) == (4, 3, 3)


def test_wav_float_and_deep_pcm():
    import struct

    import numpy as np

    from dronedb_spark.sources.wav import decode_wav

    def wav(fmt_code: int, bits: int, payload: bytes, ch: int = 1, sr: int = 8000) -> bytes:
        fmt = struct.pack("<HHIIHH", fmt_code, ch, sr, sr * ch * bits // 8,
                          ch * bits // 8, bits)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(payload)) + payload
        return b"RIFF" + struct.pack("<I", len(body)) + body

    # IEEE float32
    f = np.array([0.5, -0.25, 1.0, -1.0], dtype=np.float32)
    sr, arr = decode_wav(wav(3, 32, f.tobytes()))
    assert sr == 8000 and np.array_equal(arr, f.astype(np.float64))
    # 24-bit PCM (incl. negative values: sign extension)
    vals = [0, 1, -1, 8388607, -8388608, 123456]
    payload = b"".join(int(v).to_bytes(3, "little", signed=True) for v in vals)
    _, arr = decode_wav(wav(1, 24, payload))
    assert arr.tolist() == [float(v) for v in vals]
    # 32-bit PCM
    i = np.array([0, 2**31 - 1, -(2**31), 7], dtype=np.int32)
    _, arr = decode_wav(wav(1, 32, i.tobytes()))
    assert np.array_equal(arr, i.astype(np.float64))


def test_png_16bit_roundtrip():
    import numpy as np

    from dronedb_spark.sources.png import decode_png, encode_png, png_info

    dem = ((np.arange(24 * 40).reshape(24, 40) * 2749) % 60001).astype(np.uint16)
    data = encode_png(dem, filters=[0, 1, 2, 3, 4])
    out = decode_png(data)
    assert out.dtype == np.uint16 and np.array_equal(out, dem)
    assert png_info(data) == (40, 24, 1)

    rgb = ((np.arange(12 * 16 * 3).reshape(12, 16, 3) * 977) % 65536).astype(np.uint16)
    out = decode_png(encode_png(rgb, filters=[4, 3, 2, 1, 0]))
    assert out.dtype == np.uint16 and np.array_equal(out, rgb)


def test_laz_extra_bytes_item():
    import numpy as np

    from dronedb_spark.sources.laz import decode_laz, encode_laz

    rng = np.random.RandomState(21)
    n = 1500
    x = np.cumsum(rng.randint(-300, 300, n)) * 0.001
    y = np.cumsum(rng.randint(-300, 300, n)) * 0.001
    z = np.cumsum(rng.randint(-40, 40, n)) * 0.001
    extra = rng.randint(0, 256, (n, 5)).astype(np.uint8)
    d = decode_laz(encode_laz(x, y, z, extra=extra, chunk_size=600))
    assert np.array_equal(d["extra_bytes"], extra)
    # plus RGB + GPS in the same record
    rgb = rng.randint(0, 65536, (n, 3)).astype(np.uint16)
    gps = 1e5 + np.arange(n) * 1e-4
    d = decode_laz(encode_laz(x, y, z, gps_time=gps, rgb=rgb, extra=extra))
    assert np.array_equal(d["extra_bytes"], extra)
    assert np.array_equal(d["blue"], rgb[:, 2].astype(np.int64))
