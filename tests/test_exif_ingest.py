"""EXIF ingest (S5): pure-Python JPEG/TIFF APP1 parsing through the real
distributed ingest path — writer→parser roundtrip, GeoImage upgrade, and
catalog integration over a real-bytes fixture tree."""

from __future__ import annotations

from dronedb_spark.catalog.derive import ENTRY_TYPES
from dronedb_spark.sources.exif import build_jpeg_with_exif, build_plain_jpeg, parse_exif
from dronedb_spark.sources.ingest_check import _expected, _spec, fixture_root


def test_exif_roundtrip_all_fixture_specs():
    for i in range(10):
        s = _spec(i)
        b = build_jpeg_with_exif(**{k: v for k, v in s.items() if k != "path"})
        p = parse_exif(s["path"], b)
        exp = _expected(i)
        assert p["point_lon"] == exp[2] and p["point_lat"] == exp[3]
        assert p["point_alt"] == exp[4] and p["captureTime"] == exp[5]
        assert p["orientation"] == exp[6] and p["focalLength"] == exp[7]
        assert p["make"] == exp[8] and p["model"] == exp[9]
        assert p["width"] == 4000 and p["height"] == 3000


def test_exif_malformed_bytes_never_raise():
    for b in (b"", b"\xff\xd8", b"\xff\xd8\xff\xe1\x00\x04Exif", b"II*\x00\xff\xff\xff\xff",
              build_plain_jpeg()):
        assert parse_exif("x.jpg", b) == {}


def test_catalog_add_extracts_gps_and_upgrades_type(spark):
    from dronedb_spark.catalog.store import DatasetCatalog

    root = fixture_root()
    cat = DatasetCatalog.init(spark, root)
    cat.add()
    by_path = {r["path"]: r for r in cat.entries().collect()}
    img = by_path["flight1/IMG_0004.jpg"]
    assert img["type"] == ENTRY_TYPES["GeoImage"]
    exp = _expected(4)
    assert img["point_lon"] == exp[2] and img["point_lat"] == exp[3]
    assert img["capture_ms"] == exp[5]
    assert by_path["plain.jpg"]["type"] == ENTRY_TYPES["Image"]
    assert by_path["plain.jpg"]["point_lon"] is None
    # cleanup the catalog dir so the fixture tree stays pristine
    import shutil

    shutil.rmtree(f"{root}/.ddb_spark", ignore_errors=True)


def test_register_parser_overrides_default(spark):
    from dronedb_spark.sources import fs

    fs.register_parser(lambda rel, header: {"custom": 1})
    try:
        assert fs._active_parser()("a.jpg", b"") == {"custom": 1}
    finally:
        fs.register_parser(None)
    from dronedb_spark.sources.parse import parse_entry

    assert fs._active_parser() is parse_entry


def test_set_gps_preserves_other_segments_and_props():
    from dronedb_spark.sources.exif import set_gps

    s = _spec(2)
    orig = build_jpeg_with_exif(**{k: v for k, v in s.items() if k != "path"})
    new = set_gps(orig, lat=-33.856784, lon=151.215297, alt=-12.5)
    p = parse_exif("x.jpg", new)
    assert abs(p["point_lat"] - (-33.856784)) < 1e-7
    assert abs(p["point_lon"] - 151.215297) < 1e-7
    assert abs(p["point_alt"] - (-12.5)) < 1e-4
    exp = _expected(2)
    # non-GPS properties survive the APP1 rebuild
    assert p["captureTime"] == exp[5] and p["orientation"] == exp[6]
    assert p["focalLength"] == exp[7] and p["make"] == exp[8] and p["model"] == exp[9]
    # EXIF-less JPEG gains a GPS block; trailing segments stay intact
    from dronedb_spark.sources.exif import build_plain_jpeg

    plain_tagged = set_gps(build_plain_jpeg(), lat=1.5, lon=2.5)
    p2 = parse_exif("y.jpg", plain_tagged)
    assert abs(p2["point_lat"] - 1.5) < 1e-7 and abs(p2["point_lon"] - 2.5) < 1e-7
    assert plain_tagged.endswith(b"\xff\xd9")


def test_catalog_setexif_rewrites_and_reindexes(spark, tmp_path):
    import shutil

    from dronedb_spark.catalog.store import DatasetCatalog

    src = fixture_root()
    root = tmp_path / "setexif_ds"
    shutil.copytree(src, root)
    cat = DatasetCatalog.init(spark, str(root))
    cat.add()
    n = cat.setexif("plain.jpg", lat=47.25, lon=-122.44, alt=30.0)
    assert n == 1
    by_path = {r["path"]: r for r in cat.entries().collect()}
    row = by_path["plain.jpg"]
    assert row["type"] == ENTRY_TYPES["GeoImage"]  # gained GPS → upgraded
    assert abs(row["point_lat"] - 47.25) < 1e-7
    assert abs(row["point_lon"] - (-122.44)) < 1e-7


def test_edit_exif_general_tags_preserved():
    from dronedb_spark.sources.exif import (
        build_jpeg_with_exif, deg_to_dms, edit_exif, parse_exif,
        read_exif_tree, tag_ascii, tag_rational,
    )

    jpeg = build_jpeg_with_exif(
        lat_dms=deg_to_dms(46.84), lat_ref="N",
        lon_dms=deg_to_dms(91.92), lon_ref="W",
        alt=(1200000, 10000), datetime_original="2023:06:01 10:00:00",
        focal=(1026, 100), make="SENSEFLY", model="eBee", width=4608, height=3456,
    )
    before = parse_exif("a.jpg", jpeg)
    out = edit_exif(
        jpeg,
        set_tags={
            ("ifd0", 0x010F): tag_ascii("EDITED"),       # Make: modify
            ("ifd0", 0x013B): tag_ascii("pilot"),        # Artist: add new
            ("exif", 0x920A): tag_rational("<", (2000, 100)),  # focal: 20mm
        },
    )
    after = parse_exif("a.jpg", out)
    # edited tags took; every untouched tag survived the rebuild
    assert after["make"] == "EDITED"
    assert after["focalLength"] == 20.0
    assert after["model"] == "eBee"
    assert after["point_lat"] == before["point_lat"]
    assert after["point_lon"] == before["point_lon"]
    assert after["point_alt"] == before["point_alt"]
    assert after["captureTime"] == before["captureTime"]
    _, tree = read_exif_tree(out)
    assert tree["ifd0"][0x013B][2].rstrip(b"\x00") == b"pilot"
    # removal drops exactly the named tag
    out2 = edit_exif(out, remove_tags=[("gps", 0x0006), ("gps", 0x0005)])
    after2 = parse_exif("a.jpg", out2)
    assert "point_alt" not in after2 and after2["point_lat"] == before["point_lat"]


def test_edit_exif_no_subifds_no_phantom_gps():
    """Regression (ADVICE r3): read_exif_tree initialized exif/gps as ONE
    shared dict, so on a JPEG whose TIFF block has neither sub-IFD,
    setting a tag in the exif IFD also materialized a phantom GPS IFD
    carrying the same tag."""
    import struct

    from dronedb_spark.sources.exif import edit_exif, read_exif_tree, tag_ascii

    # minimal APP1: 'Exif\0\0' + LE TIFF with IFD0 = {Make: "DDB\0"} only
    tiff = bytearray()
    tiff += b"II" + struct.pack("<HI", 42, 8)
    make = b"DDB\x00"  # 4 bytes -> stored inline in the value field
    tiff += struct.pack("<H", 1)
    tiff += struct.pack("<HHI", 0x010F, 2, len(make)) + make
    tiff += struct.pack("<I", 0)  # next-IFD
    payload = b"Exif\x00\x00" + bytes(tiff)
    jpeg = b"\xff\xd8\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload + b"\xff\xd9"

    out = edit_exif(jpeg, set_tags={("exif", 0x9003): tag_ascii("2023:06:01 10:00:00")})
    _, tree = read_exif_tree(out)
    assert 0x9003 in tree["exif"]
    assert tree["gps"] == {}  # no phantom GPS IFD
    assert tree["ifd0"][0x010F][2].rstrip(b"\x00") == b"DDB"


def test_offset_time_parsing_edges():
    from dronedb_spark.sources.exif import _parse_offset_secs, _parse_subsec_ms

    assert _parse_offset_secs("+02:00") == 7200
    assert _parse_offset_secs("-05:30") == -(5 * 3600 + 30 * 60)
    assert _parse_offset_secs("+00:00") == 0
    assert _parse_offset_secs("02:00") is None
    assert _parse_offset_secs("+2:00") is None
    assert _parse_offset_secs(None) is None
    assert _parse_subsec_ms("437") == 437
    assert _parse_subsec_ms("4") == 400      # fractional-second digits, padded
    assert _parse_subsec_ms("43789") == 437  # truncated to ms
    assert _parse_subsec_ms("x") == 0


def test_geo_timezone_resolver_hook():
    from dronedb_spark.sources.exif import capture_time_ms, set_geo_timezone_resolver

    naive = capture_time_ms("2024:06:01 12:00:00", lat=45.0, lon=7.0)
    try:
        set_geo_timezone_resolver(lambda lat, lon: 3600)  # CET-ish
        shifted = capture_time_ms("2024:06:01 12:00:00", lat=45.0, lon=7.0)
        assert shifted == naive - 3600 * 1000
        # no position → resolver unused
        assert capture_time_ms("2024:06:01 12:00:00") == naive
    finally:
        set_geo_timezone_resolver(None)
    assert capture_time_ms("2024:06:01 12:00:00", lat=45.0, lon=7.0) == naive


def test_gps_stamp_beats_offset():
    from dronedb_spark.sources.exif import capture_time_ms
    import calendar

    got = capture_time_ms(
        "2024:03:01 09:00:00",
        gps_datestamp="2024:03:01",
        gps_timestamp=(7.0, 45.0, 30.125),
        offset_time="+02:00",
    )
    assert got == calendar.timegm((2024, 3, 1, 7, 45, 30, 0, 0, 0)) * 1000 + 125


def test_gps_scalar_speed_fallback_units():
    """extractFlightSpeed priority 2 (exif.cpp:709-739): EXIF GPSSpeed +
    GPSSpeedRef in km/h ('K'), mph ('M'), knots ('N'), default km/h."""
    for ref, div in [("K", 3.6), ("M", 2.237), ("N", 1.944), (None, 3.6)]:
        jp = build_jpeg_with_exif(gps_speed=(36, 1), gps_speed_ref=ref)
        p = parse_exif("a.jpg", jp)
        assert p["flightSpeed"] == 36 / div
        assert p["flightSpeed3D"] == 36 / div
        assert p["flightSpeedX"] == 36 / div
        assert p["flightSpeedY"] == 0.0 and p["flightSpeedZ"] == 0.0


def test_gps_scalar_speed_loses_to_xmp_vector():
    jp = build_jpeg_with_exif(
        gps_speed=(36, 1), gps_speed_ref="K",
        xmp={"drone-dji:FlightXSpeed": "3", "drone-dji:FlightYSpeed": "4",
             "drone-dji:FlightZSpeed": "0"},
    )
    p = parse_exif("a.jpg", jp)
    assert p["flightSpeed"] == 5.0  # XMP 3-vector wins over EXIF scalar


def test_gps_accuracy_exif_fallback_and_priority():
    """extractGpsAccuracy priority 3 (exif.cpp:782-798): HPositioningError
    → gpsXYAccuracy, GPSDOP → gpsDop — only when no XMP accuracy."""
    jp = build_jpeg_with_exif(gps_h_pos_error=(5, 2), gps_dop=(3, 2))
    p = parse_exif("a.jpg", jp)
    assert p["gpsXYAccuracy"] == 2.5
    assert p["gpsDop"] == 1.5
    # any XMP accuracy short-circuits the whole EXIF tier (incl. DOP)
    jp2 = build_jpeg_with_exif(
        gps_h_pos_error=(5, 2), gps_dop=(3, 2),
        xmp={"Camera:GPSZAccuracy": "0.08"},
    )
    p2 = parse_exif("a.jpg", jp2)
    assert p2["gpsZAccuracy"] == 0.08
    assert "gpsXYAccuracy" not in p2 and "gpsDop" not in p2
