"""ZoneDetect geo→timezone resolution (sources/zonedetect.py;
reference timezone.cpp + the capture-time cascade priority 3)."""

from __future__ import annotations

import os

import pytest

from dronedb_spark.sources.zonedetect import (
    ZoneDetectDB,
    encode_zonedetect,
    make_timezone_resolver,
)

REF_DB = "/root/reference/data/timezone21-old.bin"


def _toy_db(tmp_path):
    zones = [
        {"fields": ["Test/", "East", "TE", "Eastland"],
         "polygon": [(0, 0), (0, 40), (30, 40), (30, 0)]},
        {"fields": ["Test/", "Isle", "TI", "Dïamond"],
         "polygon": [(-20, 0), (-10, 10), (0, 0), (-10, -10)]},
    ]
    p = str(tmp_path / "zones.bin")
    with open(p, "wb") as f:
        f.write(encode_zonedetect(zones))
    return p


def test_fixture_roundtrip_and_unicode(tmp_path):
    db = ZoneDetectDB(_toy_db(tmp_path))
    assert db.fields == ["TimezoneIdPrefix", "TimezoneId", "CountryAlpha2", "CountryName"]
    assert db.timezone_id(15, 20) == "Test/East"
    assert db.timezone_id(-10, 5) == "Test/Isle"
    assert db.timezone_id(-15, 8) is None       # outside the diamond
    assert db.timezone_id(60, 60) is None       # no bbox hit at all
    assert db.lookup(-10, 5)["CountryName"] == "Dïamond"  # XOR-0x80 UTF-8


def test_malformed_db_rejected(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"NOPE" + b"\x00" * 64)
    with pytest.raises(ValueError):
        ZoneDetectDB(str(p))


@pytest.mark.skipif(not os.path.exists(REF_DB), reason="reference tz db not present")
def test_world_city_gauntlet():
    db = ZoneDetectDB(REF_DB)
    cases = [
        (46.84, -91.99, "America/Chicago"), (48.8566, 2.3522, "Europe/Paris"),
        (35.68, 139.76, "Asia/Tokyo"), (-33.87, 151.21, "Australia/Sydney"),
        (40.71, -74.0, "America/New_York"), (51.5, -0.12, "Europe/London"),
        (-77.85, 166.67, "Antarctica/McMurdo"), (19.43, -99.13, "America/Mexico_City"),
        (55.75, 37.62, "Europe/Moscow"), (28.61, 77.21, "Asia/Kolkata"),
        (-23.55, -46.63, "America/Sao_Paulo"), (37.77, -122.42, "America/Los_Angeles"),
        (1.35, 103.82, "Asia/Singapore"), (30.04, 31.24, "Africa/Cairo"),
        (-1.29, 36.82, "Africa/Nairobi"), (41.9, 12.5, "Europe/Rome"),
        (39.9, 116.4, "Asia/Shanghai"), (25.2, 55.27, "Asia/Dubai"),
        (-36.85, 174.76, "Pacific/Auckland"), (60.17, 24.94, "Europe/Helsinki"),
        (49.28, -123.12, "America/Vancouver"), (32.08, 34.78, "Asia/Jerusalem"),
        (21.3, -157.85, "Pacific/Honolulu"), (61.22, -149.9, "America/Anchorage"),
    ]
    for lat, lon, want in cases:
        assert db.timezone_id(lat, lon) == want, (lat, lon)
    # open ocean → no zone
    assert db.timezone_id(30.0, -140.0) is None


@pytest.mark.skipif(not os.path.exists(REF_DB), reason="reference tz db not present")
def test_capture_time_geo_resolver_is_dst_correct():
    import calendar

    from dronedb_spark.sources.exif import capture_time_ms, set_geo_timezone_resolver

    set_geo_timezone_resolver(make_timezone_resolver(REF_DB))
    try:
        paris = (48.8566, 2.3522)
        # July: CEST (UTC+2) → 12:00 local = 10:00 UTC
        got = capture_time_ms("2024:07:10 12:00:00", lat=paris[0], lon=paris[1])
        assert got == calendar.timegm((2024, 7, 10, 10, 0, 0, 0, 0, 0)) * 1000
        # January: CET (UTC+1) → 12:00 local = 11:00 UTC
        got = capture_time_ms("2024:01:10 12:00:00", lat=paris[0], lon=paris[1])
        assert got == calendar.timegm((2024, 1, 10, 11, 0, 0, 0, 0, 0)) * 1000
        # GPS stamp still beats the geo lookup (priority 1)
        got = capture_time_ms(
            "2024:07:10 12:00:00",
            gps_datestamp="2024:07:10", gps_timestamp=(9.0, 30.0, 0.0),
            lat=paris[0], lon=paris[1],
        )
        assert got == calendar.timegm((2024, 7, 10, 9, 30, 0, 0, 0, 0)) * 1000
    finally:
        set_geo_timezone_resolver(None)


@pytest.mark.skipif(not os.path.exists(REF_DB), reason="reference tz db not present")
def test_reference_db_structure():
    db = ZoneDetectDB(REF_DB)
    assert db.table_type == "T" and db.precision == 21
    assert len(db.entries) == 1443
    assert "Natural Earth" in db.notice
    # shared-border reference resolution closes every candidate polygon
    # for a point that needs one (Mexico City)
    rec = db.lookup(19.43, -99.13)
    assert rec["CountryAlpha2"] == "MX"
