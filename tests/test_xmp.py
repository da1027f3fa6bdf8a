"""XMP packet parsing unit coverage: element-form packets, namespace
normalization, key priorities, malformed input."""

from __future__ import annotations

from dronedb_spark.sources.xmp import (
    build_xmp_jpeg_segment,
    camera_orientation,
    extract_xmp_packet,
    flight_speed,
    gps_accuracy,
    parse_xmp,
    rel_altitude,
)


def test_attribute_and_element_forms():
    xml = (
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#">'
        '<rdf:Description rdf:about="" xmlns:drone-dji="http://www.dji.com/drone-dji/1.0/"'
        ' drone-dji:GimbalYawDegree="+12.5">'
        "<drone-dji:RelativeAltitude>+55.3</drone-dji:RelativeAltitude>"
        "</rdf:Description></rdf:RDF></x:xmpmeta>"
    )
    d = parse_xmp(xml)
    assert d["drone-dji:GimbalYawDegree"] == "+12.5"
    assert d["drone-dji:RelativeAltitude"] == "+55.3"
    assert rel_altitude(d) == 55.3


def test_orientation_priorities_and_defaults():
    # DJI keys beat Camera keys
    d = {
        "drone-dji:GimbalPitchDegree": "-89.9",
        "drone-dji:GimbalYawDegree": "100",
        "drone-dji:GimbalRollDegree": "1",
        "Camera:Pitch": "-10", "Camera:Yaw": "0", "Camera:Roll": "0",
    }
    assert camera_orientation(d) == (-89.9, 100.0, 1.0, True)
    # FlightYawDegree fills a missing gimbal yaw
    d2 = {
        "drone-dji:GimbalPitchDegree": "-90",
        "drone-dji:FlightYawDegree": "33",
        "drone-dji:GimbalRollDegree": "0",
    }
    assert camera_orientation(d2) == (-90.0, 33.0, 0.0, True)
    # any missing component → nadir defaults
    assert camera_orientation({"drone-dji:GimbalYawDegree": "5"}) == (-90.0, 0.0, 0.0, False)
    assert camera_orientation({}) == (-90.0, 0.0, 0.0, False)


def test_accuracy_pix4d_beats_rtk():
    d = {
        "Camera:GPSXYAccuracy": "0.05", "Camera:GPSZAccuracy": "0.08",
        "drone-dji:RtkStdLon": "0.5", "drone-dji:RtkStdLat": "0.6",
    }
    assert gps_accuracy(d) == {"gpsXYAccuracy": 0.05, "gpsZAccuracy": 0.08}
    # RTK combine is the planar vector norm (exif.cpp:768-771): 3-4-5
    d2 = {"drone-dji:RtkStdLon": "0.03", "drone-dji:RtkStdLat": "0.04",
          "drone-dji:RtkStdHgt": "0.04"}
    assert gps_accuracy(d2) == {"gpsXYAccuracy": 0.05, "gpsZAccuracy": 0.04}


def test_flight_speed_requires_all_axes():
    assert flight_speed({"drone-dji:FlightXSpeed": "1"}) is None
    assert flight_speed(
        {"drone-dji:FlightXSpeed": "3", "drone-dji:FlightYSpeed": "4",
         "drone-dji:FlightZSpeed": "0"}
    ) == (3.0, 4.0, 0.0)


def test_segment_roundtrip_and_malformed():
    seg = build_xmp_jpeg_segment({"drone-dji:GimbalYawDegree": "+7.0"})
    jpeg = b"\xff\xd8" + seg + b"\xff\xd9"
    text = extract_xmp_packet(jpeg)
    assert text is not None
    assert parse_xmp(text)["drone-dji:GimbalYawDegree"] == "+7.0"
    assert extract_xmp_packet(b"\x00\x01") is None
    assert parse_xmp("<not-xml") == {}


def test_panorama_props_defaults_and_gpano(spark=None):
    from dronedb_spark.sources.exif import build_jpeg_with_exif, parse_exif

    # aspect >= 2 without GPano → equirectangular full-frame defaults
    p = parse_exif("p.jpg", build_jpeg_with_exif(width=8000, height=2000))
    assert p["projectionType"] == "equirectangular"
    assert (p["croppedWidth"], p["croppedHeight"], p["croppedX"], p["croppedY"]) == (
        8000, 2000, 0, 0,
    )
    # GPano overrides
    p2 = parse_exif(
        "p2.jpg",
        build_jpeg_with_exif(
            width=6000, height=3000,
            xmp={
                "GPano:ProjectionType": "cylindrical",
                "GPano:CroppedAreaImageWidthPixels": "5000",
                "GPano:CroppedAreaImageHeightPixels": "2500",
                "GPano:CroppedAreaLeftPixels": "500",
                "GPano:CroppedAreaTopPixels": "250",
                "GPano:PoseHeadingDegrees": "123.5",
            },
        ),
    )
    assert p2["projectionType"] == "cylindrical"
    assert (p2["croppedWidth"], p2["croppedHeight"]) == (5000, 2500)
    assert (p2["croppedX"], p2["croppedY"]) == (500, 250)
    assert p2["poseHeading"] == 123.5
    # normal aspect → no pano props
    p3 = parse_exif("n.jpg", build_jpeg_with_exif(width=4000, height=3000))
    assert "projectionType" not in p3


def test_gps_coordinates_scanner_quirks():
    from dronedb_spark.sources.mp4 import parse_gps_coordinates

    assert parse_gps_coordinates("+46.839139-91.999828+25.700") == (
        46.839139, -91.999828, 25.7,
    )
    assert parse_gps_coordinates("+10.5-20.25") == (10.5, -20.25, None)
    # extra components ignored (reference logs and drops them)
    assert parse_gps_coordinates("+1+2+3+4") == (1.0, 2.0, 3.0)
    assert parse_gps_coordinates("46.8-91.9") is None  # must start with +/-
    assert parse_gps_coordinates("") is None
    assert parse_gps_coordinates("+abc-def") is None


def test_rjpeg_extraction_edges():
    import numpy as np

    from dronedb_spark.sources.rjpeg import (
        encode_rjpeg,
        extract_raw_thermal,
        thermal_calibration,
    )

    raw = (np.arange(160 * 120) % 77 * 256 + 5120).astype("<u2").reshape(120, 160)
    got = extract_raw_thermal(encode_rjpeg(raw, {"FLIR:RawThermalImageWidth": "160",
                                                 "FLIR:RawThermalImageHeight": "120"}))
    assert got is not None
    arr, w, h = got
    assert (w, h) == (160, 120)
    assert (arr == raw).all()
    # no FLIR segment → None
    assert extract_raw_thermal(b"\xff\xd8\xff\xd9") is None
    # calibration priority: FLIR keys set valid; DJI fallback; make default
    c = thermal_calibration({"FLIR:PlanckR1": "17000", "FLIR:PlanckB": "1430"})
    assert c["valid"] and c["r1"] == 17000.0 and c["b"] == 1430.0
    c2 = thermal_calibration({"drone-dji:ThermalObjectEmissivity": "0.9"})
    assert c2["valid"] and c2["emissivity"] == 0.9
    c3 = thermal_calibration({}, make="FLIR Systems", model="Vue")
    assert c3["valid"]
    assert not thermal_calibration({}, make="DJI", model="FC6360")["valid"]
