"""Sensor-DB resolution unit coverage + integration into the footprint
kernel: a no-FocalPlane image resolves its sensor size from the
dimension table and produces a real ground footprint."""

from __future__ import annotations

from pyspark.sql import functions as F

from dronedb_spark.functions.footprint import footprint_udf
from dronedb_spark.sources.sensors import (
    builtin_sensor_df,
    compute_focal,
    resolve_sensor_size,
    sensor_id_expr,
)


def test_sensor_id_normalization(spark):
    df = spark.createDataFrame(
        [
            ("DJI", "DJI FC6360"),
            ("MicaSense", "RedEdge"),
            ("unknown", "Widget unknown"),
            (None, "Orphan"),
        ],
        "make string, model string",
    ).select(sensor_id_expr(F.col("make"), F.col("model")).alias("sid"))
    assert [r.sid for r in df.collect()] == [
        "dji fc6360",
        "micasense rededge",
        # make == "unknown" ⇒ model NOT stripped (exif.cpp:150)
        "unknown widget unknown",
        "unknown orphan",
    ]


def test_no_focalplane_image_gets_footprint(spark):
    img = spark.createDataFrame(
        [("p1", "MicaSense", "RedEdge", 4000, 3000, None, None, None, None, 8)],
        "path string, make string, model string, width int, height int, "
        "fp_xres double, fp_yres double, fp_unit int, focal_mm double, focal35 int",
    )
    out = compute_focal(resolve_sensor_size(img, builtin_sensor_df(spark)))
    row = out.collect()[0]
    assert row.sensor_width_mm == 4.8
    assert row.sensor_height_mm == 4.8 / 4000 * 3000
    assert row.focal_mm_resolved == 8 / 36.0 * 4.8

    fp = footprint_udf()
    ringed = out.select(
        fp(
            F.col("sensor_width_mm"), F.col("sensor_height_mm"),
            F.col("focal_mm_resolved"),
            F.lit(46.84), F.lit(-91.92), F.lit(300.0), F.lit(100.0),
            F.lit(15.0), F.lit(-90.0), F.lit(0.0),
        ).alias("ring")
    ).collect()[0]
    ring = ringed.ring
    assert ring is not None and len(ring) == 5
    assert ring[0] == ring[-1]
    # ~nadir at 100 m AGL with a wide sensor: footprint within ~2 km of center
    for p in ring:
        assert abs(p["lat"] - 46.84) < 0.02 and abs(p["lon"] + 91.92) < 0.03


def test_focalplane_path_beats_db(spark):
    # FocalPlane tags present ⇒ DB ignored even when the id would hit
    img = spark.createDataFrame(
        [("p1", "MicaSense", "RedEdge", 4000, 3000, 800.0, 900.0, 3, 5.5, None)],
        "path string, make string, model string, width int, height int, "
        "fp_xres double, fp_yres double, fp_unit int, focal_mm double, focal35 int",
    )
    row = compute_focal(resolve_sensor_size(img, builtin_sensor_df(spark))).collect()[0]
    assert row.sensor_width_mm == 4000 * (1.0 / 800.0) * 10.0
    assert row.sensor_height_mm == 3000 * (1.0 / 900.0) * 10.0
    assert row.focal_mm_resolved == 5.5
    assert row.focal35_resolved == 36.0 * 5.5 / row.sensor_width_mm


def test_thermal_sensor_detection():
    from dronedb_spark.sources.sensors import is_thermal_sensor

    assert is_thermal_sensor("FLIR Systems", "Vue Pro")   # any FLIR
    assert is_thermal_sensor("DJI", "ZH20T")
    assert is_thermal_sensor("dji", "mavic 3t")           # case-insensitive
    assert is_thermal_sensor("MicaSense", "Altum")
    assert not is_thermal_sensor("DJI", "FC6360")
    assert not is_thermal_sensor("MicaSense", "RedEdge")
    assert not is_thermal_sensor(None, None)


def test_thermal_category_in_ingest(spark, tmp_path):
    from dronedb_spark.sources.exif import build_jpeg_with_exif, parse_exif

    data = build_jpeg_with_exif(make="DJI", model="ZH20T")
    props = parse_exif("t.jpg", data)
    assert props.get("sensorCategory") == "thermal"
    props2 = parse_exif("n.jpg", build_jpeg_with_exif(make="DJI", model="FC6360"))
    assert "sensorCategory" not in props2
