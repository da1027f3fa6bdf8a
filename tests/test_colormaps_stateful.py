"""Tests: colormap registry/apply parity with applyColormap semantics,
and stateful streaming sessionization."""

from __future__ import annotations

import numpy as np
import pytest

from dronedb_spark.raster.colormaps import COLORMAPS, apply_colormap


def test_colormap_registry_complete():
    # 17 colormaps (vegetation.cpp initColormaps)
    assert len(COLORMAPS) == 17
    for name, lut in COLORMAPS.items():
        assert lut.shape == (256, 4) and lut.dtype == np.uint8


def test_apply_colormap_semantics():
    vals = np.array([[-9999.0, 0.0], [0.5, 1.0]])
    rgba = apply_colormap(vals, "grayscale", 0.0, 1.0)
    assert rgba.shape == (2, 2, 4)
    assert (rgba[0, 0] == 0).all()  # nodata → transparent
    assert tuple(rgba[0, 1]) == (0, 0, 0, 255)  # vmin → black
    assert tuple(rgba[1, 1]) == (255, 255, 255, 255)  # vmax → white
    mid = rgba[1, 0]
    assert 120 <= mid[0] <= 135 and mid[3] == 255


def test_apply_colormap_clamps_and_degenerate_range():
    vals = np.array([-5.0, 5.0])
    rgba = apply_colormap(vals, "rdylgn", 0.0, 1.0)
    assert tuple(rgba[0][:3]) == (215, 48, 39)  # clamped to vmin color
    assert tuple(rgba[1][:3]) == (26, 152, 80)  # clamped to vmax color
    # degenerate range guard: |vmax−vmin| < 1e-10 → range 1
    same = apply_colormap(np.array([0.3]), "rdylgn", 0.3, 0.3)
    assert same[0][3] == 255


def test_discrete_ndvi_steps():
    lut = COLORMAPS["discrete_ndvi"]
    assert tuple(lut[0][:3]) == (139, 0, 0)
    assert tuple(lut[255][:3]) == (0, 100, 0)
    assert tuple(lut[128][:3]) == (255, 215, 0)


@pytest.mark.heavy
def test_stream_sessionize_closes_on_timeout(spark, tmp_path):
    import time

    import pandas as pd

    from dronedb_spark.streaming.stateful import stream_sessionize

    src = str(tmp_path / "stream_src")
    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "ts": pd.to_datetime(["2024-01-01 10:00:00", "2024-01-01 10:00:10", "2024-01-01 10:40:00"]),
                "user_id": [7, 7, 8],
                "event_type": ["click"] * 3,
                "value": [1.0, 2.0, 5.0],
                "props": ["{}"] * 3,
            }
        )
    )
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        stream_sessionize(stream)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        # first batch ingests; session closes after the 30 s processing-time
        # timeout fires on a subsequent (empty) batch
        deadline = time.time() + 90
        rows = []
        while time.time() < deadline:
            rows = spark.sql("SELECT * FROM sessions_test").collect()
            if len(rows) >= 2:
                break
            time.sleep(2)
    finally:
        q.stop()
    by_user = {r["user_id"]: r for r in rows}
    assert 7 in by_user and by_user[7]["n_events"] == 2
    assert by_user[7]["sum_value"] == pytest.approx(3.0)
    assert 8 in by_user and by_user[8]["n_events"] == 1
