"""Camera sensor-size resolution — the reference's sensor database
fallback chain (sensor_data.cpp:1-87, exif.cpp:167-232):

  1. FocalPlane EXIF path: sensor_width_mm =
     image_width_px · (1 / FocalPlaneXResolution) · mmPerUnit, and the
     same for height (exif.cpp:194-217);
  2. sensor-DB fallback when the FocalPlane tags are absent: the
     normalized "make model" id is looked up in a ``sensors(id, focal)``
     table — ``focal`` IS the sensor width in mm (sensor_data.cpp:58-80,
     the SQLite file built by data/create_sensor_data.py from the public
     OpenSfM sensor list); height derives as width/img_w·img_h
     (exif.cpp:225-227);
  3. computeFocal (exif.cpp:167-192): FocalLengthIn35mmFilm ⇒
     focal_mm = focal35/36·sensor_w; else FocalLength ⇒
     focal35 = 36·focal/sensor_w.

Spark shape: the sensor table is a FEW-THOUSAND-row dimension →
``F.broadcast`` join on the normalized id; the FocalPlane arithmetic and
the focal algebra are pure column expressions (JVM-side, codegen).  At
100 TB of imagery the lookup stays a broadcast hash join — no shuffle of
the image side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Built-in sensor widths (mm) — the reference's own overlay list
# (data/ddb_sensor_data.json, merged over the OpenSfM base by
# create_sensor_data.py; ids lowercased like the DB convention).
BUILTIN_SENSORS: dict[str, float] = {
    "hasselblad l2d-20c": 17.5,
    "micasense rededge": 4.8,
    "micasense altum": 7.12,
    "parrot sequoia": 4.8,
    "dji m3m": 5.184,
    "dji fc6360": 4.8,
    "sentera 6x": 6.57,
}


def builtin_sensor_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(BUILTIN_SENSORS.items())],
        "sensor_id string, sensor_width_mm double",
    )


def load_sensor_db(spark: SparkSession, sqlite_path: str) -> DataFrame:
    """Read a reference-format ``sensor_data.sqlite`` (one table:
    ``sensors(id TEXT PRIMARY KEY, focal REAL)``) into the dimension
    shape.  The DB is a few thousand rows of metadata — driver-side
    sqlite3 → createDataFrame, same pattern as the S7 catalog reader."""
    import sqlite3

    con = sqlite3.connect(sqlite_path)
    try:
        rows = [(str(i), float(w)) for i, w in con.execute("SELECT id, focal FROM sensors")]
    finally:
        con.close()
    return spark.createDataFrame(rows, "sensor_id string, sensor_width_mm double")


def mm_per_unit(unit_col: Column) -> Column:
    """FocalPlaneResolutionUnit → mm (exif.cpp:236-259); unknown → 0
    (which disables the FocalPlane path, matching the reference)."""
    return (
        F.when(unit_col == 2, F.lit(25.4))
        .when(unit_col == 3, F.lit(10.0))
        .when(unit_col == 4, F.lit(1.0))
        .when(unit_col == 5, F.lit(0.001))
        .otherwise(F.lit(0.0))
    )


# Thermal sensor make/model substring patterns (thermal.cpp:24-39; empty
# model = any camera of that make).
THERMAL_SENSOR_PATTERNS: list[tuple[str, str]] = [
    ("FLIR", ""),
    ("DJI", "H20T"), ("DJI", "ZH20T"), ("DJI", "Zenmuse H20T"),
    ("DJI", "H30T"), ("DJI", "ZH30T"), ("DJI", "Zenmuse H30T"),
    ("DJI", "MAVIC3T"), ("DJI", "M3T"), ("DJI", "Mavic 3T"),
    ("DJI", "Mavic 3 Enterprise"),
    ("Workswell", "WirisProSc"),
    ("MicaSense", "Altum"),
]


def is_thermal_sensor(make: str | None, model: str | None) -> bool:
    """Case-insensitive substring match against the thermal pattern table
    (isThermalImageFromExif, thermal.cpp:40-58)."""
    mk, md = (make or "").lower(), (model or "").lower()
    for pat_make, pat_model in THERMAL_SENSOR_PATTERNS:
        if pat_make.lower() in mk and (not pat_model or pat_model.lower() in md):
            return True
    return False


def sensor_id(make: str | None, model: str | None) -> str:
    """Plain-Python twin of ``sensor_id_expr`` for the per-file ingest
    kernel (extractSensor, exif.cpp:143-165): lowercase, strip the make
    substring out of the model (looped, unless make is "unknown"), trim,
    join with one space."""
    lmake = (make or "unknown").lower()
    lmodel = (model or "").lower()
    if lmake != "unknown":
        while lmake and lmake in lmodel:
            lmodel = lmodel.replace(lmake, "", 1)
    return f"{lmake.strip()} {lmodel.strip()}"


def sensor_id_expr(make: Column, model: Column) -> Column:
    """extractSensor normalization (exif.cpp:143-165): lowercase both,
    strip the make substring out of the model (unless make is
    "unknown"), trim, join with one space.  The C++ loops the removal
    until no occurrence remains; ``F.replace`` removes all existing
    occurrences in one pass — two stacked passes cover the only
    realistic cascade (removal re-creating the make string), and camera
    strings never nest deeper."""
    lmake = F.lower(F.coalesce(make, F.lit("unknown")))
    lmodel = F.lower(F.coalesce(model, F.lit("")))
    stripped = F.replace(F.replace(lmodel, lmake, F.lit("")), lmake, F.lit(""))
    cleaned = F.when(lmake != "unknown", stripped).otherwise(lmodel)
    return F.concat(F.trim(lmake), F.lit(" "), F.trim(cleaned))


def resolve_sensor_size(
    images: DataFrame,
    sensor_db: DataFrame,
    make: str = "make",
    model: str = "model",
    width_px: str = "width",
    height_px: str = "height",
    fp_xres: str = "fp_xres",
    fp_yres: str = "fp_yres",
    fp_unit: str = "fp_unit",
) -> DataFrame:
    """Adds ``sensor_id``, ``sensor_width_mm``, ``sensor_height_mm``
    via the reference's two-step chain.  The DB is broadcast; images
    never shuffle."""
    mmu = mm_per_unit(F.col(fp_unit))
    fp_ok = (
        F.col(fp_xres).isNotNull()
        & F.col(fp_yres).isNotNull()
        & F.col(fp_unit).isNotNull()
        & (mmu != 0.0)
    )
    fp_w = F.col(width_px) * (F.lit(1.0) / F.col(fp_xres)) * mmu
    fp_h = F.col(height_px) * (F.lit(1.0) / F.col(fp_yres)) * mmu
    out = images.withColumn("sensor_id", sensor_id_expr(F.col(make), F.col(model)))
    dim = F.broadcast(
        sensor_db.select(
            F.col("sensor_id").alias("_db_sensor_id"),
            F.col("sensor_width_mm").alias("_db_width_mm"),
        )
    )
    out = out.join(dim, out["sensor_id"] == dim["_db_sensor_id"], "left").drop("_db_sensor_id")
    return (
        out.withColumn(
            "sensor_width_mm",
            F.when(fp_ok, fp_w).otherwise(F.col("_db_width_mm")),
        )
        .withColumn(
            "sensor_height_mm",
            F.when(fp_ok, fp_h).otherwise(
                F.col("_db_width_mm") / F.col(width_px) * F.col(height_px)
            ),
        )
        .drop("_db_width_mm")
    )


def compute_focal(df: DataFrame, focal_mm: str = "focal_mm", focal35: str = "focal35") -> DataFrame:
    """computeFocal (exif.cpp:167-192) on the resolved sensor width:
    whichever of (focal35, focal) is present derives the other.  The
    reference runs this ONLY after extractSensorSize succeeds
    (exif.cpp:171-174) — no sensor width ⇒ both stay unset, even when
    the raw FocalLength tag exists."""
    w = F.col("sensor_width_mm")
    has_w = w.isNotNull()
    has35 = has_w & F.col(focal35).isNotNull() & (F.col(focal35) > 0)
    has_f = has_w & F.col(focal_mm).isNotNull() & (F.col(focal_mm) > 0)
    return df.withColumn(
        "focal_mm_resolved",
        F.when(has35, F.col(focal35) / F.lit(36.0) * w).otherwise(
            F.when(has_f, F.col(focal_mm))
        ),
    ).withColumn(
        "focal35_resolved",
        F.when(has35, F.col(focal35).cast("double")).otherwise(
            F.when(has_f, F.lit(36.0) * F.col(focal_mm) / w)
        ),
    )


# ------------------------------------------------------------------ check

_SN = 12


def _sensor_spec(i: int) -> dict:
    if i % 3 == 0:  # FocalPlane-tag path (exif.cpp:194-217)
        return {
            "kind": "fp",
            "fp_xres": (200000 + i * 7, 13 + (i % 5)),
            "fp_yres": (150000 + i * 11, 17 + (i % 5)),
            "fp_unit": 2 if i % 2 == 0 else 3,
            "make": "DDB", "model": f"CAM{i}",
            "focal": (48 + i, 2), "focal35": None,
        }
    if i % 3 == 1:  # sensor-DB fallback, builtin overlay hit
        mk, md = [
            ("MicaSense", "RedEdge"), ("DJI", "DJI FC6360"),
            ("Parrot", "Sequoia"), ("Hasselblad", "L2D-20c"),
        ][(i // 3) % 4]
        return {"kind": "db", "make": mk, "model": md, "focal": None, "focal35": 24 + i}
    # sensor-DB fallback: sqlite-file hit for odd i, miss otherwise
    return {
        "kind": "sq" if i % 6 == 5 else "miss",
        "make": "Acme", "model": f"Cam{i}", "focal": (50, 1), "focal35": None,
    }


_SQLITE_SENSORS = [("acme cam5", 6.4), ("acme cam11", 7.2)]


def _sensor_fixture() -> tuple[str, str]:
    """(jpeg tree root, sensor_data.sqlite path) — built idempotently."""
    import os
    import sqlite3

    from dronedb_spark.sources.exif import build_jpeg_with_exif

    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "sensor_v1")
    )
    os.makedirs(root, exist_ok=True)
    for i in range(_SN):
        s = _sensor_spec(i)
        kw = {"make": s["make"], "model": s["model"]}
        if s["focal"]:
            kw["focal"] = s["focal"]
        if s["focal35"]:
            kw["focal35"] = s["focal35"]
        if s["kind"] == "fp":
            kw.update(fp_xres=s["fp_xres"], fp_yres=s["fp_yres"], fp_unit=s["fp_unit"])
        payload = build_jpeg_with_exif(**kw)
        p = os.path.join(root, f"IMG_{i:04d}.jpg")
        if not os.path.exists(p) or open(p, "rb").read() != payload:
            with open(p, "wb") as f:
                f.write(payload)
        os.utime(p, (1700000000, 1700000000))

    db = os.path.join(root, "sensor_data.sqlite")
    want = dict(_SQLITE_SENSORS)
    have: dict = {}
    if os.path.exists(db):
        try:
            con = sqlite3.connect(db)
            have = dict(con.execute("SELECT id, focal FROM sensors"))
            con.close()
        except sqlite3.Error:
            os.remove(db)
    if have != want:
        if os.path.exists(db):
            os.remove(db)
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE sensors (id TEXT PRIMARY KEY NOT NULL, focal REAL NOT NULL)")
        con.executemany("INSERT INTO sensors VALUES (?, ?)", _SQLITE_SENSORS)
        con.commit()
        con.close()
    return root, db


def _sensor_expected(i: int) -> tuple:
    """Expected row — the same double arithmetic the column expressions
    perform, so values are bit-identical."""
    s = _sensor_spec(i)
    make, model = s["make"].lower(), s["model"].lower()
    stripped = model.replace(make, "").strip() if make != "unknown" else model
    sid = f"{make} {stripped}"
    w_px, h_px = 4000, 3000
    if s["kind"] == "fp":
        fpx = s["fp_xres"][0] / s["fp_xres"][1]
        fpy = s["fp_yres"][0] / s["fp_yres"][1]
        mmu = 25.4 if s["fp_unit"] == 2 else 10.0
        sw = w_px * (1.0 / fpx) * mmu
        sh = h_px * (1.0 / fpy) * mmu
    elif s["kind"] == "db":
        sw = BUILTIN_SENSORS[sid]
        sh = sw / w_px * h_px
    elif s["kind"] == "sq":
        sw = dict(_SQLITE_SENSORS)[sid]
        sh = sw / w_px * h_px
    else:
        return (f"IMG_{i:04d}.jpg", sid, -1.0, -1.0, -1.0, -1.0)
    if s["focal35"]:
        f35 = float(s["focal35"])
        fmm = s["focal35"] / 36.0 * sw
    else:
        fmm = s["focal"][0] / s["focal"][1]
        f35 = 36.0 * fmm / sw
    return (f"IMG_{i:04d}.jpg", sid, sw, sh, fmm, f35)


def _sensor_oracle() -> str:
    rows = []
    for i in range(_SN):
        p, sid, sw, sh, fmm, f35 = _sensor_expected(i)
        rows.append(f"('{p}', '{sid}', {sw!r}, {sh!r}, {fmm!r}, {f35!r})")
    values = ",\n            ".join(rows)
    return f"""
        SELECT path, sensor_id,
               CAST(sensor_width_mm AS DOUBLE) AS sensor_width_mm,
               CAST(sensor_height_mm AS DOUBLE) AS sensor_height_mm,
               CAST(focal_mm AS DOUBLE) AS focal_mm,
               CAST(focal35 AS DOUBLE) AS focal35
        FROM (VALUES
            {values}) AS t(path, sensor_id, sensor_width_mm, sensor_height_mm,
                           focal_mm, focal35)
        ORDER BY path"""


def _register_check() -> None:
    from dronedb_spark.suite import check

    @check("sensor_size_resolution", oracle=_sensor_oracle())
    def q_sensor_size_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Two-tier sensor chain on REAL EXIF bytes.  Tier 1: the ingest
        kernel itself resolves FocalPlane-tag and builtin-overlay sensors
        (properties sensorWidth/Height, focalLengthComputed,
        focalLength35 — entry.cpp:158-181 parity).  Tier 2: rows the
        kernel could NOT resolve go through the DataFrame broadcast
        lookup against a REAL reference-format sensor_data.sqlite (the
        full-DB deployment shape) + the computeFocal algebra.  Misses pin
        the null path via -1 sentinels."""
        from dronedb_spark.sources.fs import ingest

        root, db = _sensor_fixture()
        ent = ingest(spark, root).filter(F.col("path").endswith(".jpg"))
        base = ent.select(
            "path",
            F.get_json_object("properties", "$.sensor").alias("sensor_id"),
            F.get_json_object("properties", "$.make").alias("make"),
            F.get_json_object("properties", "$.model").alias("model"),
            F.get_json_object("properties", "$.width").cast("int").alias("width"),
            F.get_json_object("properties", "$.height").cast("int").alias("height"),
            F.get_json_object("properties", "$.focalPlaneXResolution")
            .cast("double").alias("fp_xres"),
            F.get_json_object("properties", "$.focalPlaneYResolution")
            .cast("double").alias("fp_yres"),
            F.get_json_object("properties", "$.focalPlaneResolutionUnit")
            .cast("int").alias("fp_unit"),
            F.get_json_object("properties", "$.focalLength").cast("double").alias("focal_mm"),
            F.get_json_object("properties", "$.focalLength35").cast("double").alias("focal35"),
            F.get_json_object("properties", "$.sensorWidth").cast("double").alias("k_sw"),
            F.get_json_object("properties", "$.sensorHeight").cast("double").alias("k_sh"),
            F.get_json_object("properties", "$.focalLengthComputed")
            .cast("double").alias("k_fmm"),
        )
        tier1 = base.filter(F.col("k_sw").isNotNull()).select(
            "path", "sensor_id",
            F.col("k_sw").alias("sensor_width_mm"),
            F.col("k_sh").alias("sensor_height_mm"),
            F.coalesce(F.col("k_fmm"), F.lit(-1.0)).alias("focal_mm"),
            F.coalesce(F.col("focal35"), F.lit(-1.0)).alias("focal35"),
        )
        unresolved = base.filter(F.col("k_sw").isNull()).drop(
            "k_sw", "k_sh", "k_fmm", "sensor_id"
        )
        tier2 = compute_focal(
            resolve_sensor_size(unresolved, load_sensor_db(spark, db))
        ).select(
            "path", "sensor_id",
            F.coalesce(F.col("sensor_width_mm"), F.lit(-1.0)).alias("sensor_width_mm"),
            F.coalesce(F.col("sensor_height_mm"), F.lit(-1.0)).alias("sensor_height_mm"),
            F.coalesce(F.col("focal_mm_resolved"), F.lit(-1.0)).alias("focal_mm"),
            F.coalesce(F.col("focal35_resolved"), F.lit(-1.0)).alias("focal35"),
        )
        return tier1.unionByName(tier2).orderBy("path")


_register_check()
