"""Sensor profiles — band semantics, detection, and render presets
(reference: sensorprofile.cpp + data/sensor-profiles.json, the public
dronedb.app sensor-profiles-v1.0 schema).

A profile describes a multispectral sensor: detection rules (band
count, data type, metadata substring patterns, priority), the band
table (index, name, wavelength, domain), and presets — either a
BandMapping composite ("r,g,b" indices) or an index formula that
delegates to the engine's formula registry (``functions/formulas.py``).

Matching follows SensorProfileManager: profiles sort by descending
priority and the first whose detection rules all pass wins — bandCount
must equal, dataType (when given) must equal, and ANY metadataPattern
substring may match the dataset's metadata string.

The builtin list restates two entries of the reference's public data
file (Sentinel-2 L2A and a 5-band MicaSense-class profile); a full
``sensor-profiles.json`` loads with ``load_profiles``.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class BandMapping:
    r: int
    g: int
    b: int

    @classmethod
    def parse(cls, s: str) -> "BandMapping":
        """Accept both '4-3-2' and '4,3,2' (BandMapping::Parse)."""
        sep = "," if "," in s else "-"
        vals = [int(t) for t in s.split(sep) if t]
        if len(vals) < 3:
            raise ValueError(f"band mapping needs 3 indices: {s!r}")
        return cls(vals[0], vals[1], vals[2])

    def to_internal(self) -> str:
        return f"{self.r}-{self.g}-{self.b}"

    def to_api(self) -> str:
        return f"{self.r},{self.g},{self.b}"


@dataclass
class Preset:
    id: str
    kind: str                     # "bands" | "index"
    band_mapping: BandMapping | None = None
    formula: str | None = None    # formula registry id (NDVI, NDRE, ...)
    colormap: str | None = None
    is_default: bool = False


@dataclass
class SensorProfile:
    id: str
    name: str
    sensor_category: str
    band_count: int
    data_type: str | None
    metadata_patterns: list[str]
    priority: int
    bands: list[dict] = field(default_factory=list)
    presets: list[Preset] = field(default_factory=list)

    def preset(self, preset_id: str) -> Preset:
        for p in self.presets:
            if p.id == preset_id:
                return p
        raise KeyError(preset_id)

    def default_preset(self) -> Preset:
        for p in self.presets:
            if p.is_default:
                return p
        return self.presets[0]


def _mk(id, name, cat, n, dt, pats, prio, bands, presets):
    return SensorProfile(id, name, cat, n, dt, pats, prio, bands, presets)


BUILTIN_PROFILES: list[SensorProfile] = [
    _mk(
        "sentinel-2", "Sentinel-2 MSI", "multispectral", 13, "UInt16",
        ["Sentinel-2", "S2A_", "S2B_", "SENTINEL2"], 10,
        [{"index": 4, "name": "Red", "wavelength": 665},
         {"index": 3, "name": "Green", "wavelength": 560},
         {"index": 2, "name": "Blue", "wavelength": 490},
         {"index": 8, "name": "NIR", "wavelength": 842}],
        [
            Preset("true-color", "bands", BandMapping(4, 3, 2), is_default=True),
            Preset("false-color-ir", "bands", BandMapping(8, 4, 3)),
            Preset("ndvi", "index", formula="NDVI", colormap="rdylgn"),
            Preset("ndwi", "index", formula="NDWI", colormap="bugn"),
        ],
    ),
    _mk(
        "micasense-5band", "MicaSense RedEdge-class (5 band)", "multispectral",
        5, None, ["MicaSense", "RedEdge", "Altum"], 5,
        [{"index": 1, "name": "Red"}, {"index": 2, "name": "Green"},
         {"index": 3, "name": "Blue"}, {"index": 4, "name": "NIR"},
         {"index": 5, "name": "Red Edge"}],
        [
            Preset("true-color", "bands", BandMapping(1, 2, 3), is_default=True),
            Preset("cir", "bands", BandMapping(4, 1, 2)),
            Preset("ndvi", "index", formula="NDVI", colormap="rdylgn"),
            Preset("ndre", "index", formula="NDRE", colormap="rdylgn"),
        ],
    ),
]


def load_profiles(path: str) -> list[SensorProfile]:
    """Read a reference-format ``sensor-profiles.json``."""
    with open(path) as f:
        root = json.load(f)
    out = []
    for pj in root.get("profiles", []):
        det = pj.get("detection", {})
        presets = []
        for qj in pj.get("presets", []):
            kind = qj.get("type", "bands")
            bm = qj.get("bandMapping")
            presets.append(
                Preset(
                    qj["id"],
                    "index" if kind == "index" else "bands",
                    BandMapping(bm["r"], bm["g"], bm["b"]) if bm else None,
                    qj.get("formula"),
                    qj.get("colormap"),
                    bool(qj.get("isDefault")),
                )
            )
        out.append(
            SensorProfile(
                pj["id"], pj.get("name", pj["id"]),
                pj.get("sensorCategory", "multispectral"),
                det.get("bandCount", 0), det.get("dataType"),
                det.get("metadataPatterns", []), det.get("priority", 0),
                pj.get("bands", []), presets,
            )
        )
    return out


def match_profile(
    band_count: int,
    data_type: str | None = None,
    metadata: str = "",
    profiles: list[SensorProfile] | None = None,
) -> SensorProfile | None:
    """Highest-priority profile whose detection rules all pass."""
    cands = sorted(profiles or BUILTIN_PROFILES, key=lambda p: -p.priority)
    for p in cands:
        if p.band_count and p.band_count != band_count:
            continue
        if p.data_type and data_type and p.data_type != data_type:
            continue
        if p.metadata_patterns and metadata:
            if not any(pat.lower() in metadata.lower() for pat in p.metadata_patterns):
                continue
        elif p.metadata_patterns and not metadata:
            continue
        return p
    return None


def apply_preset(pixels, profile: SensorProfile, preset_id: str, band_cols: list[str]):
    """Preset → DataFrame projection: a ``bands`` preset selects the
    mapped (r, g, b) columns; an ``index`` preset delegates to the
    formula registry (colormap rendering is the LUT stage in
    ``raster/colormaps.py``).  ``band_cols`` maps band index i →
    column name band_cols[i-1]."""
    from pyspark.sql import functions as F

    from dronedb_spark.functions.formulas import apply_formula

    p = profile.preset(preset_id)
    if p.kind == "bands":
        bm = p.band_mapping
        return pixels.select(
            "row", "col",
            F.col(band_cols[bm.r - 1]).alias("r"),
            F.col(band_cols[bm.g - 1]).alias("g"),
            F.col(band_cols[bm.b - 1]).alias("b"),
        )
    return pixels.select(
        "row", "col", apply_formula(pixels, p.formula).alias("value")
    )


# ------------------------------------------------------------------ check


def _register_check() -> None:
    from pyspark.sql import DataFrame, SparkSession
    from pyspark.sql import functions as F

    from dronedb_spark.raster.synth import ms_sql
    from dronedb_spark.suite import check

    _ORACLE = f"""
        WITH px AS ({ms_sql("duckdb")}),
        f AS (SELECT CASE WHEN R = -9999.0 THEN NULL
                          WHEN abs(N + R) < 1e-10 THEN NULL
                          ELSE (N - R) / (N + R) END AS ndvi FROM px)
        SELECT kind, key, sval, dval FROM (VALUES
            ('match', 'micasense', 'micasense-5band', -1.0),
            ('match', 'sentinel', 'sentinel-2', -1.0),
            ('match', 'gopro', 'none', -1.0),
            ('mapping', 'micasense-default', '1-2-3', -1.0),
            ('mapping', 'sentinel-cir', '8,4,3', -1.0),
            ('mapping', 'parse-both', '4-3-2|4,3,2', -1.0)
        ) AS t(kind, key, sval, dval)
        UNION ALL
        SELECT 'ndvi', 'mean', '',
               CAST(ROUND(SUM(CAST(ndvi AS DECIMAL(38,12))), 6) AS DOUBLE) / COUNT(ndvi)
        FROM f
        UNION ALL
        SELECT 'cir', 'r_mean', '',
               CAST(ROUND(SUM(CAST(N AS DECIMAL(38,12))), 6) AS DOUBLE) / COUNT(1)
        FROM px
        ORDER BY kind, key"""

    @check("sensor_profile_presets", oracle=_ORACLE)
    def q_sensor_profile_presets(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Sensor-profile surface end to end: priority matching (5-band
        metadata hit, 13-band Sentinel by pattern+dtype, a miss), band
        mapping round-trips in both separators, and preset application —
        the CIR composite projects the mapped NIR channel, the NDVI index
        preset delegates to the formula registry — with decimal-exact
        means against the shared MS grid oracle."""
        from dronedb_spark.raster.synth import ms_df

        mica = match_profile(5, None, "MicaSense RedEdge-M")
        sent = match_profile(13, "UInt16", "S2A_MSIL2A_20240601T100031")
        miss = match_profile(3, None, "GoPro HERO12")
        bm = BandMapping.parse("4-3-2")
        bm2 = BandMapping.parse("4,3,2")
        rows = [
            ("match", "micasense", mica.id if mica else "none", -1.0),
            ("match", "sentinel", sent.id if sent else "none", -1.0),
            ("match", "gopro", miss.id if miss else "none", -1.0),
            ("mapping", "micasense-default",
             mica.default_preset().band_mapping.to_internal(), -1.0),
            ("mapping", "sentinel-cir",
             sent.preset("false-color-ir").band_mapping.to_api(), -1.0),
            ("mapping", "parse-both", f"{bm.to_internal()}|{bm2.to_api()}", -1.0),
        ]
        px = ms_df(spark)
        cols = ["R", "G", "B", "N", "Re"]
        ndvi = apply_preset(px, mica, "ndvi", cols)
        nd = ndvi.agg(
            (F.round(F.sum(F.col("value").cast("decimal(38,12)")), 6).cast("double")
             / F.count("value")).alias("m")
        ).collect()[0]["m"]
        cir = apply_preset(px, mica, "cir", cols)
        cm = cir.agg(
            (F.round(F.sum(F.col("r").cast("decimal(38,12)")), 6).cast("double")
             / F.count(F.lit(1))).alias("m")
        ).collect()[0]["m"]
        rows.append(("ndvi", "mean", "", float(nd)))
        rows.append(("cir", "r_mean", "", float(cm)))
        return spark.createDataFrame(
            sorted(rows), "kind string, key string, sval string, dval double"
        ).orderBy("kind", "key")


_register_check()
