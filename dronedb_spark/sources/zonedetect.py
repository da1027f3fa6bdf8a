"""ZoneDetect timezone-database reader — REAL geo→timezone resolution
for the capture-time cascade (reference: timezone.cpp:29-60, which opens
the public ZoneDetect ``timezone21.bin`` polygon database and looks up
the IANA zone for a GPS position; consumed by extractCaptureTime
priority 3, exif.cpp:636-650).

The database format (BertoldVdb/ZoneDetect, public; reconstructed
empirically against the published timezone database — every structural
claim below is pinned by tests/test_zonedetect.py against real
lookups):

  header    'PLB' + tableType | version | precision | numFields,
            then numFields field names, then the notice — strings are
            varint-length-prefixed with every byte XOR 0x80 (keeps the
            payload non-ASCII so string scans can't false-match) —
            then three varint section SIZES: bbox, metadata, data.
  bbox      per polygon: latMin, lonMin, latMax, lonMax as ABSOLUTE
            zigzag varints in fixed point (2^(precision-1) == 90° lat,
            == 180° lon), then a SIGNED cumulative metadata-offset
            delta (shared zone records ⇒ backward refs) and an
            UNSIGNED cumulative polygon-offset delta (polygons are
            laid out sequentially).
  metadata  per record, numFields strings; a string's leading varint
            v ≥ 256 is a back-reference to metadata offset v−256
            (dedup), else v is the inline byte length.
  data      polygons: each vertex is ONE varint carrying the
            bit-INTERLEAVED (Morton) pair of zigzag(Δlat), zigzag(Δlon)
            accumulated from the previous vertex; a 0 varint escapes to
            an opcode — 0 = end of polygon, 1 = shared-border REFERENCE
            (varint start + signed length): replay a span of another
            polygon's delta stream, reversed-and-negated when the
            length is negative (the donor walked the common border the
            other way).  Border sharing is why the whole world fits in
            4 MB — and a polygon decoded without resolving references
            is an OPEN arc that silently misclassifies (Mexico City
            sat outside its own zone until the Guatemala-border span
            was spliced in).

Spark shape: the DB is a 4 MB immutable blob — one object per executor
process (module-level cache keyed by path), the same broadcast shape as
the sensor database; each ingest worker resolves positions locally with
no shuffle.  Lookup is a linear bbox scan (1.4k entries) + one
point-in-polygon — microseconds, and only runs for images that lack
both GPS timestamps and OffsetTime.
"""

from __future__ import annotations

import os

_FIXED_ONE = None  # set per-db from precision


def _varu(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        b = data[pos]
        pos += 1
        v |= (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, pos


def _zig(v: int) -> int:
    """ZoneDetect's signed varint convention: negatives are 2|n|+1 (so
    odd → −(v>>1)), NOT standard zigzag (2|n|−1) — the off-by-one shows
    up immediately as −90° decoding to −90.0001."""
    return -(v >> 1) if v & 1 else v >> 1


def _deinterleave(v: int) -> tuple[int, int]:
    x = y = 0
    i = 0
    while v:
        x |= (v & 1) << i
        y |= ((v >> 1) & 1) << i
        v >>= 2
        i += 1
    return x, y


class ZoneDetectDB:
    def __init__(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        if data[:3] != b"PLB":
            raise ValueError("not a ZoneDetect database")
        self.table_type = chr(data[3])
        self.version = data[4]
        self.precision = data[5]
        n_fields = data[6]
        pos = 7
        self.fields = []
        for _ in range(n_fields):
            ln, pos = _varu(data, pos)
            self.fields.append(bytes(c ^ 0x80 for c in data[pos : pos + ln]).decode())
            pos += ln
        ln, pos = _varu(data, pos)
        self.notice = bytes(c ^ 0x80 for c in data[pos : pos + ln]).decode()
        pos += ln
        bbox_size, pos = _varu(data, pos)
        meta_size, pos = _varu(data, pos)
        data_size, pos = _varu(data, pos)
        self._meta0 = pos + bbox_size
        self._data0 = self._meta0 + meta_size
        if self._data0 + data_size > len(data):
            raise ValueError("ZoneDetect sections exceed file size")
        self._data = data
        # parse the bbox index once (1.4k entries)
        self.entries: list[tuple[int, int, int, int, int, int]] = []
        meta_acc = poly_acc = 0
        end = self._meta0
        while pos < end:
            a, pos = _varu(data, pos)
            b, pos = _varu(data, pos)
            c, pos = _varu(data, pos)
            d, pos = _varu(data, pos)
            me, pos = _varu(data, pos)
            po, pos = _varu(data, pos)
            meta_acc += _zig(me)
            poly_acc += po
            self.entries.append(
                (_zig(a), _zig(b), _zig(c), _zig(d), meta_acc, poly_acc)
            )

    # ------------------------------------------------------------ strings

    def _string(self, pos: int, depth: int = 0) -> tuple[str, int]:
        if depth > 16:
            raise ValueError("string reference loop")
        v, pos = _varu(self._data, pos)
        if v >= 256:
            s, _ = self._string(self._meta0 + v - 256, depth + 1)
            return s, pos
        raw = self._data[pos : pos + v]
        return bytes(c ^ 0x80 for c in raw).decode("utf-8"), pos + v

    def record(self, meta_off: int) -> dict[str, str]:
        pos = self._meta0 + meta_off
        out = {}
        for name in self.fields:
            s, pos = self._string(pos)
            out[name] = s
        return out

    # ------------------------------------------------------------ lookup

    def _span_deltas(self, pos: int, end: int) -> list[tuple[int, int]]:
        """Forward-decode the plain delta stream in [pos, end) (no
        opcodes allowed inside a referenced span)."""
        out = []
        data = self._data
        while pos < end:
            v, pos = _varu(data, pos)
            if v == 0:
                raise ValueError("opcode inside referenced span")
            zx, zy = _deinterleave(v)
            out.append((_zig(zx), _zig(zy)))
        return out

    def _polygon_points(self, poly_off: int) -> list[tuple[int, int]]:
        """One closed ring with shared-border REFERENCES resolved:
        vertex varint 0 escapes to an opcode — 0 ends the polygon, 1
        borrows a span of another polygon's delta stream ((start,
        signed length); negative length = the donor walked the shared
        border the other way, so its deltas replay reversed and
        negated from OUR current position)."""
        data = self._data
        pos = self._data0 + poly_off
        lat = lon = 0
        pts: list[tuple[int, int]] = []
        while True:
            v, pos = _varu(data, pos)
            if v == 0:
                val, pos = _varu(data, pos)
                if val == 0:
                    return pts
                if val != 1:
                    raise ValueError(f"unknown polygon opcode {val}")
                start, pos = _varu(data, pos)
                diff_raw, pos = _varu(data, pos)
                diff = _zig(diff_raw)
                if diff < 0:
                    span = self._span_deltas(
                        self._data0 + start + diff, self._data0 + start
                    )
                    for dlat, dlon in reversed(span):
                        lat -= dlat
                        lon -= dlon
                        pts.append((lat, lon))
                else:
                    span = self._span_deltas(
                        self._data0 + start, self._data0 + start + diff
                    )
                    for dlat, dlon in span:
                        lat += dlat
                        lon += dlon
                        pts.append((lat, lon))
                continue
            zx, zy = _deinterleave(v)
            lat += _zig(zx)
            lon += _zig(zy)
            pts.append((lat, lon))

    @staticmethod
    def _in_ring(lat: int, lon: int, ring: list[tuple[int, int]]) -> bool:
        inside = False
        n = len(ring)
        for i in range(n):
            y1, x1 = ring[i]
            y2, x2 = ring[(i + 1) % n]
            if (y1 > lat) != (y2 > lat):
                # exact rational crossing test in integers: lon vs the
                # edge's intersection at this latitude
                t = (lon - x1) * (y2 - y1) - (lat - y1) * (x2 - x1)
                if y2 < y1:
                    t = -t
                if t < 0:
                    inside = not inside
        return inside

    def lookup(self, lat_deg: float, lon_deg: float) -> dict[str, str] | None:
        """First polygon containing the point → its field record."""
        scale = 1 << (self.precision - 1)
        lat = int(round(lat_deg * scale / 90.0))
        lon = int(round(lon_deg * scale / 180.0))
        for lat0, lon0, lat1, lon1, me, po in self.entries:
            if not (lat0 <= lat <= lat1 and lon0 <= lon <= lon1):
                continue
            if self._in_ring(lat, lon, self._polygon_points(po)):
                return self.record(me)
        return None

    def timezone_id(self, lat_deg: float, lon_deg: float) -> str | None:
        rec = self.lookup(lat_deg, lon_deg)
        if rec is None:
            return None
        return rec.get("TimezoneIdPrefix", "") + rec.get("TimezoneId", "")


# ------------------------------------------------------------- resolver

DEFAULT_DB_ENV = "SPARK_GRAFT_TZDB"
_DB_CACHE: dict[str, ZoneDetectDB] = {}


def open_db(path: str | None = None) -> ZoneDetectDB:
    """Process-cached open (one 4 MB parse per executor, the sensor-DB
    broadcast shape)."""
    p = path or os.environ.get(DEFAULT_DB_ENV, "")
    if not p:
        raise FileNotFoundError(f"no ZoneDetect db path (set ${DEFAULT_DB_ENV})")
    db = _DB_CACHE.get(p)
    if db is None:
        db = ZoneDetectDB(p)
        _DB_CACHE[p] = db
    return db


def make_timezone_resolver(path: str | None = None):
    """→ fn(lat, lon) -> IANA zone name, pluggable into
    ``sources.exif.set_geo_timezone_resolver`` — the capture-time
    cascade then applies the zone's offset AT THE CAPTURE DATE via
    stdlib zoneinfo (DST-correct, unlike a fixed offset)."""
    def resolve(lat: float, lon: float) -> str | None:
        return open_db(path).timezone_id(lat, lon)

    return resolve


# ------------------------------------------------------- fixture encoder


def _enc_varu(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_zig(n: int) -> int:
    return 2 * n if n >= 0 else 2 * (-n) + 1


def _interleave(x: int, y: int) -> int:
    v = 0
    for i in range(32):
        v |= ((x >> i) & 1) << (2 * i)
        v |= ((y >> i) & 1) << (2 * i + 1)
    return v


def _enc_str(s: str) -> bytes:
    raw = s.encode("utf-8")
    return _enc_varu(len(raw)) + bytes(c ^ 0x80 for c in raw)


def encode_zonedetect(zones: list[dict], precision: int = 21) -> bytes:
    """Fixture builder: a REAL single-file ZoneDetect database (v1, no
    shared-border references, inline strings) from
    ``[{"fields": [prefix, id, alpha2, name], "polygon": [(lat_deg,
    lon_deg), ...]}]`` — decodable by this module's reader AND by the
    public library."""
    scale = 1 << (precision - 1)
    field_names = ["TimezoneIdPrefix", "TimezoneId", "CountryAlpha2", "CountryName"]
    meta = bytearray()
    meta_offsets = []
    for z in zones:
        meta_offsets.append(len(meta))
        for s in z["fields"]:
            meta += _enc_str(s)
    blobs = []
    fixed_polys = []
    for z in zones:
        pts = [
            (round(la * scale / 90.0), round(lo * scale / 180.0))
            for la, lo in z["polygon"]
        ]
        # a zero delta would collide with the opcode escape: start the
        # ring away from the fixed-point origin and drop consecutive
        # duplicates (area-preserving either way)
        k = max(range(len(pts)), key=lambda i: abs(pts[i][0]) + abs(pts[i][1]))
        pts = pts[k:] + pts[:k]
        dedup = [p for i, p in enumerate(pts) if i == 0 or p != pts[i - 1]]
        fixed_polys.append(dedup)
        blob = bytearray()
        plat = plon = 0
        for la, lo in dedup:
            blob += _enc_varu(_interleave(_enc_zig(la - plat), _enc_zig(lo - plon)))
            plat, plon = la, lo
        blob += b"\x00\x00"  # opcode: end of polygon
        blobs.append(bytes(blob))
    bbox = bytearray()
    prev_meta = prev_poly = 0
    poly_off = 0
    for z, pts, blob, moff in zip(zones, fixed_polys, blobs, meta_offsets):
        las = [p[0] for p in pts]
        los = [p[1] for p in pts]
        bbox += _enc_varu(_enc_zig(min(las))) + _enc_varu(_enc_zig(min(los)))
        bbox += _enc_varu(_enc_zig(max(las))) + _enc_varu(_enc_zig(max(los)))
        bbox += _enc_varu(_enc_zig(moff - prev_meta))
        bbox += _enc_varu(poly_off - prev_poly)
        prev_meta, prev_poly = moff, poly_off
        poly_off += len(blob)
    data = b"".join(blobs)
    head = bytearray(b"PLBT")
    head += bytes([1, precision, len(field_names)])
    for n in field_names:
        head += _enc_str(n)
    head += _enc_str("synthetic test database")
    head += _enc_varu(len(bbox)) + _enc_varu(len(meta)) + _enc_varu(len(data))
    return bytes(head + bbox + meta + data)


# ------------------------------------------------------------------ check

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dronedb_spark.suite import check  # noqa: E402

_ZD_ZONES = [
    {"fields": ["Test/", "East", "TE", "Eastland"],
     "polygon": [(0, 0), (0, 40), (30, 40), (30, 0)]},
    {"fields": ["Test/", "West", "TW", "Westländ"],  # non-ASCII: XOR-0x80 UTF-8
     "polygon": [(0, -40), (0, 0), (30, 0), (30, -40)]},
    {"fields": ["Test/", "Isle", "TI", "Diamond"],
     "polygon": [(-20, 0), (-10, 10), (0, 0), (-10, -10)]},
]


def _zd_fixture_path() -> str:
    root = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..", "tests", "fixtures", "zonedetect_v1")
    )
    os.makedirs(root, exist_ok=True)
    p = os.path.join(root, "zones.bin")
    payload = encode_zonedetect(_ZD_ZONES)
    if not os.path.exists(p) or open(p, "rb").read() != payload:
        with open(p, "wb") as f:
            f.write(payload)
    os.utime(p, (1700000000, 1700000000))
    return p


# grid points dodge all polygon borders (offsets keep them >0.2° away)
_ZD_GRID = """
    SELECT id AS pid,
           -27.3 + CAST(id % 13 AS DOUBLE) * 4.7 AS lat,
           -48.9 + CAST((id - (id % 13)) / 13 AS DOUBLE) * 9.3 AS lon
    FROM {ids}
"""
_ZD_N = 130


@check(
    "geo_timezone_lookup",
    oracle=f"""
        WITH g AS ({_ZD_GRID.format(ids=f'(SELECT range AS id FROM range({_ZD_N}))')})
        SELECT pid, lat, lon,
               CASE WHEN lat >= 0 AND lat <= 30 AND lon >= 0 AND lon <= 40
                        THEN 'Test/East'
                    WHEN lat >= 0 AND lat <= 30 AND lon >= -40 AND lon <= 0
                        THEN 'Test/West'
                    WHEN abs(lat + 10.0) + abs(lon) <= 10.0
                        THEN 'Test/Isle'
                    ELSE 'none' END AS zone
        FROM g ORDER BY pid""",
)
def q_geo_timezone_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full binary chain — header/bbox/metadata/polygon decode and
    the integer point-in-polygon — against closed-form geometry on a
    REAL ZoneDetect database built by the repo's own encoder (rects +
    a diamond + a non-ASCII country name exercising the XOR-0x80 UTF-8
    path).  Grid points stay clear of every border so fixed-point
    rounding cannot flip a verdict."""
    import pandas as pd

    path = _zd_fixture_path()
    grid = spark.sql(_ZD_GRID.format(ids=f"range(0, {_ZD_N})"))

    def run(batches):
        for pdf in batches:
            db = open_db(path)
            pdf = pdf.copy()
            pdf["zone"] = [
                db.timezone_id(la, lo) or "none"
                for la, lo in zip(pdf["lat"], pdf["lon"])
            ]
            yield pdf

    return grid.mapInPandas(
        run, schema="pid long, lat double, lon double, zone string"
    ).orderBy("pid")
