"""Pure-Python EXIF extraction — the real metadata path for Image /
GeoImage ingest (SURVEY S5; reference parseEntry, entry.cpp:140-226,
their tests exif_optimization_test.cpp / gps_metadata_test.cpp).

The reference links Exiv2; this environment has no image libraries, but
EXIF is a PUBLIC byte format (JPEG marker segments + TIFF 6.0 IFDs +
EXIF 2.32 tag numbers), so the extraction the catalog actually needs —
capture time, GPS point, orientation, focal length, camera make/model,
pixel dimensions — parses directly from the first few KB of the file.
``parse_exif`` is the DEFAULT parser behind the ``register_parser`` seam
in sources/fs.py; a full decoder can still be plugged in to replace it.

Also here: ``build_jpeg_with_exif`` — a deterministic writer for the
same structures (SOI + APP1/Exif + EOI).  It exists so tests and the
driver check can exercise ingest on REAL JPEG/EXIF bytes end-to-end
(fingerprint → parse → GPS upgrade → point geometry) without shipping
binary fixtures; the image payload is absent but the container and
metadata are the genuine formats.
"""

from __future__ import annotations

import calendar
import os
import struct
import time

# TIFF field types → byte size of one element
_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}

# EXIF 2.32 tag numbers (public registry)
_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_GPS_IFD = 0x8825
_TAG_DATETIME_ORIGINAL = 0x9003
_TAG_FOCAL_LENGTH = 0x920A
_TAG_PIXEL_X = 0xA002
_TAG_PIXEL_Y = 0xA003
_TAG_FP_XRES = 0xA20E  # FocalPlaneXResolution (RATIONAL)
_TAG_FP_YRES = 0xA20F  # FocalPlaneYResolution (RATIONAL)
_TAG_FP_UNIT = 0xA210  # FocalPlaneResolutionUnit (SHORT)
_TAG_FOCAL35 = 0xA405  # FocalLengthIn35mmFilm (SHORT)
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004
_GPS_ALT_REF = 0x0005
_GPS_ALT = 0x0006
_GPS_TIMESTAMP = 0x0007   # 3 RATIONALs (h, m, s) — UTC
_GPS_DOP = 0x000B         # RATIONAL dilution of precision
_GPS_SPEED_REF = 0x000C   # ASCII 'K' km/h / 'M' mph / 'N' knots
_GPS_SPEED = 0x000D       # RATIONAL scalar ground speed
_GPS_TRACK_REF = 0x000E   # ASCII 'T' true / 'M' magnetic
_GPS_TRACK = 0x000F       # RATIONAL degrees
_GPS_IMG_DIR_REF = 0x0010
_GPS_IMG_DIR = 0x0011
_GPS_DATESTAMP = 0x001D   # ASCII 'YYYY:MM:DD' — UTC
_GPS_H_POS_ERROR = 0x001F  # RATIONAL horizontal positioning error (m)
_TAG_OFFSET_TIME_ORIGINAL = 0x9011  # ASCII '+HH:MM'
_TAG_SUBSEC_ORIGINAL = 0x9291       # ASCII fractional seconds


def _read_ifd(buf: bytes, off: int, endian: str) -> dict[int, tuple[int, int, bytes]]:
    """One IFD → {tag: (type, count, value_bytes)} with out-of-line values
    resolved.  Malformed offsets simply stop the walk (ingest must never
    fail on a corrupt file — the reference logs and skips)."""
    out: dict[int, tuple[int, int, bytes]] = {}
    if off + 2 > len(buf):
        return out
    (n,) = struct.unpack_from(endian + "H", buf, off)
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(buf):
            break
        tag, typ, cnt = struct.unpack_from(endian + "HHI", buf, e)
        size = _TYPE_SIZES.get(typ, 1) * cnt
        if size <= 4:
            val = buf[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack_from(endian + "I", buf, e + 8)
            if voff + size > len(buf):
                continue
            val = buf[voff : voff + size]
        out[tag] = (typ, cnt, val)
    return out


def _ascii(entry) -> str | None:
    if entry is None:
        return None
    return entry[2].split(b"\0")[0].decode("ascii", "replace").strip()


def _u16(entry, endian) -> int | None:
    if entry is None or len(entry[2]) < 2:
        return None
    return struct.unpack_from(endian + "H", entry[2], 0)[0]


def _u32(entry, endian) -> int | None:
    if entry is None or len(entry[2]) < 4:
        return None
    return struct.unpack_from(endian + "I", entry[2], 0)[0]


def _rationals(entry, endian) -> list[float]:
    if entry is None:
        return []
    typ, cnt, val = entry
    out = []
    for i in range(cnt):
        if 8 * i + 8 > len(val):
            break
        num, den = struct.unpack_from(endian + ("ii" if typ == 10 else "II"), val, 8 * i)
        out.append(num / den if den else 0.0)
    return out


def _parse_datetime_ms(s: str | None) -> int:
    """EXIF 'YYYY:MM:DD HH:MM:SS' → epoch milliseconds (UTC by convention
    here — EXIF carries no zone; the reference uses the same instant
    semantics for captureTime)."""
    if not s:
        return 0
    try:
        t = time.strptime(s, "%Y:%m:%d %H:%M:%S")
        return calendar.timegm(t) * 1000
    except ValueError:
        return 0


def _parse_offset_secs(s: str | None) -> int | None:
    """EXIF OffsetTime '+HH:MM' / '-HH:MM' → seconds east of UTC
    (parseOffsetTime, exif.cpp).  None when absent/malformed."""
    if not s or len(s) < 6 or s[0] not in "+-" or s[3] != ":":
        return None
    try:
        h, m = int(s[1:3]), int(s[4:6])
    except ValueError:
        return None
    sign = 1 if s[0] == "+" else -1
    return sign * (h * 3600 + m * 60)


def _parse_subsec_ms(s: str | None) -> int:
    """EXIF SubSecTime fractional-seconds string → whole milliseconds."""
    if not s or not s.strip().isdigit():
        return 0
    frac = s.strip()[:3].ljust(3, "0")
    return int(frac)


# Pluggable geo→timezone hook (priority 3 of the reference cascade,
# exif.cpp:636-650: zonedetect lookup from GPS position).  The zonedetect
# database ships with the reference, not here; install a resolver with
# ``set_geo_timezone_resolver(fn)`` where fn(lat, lon) -> offset seconds
# east of UTC, or leave None for the naive-UTC fallback (priority 4).
_GEO_TZ_RESOLVER = None


def set_geo_timezone_resolver(fn) -> None:
    global _GEO_TZ_RESOLVER
    _GEO_TZ_RESOLVER = fn


def capture_time_ms(
    dto: str | None,
    gps_datestamp: str | None = None,
    gps_timestamp: tuple[float, float, float] | None = None,
    offset_time: str | None = None,
    subsec: str | None = None,
    lat: float | None = None,
    lon: float | None = None,
) -> int:
    """The reference's capture-time priority cascade (extractCaptureTime,
    exif.cpp:513-660), milliseconds UTC:

      1. GPS DateStamp + TimeStamp — always UTC, most accurate;
      2. DateTime + OffsetTime — explicit zone: UTC = local − offset;
      3. DateTime + geo-timezone lookup (pluggable resolver);
      4. DateTime naive (assume UTC).

    (Priority 0, the XMP video Mac-epoch date, lives in the MP4/MOV
    metadata parser — video containers don't reach this path.)"""
    if gps_datestamp and gps_timestamp is not None:
        try:
            y, mo, d = (int(v) for v in gps_datestamp.split(":"))
            h, mi = int(gps_timestamp[0]), int(gps_timestamp[1])
            sec = float(gps_timestamp[2])
            s = int(sec)
            msecs = int(round((sec - s) * 1000.0))
            base = calendar.timegm((y, mo, d, h, mi, s, 0, 0, 0)) * 1000
            return base + msecs
        except (ValueError, OverflowError):
            pass
    base = _parse_datetime_ms(dto)
    if not base:
        return 0
    base += _parse_subsec_ms(subsec)
    off = _parse_offset_secs(offset_time)
    if off is not None:
        return base - off * 1000  # local = UTC + offset ⇒ UTC = local − offset
    global _GEO_TZ_RESOLVER
    if _GEO_TZ_RESOLVER is None and os.environ.get("SPARK_GRAFT_TZDB"):
        # lazy auto-install of the real zonedetect resolver when a
        # database path is configured (one parse per worker process)
        try:
            from dronedb_spark.sources.zonedetect import make_timezone_resolver

            _GEO_TZ_RESOLVER = make_timezone_resolver()
        except Exception:
            _GEO_TZ_RESOLVER = False  # do not retry every call
    if _GEO_TZ_RESOLVER and lat is not None and lon is not None:
        try:
            res = _GEO_TZ_RESOLVER(lat, lon)
            if isinstance(res, str):
                # IANA zone name (the zonedetect resolver,
                # sources/zonedetect.py): apply the zone's offset AT THE
                # CAPTURE DATE — DST-correct, like the reference's cctz
                # conversion (timezone.cpp:55-60)
                import datetime as _dt
                from zoneinfo import ZoneInfo

                local_naive = _dt.datetime.fromtimestamp(
                    base // 1000, _dt.timezone.utc
                ).replace(tzinfo=None)
                off = ZoneInfo(res).utcoffset(local_naive)
                return base - int(off.total_seconds()) * 1000
            if res is not None:
                return base - int(res) * 1000  # plain offset seconds
        except Exception:
            pass
    return base  # naive: assume UTC


def _find_tiff(header: bytes) -> bytes | None:
    """Locate the TIFF block: raw TIFF files start with it; JPEGs carry it
    in the APP1 'Exif' marker segment."""
    if header[:2] in (b"II", b"MM") and len(header) > 8:
        return header
    if header[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(header):
        if header[pos] != 0xFF:
            break
        marker = header[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", header, pos + 2)
        if marker == 0xE1 and header[pos + 4 : pos + 10] == b"Exif\x00\x00":
            return header[pos + 10 : pos + 2 + seglen]
        if marker == 0xDA:  # start of scan — no metadata past here
            break
        pos += 2 + seglen
    return None


def _apply_xmp(header: bytes, props: dict) -> None:
    """Fold the XMP drone-pose block into the properties dict
    (entry.cpp:182-226): camera orientation (nadir defaults when the
    packet lacks it), flight speed, GPS accuracy, relative altitude."""
    import math as _math

    from dronedb_spark.sources.xmp import (
        camera_orientation,
        extract_xmp_packet,
        flight_speed,
        gps_accuracy,
        parse_xmp,
        rel_altitude,
    )

    text = extract_xmp_packet(header)
    xd = parse_xmp(text) if text else {}

    # Panorama projection info (extractPanoramaInfo, exif.cpp:833-875;
    # stored for Panorama-typed entries, entry.cpp:262-275): GPano keys
    # over full-frame equirectangular defaults.  The pano condition is
    # the same integer-aspect test the type refinement uses.
    w, h = props.get("width"), props.get("height")
    if w and h and w // h >= 2:
        props["projectionType"] = xd.get("GPano:ProjectionType", "equirectangular")
        cw, ch = xd.get("GPano:CroppedAreaImageWidthPixels"), xd.get(
            "GPano:CroppedAreaImageHeightPixels"
        )
        props["croppedWidth"] = int(cw) if cw and ch else w
        props["croppedHeight"] = int(ch) if cw and ch else h
        props["croppedX"] = int(xd.get("GPano:CroppedAreaLeftPixels", 0))
        props["croppedY"] = int(xd.get("GPano:CroppedAreaTopPixels", 0))
        props["poseHeading"] = float(xd.get("GPano:PoseHeadingDegrees", 0.0))
        props["posePitch"] = float(xd.get("GPano:PosePitchDegrees", 0.0))
        props["poseRoll"] = float(xd.get("GPano:PoseRollDegrees", 0.0))

    pitch, yaw, roll, has_ori = camera_orientation(xd)
    props["cameraPitch"] = pitch
    props["cameraYaw"] = yaw
    props["cameraRoll"] = roll
    props["hasCameraOrientation"] = has_ori
    fsd = flight_speed(xd)
    if fsd is not None:
        x, y, z = fsd
        props["flightSpeedX"] = x
        props["flightSpeedY"] = y
        props["flightSpeedZ"] = z
        props["flightSpeed"] = _math.sqrt(x * x + y * y)
        props["flightSpeed3D"] = _math.sqrt(x * x + y * y + z * z)
    props.update(gps_accuracy(xd))
    ra = rel_altitude(xd)
    if ra is not None:
        props["relativeAltitude"] = ra


def _apply_sensor_chain(props: dict, make: str | None, model: str | None) -> None:
    """Per-file mirror of the sensor-size chain (extractSensorSize +
    computeFocal, exif.cpp:167-232) over the already-parsed properties:
    FocalPlane tags first, builtin sensor overlay second.  Emits
    ``sensor``/``sensorWidth``/``sensorHeight``/``focalLength35``."""
    from dronedb_spark.sources.sensors import (
        BUILTIN_SENSORS,
        is_thermal_sensor,
        sensor_id,
    )

    sid = sensor_id(make, model)
    props["sensor"] = sid
    if is_thermal_sensor(make, model):  # entry.cpp:162-168
        props["sensorCategory"] = "thermal"
    w_px, h_px = props.get("width"), props.get("height")
    fp_x = props.get("focalPlaneXResolution")
    fp_y = props.get("focalPlaneYResolution")
    unit = props.get("focalPlaneResolutionUnit")
    mmu = {2: 25.4, 3: 10.0, 4: 1.0, 5: 0.001}.get(unit, 0.0)
    sw = sh = None
    if w_px and h_px and fp_x and fp_y and mmu:
        sw = w_px * (1.0 / fp_x) * mmu
        sh = h_px * (1.0 / fp_y) * mmu
    elif w_px and h_px and sid in BUILTIN_SENSORS:
        sw = BUILTIN_SENSORS[sid]
        sh = sw / w_px * h_px
    if sw is None:
        return
    props["sensorWidth"] = sw
    props["sensorHeight"] = sh
    f35 = props.get("focalLength35")
    f = props.get("focalLength")
    if f35:
        props["focalLengthComputed"] = f35 / 36.0 * sw
    elif f:
        props["focalLength35"] = 36.0 * f / sw
        props["focalLengthComputed"] = f


def parse_exif(rel_path: str, header: bytes) -> dict:
    """(path, header bytes) → properties dict for the entries schema.

    Emits the reference's property names (entry.cpp:140-226): captureTime
    (epoch ms), focalLength, orientation, make, model, width, height, and
    the GPS point as point_lon/point_lat/point_alt (which sources/fs.py
    lifts into the geometry columns and uses to upgrade Image→GeoImage).
    Non-JPEG/TIFF or EXIF-less files → {}.
    """
    try:
        tiff = _find_tiff(header)
        if tiff is None:
            return {}
        endian = "<" if tiff[:2] == b"II" else ">"
        (magic,) = struct.unpack_from(endian + "H", tiff, 2)
        if magic != 42:
            return {}
        (ifd0_off,) = struct.unpack_from(endian + "I", tiff, 4)
        ifd0 = _read_ifd(tiff, ifd0_off, endian)
        exif_off = _u32(ifd0.get(_TAG_EXIF_IFD), endian)
        gps_off = _u32(ifd0.get(_TAG_GPS_IFD), endian)
        exif = _read_ifd(tiff, exif_off, endian) if exif_off else {}
        gps = _read_ifd(tiff, gps_off, endian) if gps_off else {}

        props: dict = {}
        make = _ascii(ifd0.get(_TAG_MAKE))
        model = _ascii(ifd0.get(_TAG_MODEL))
        if make:
            props["make"] = make
        if model:
            props["model"] = model
        orient = _u16(ifd0.get(_TAG_ORIENTATION), endian)
        if orient is not None:
            props["orientation"] = orient
        dto = _ascii(exif.get(_TAG_DATETIME_ORIGINAL)) or _ascii(ifd0.get(_TAG_DATETIME))
        focal = _rationals(exif.get(_TAG_FOCAL_LENGTH), endian)
        if focal:
            props["focalLength"] = focal[0]
        focal35 = _u16(exif.get(_TAG_FOCAL35), endian)
        if focal35:
            props["focalLength35"] = focal35
        # sensor-size inputs (extractSensorSize, exif.cpp:194-232)
        fp_unit = _u16(exif.get(_TAG_FP_UNIT), endian)
        fp_x = _rationals(exif.get(_TAG_FP_XRES), endian)
        fp_y = _rationals(exif.get(_TAG_FP_YRES), endian)
        if fp_unit is not None:
            props["focalPlaneResolutionUnit"] = fp_unit
        if fp_x:
            props["focalPlaneXResolution"] = fp_x[0]
        if fp_y:
            props["focalPlaneYResolution"] = fp_y[0]
        w = _u32(exif.get(_TAG_PIXEL_X), endian) or _u16(exif.get(_TAG_PIXEL_X), endian)
        h = _u32(exif.get(_TAG_PIXEL_Y), endian) or _u16(exif.get(_TAG_PIXEL_Y), endian)
        if w:
            props["width"] = w
        if h:
            props["height"] = h

        lat = _rationals(gps.get(_GPS_LAT), endian)
        lon = _rationals(gps.get(_GPS_LON), endian)
        if len(lat) == 3 and len(lon) == 3:
            lat_v = lat[0] + lat[1] / 60.0 + lat[2] / 3600.0
            lon_v = lon[0] + lon[1] / 60.0 + lon[2] / 3600.0
            if _ascii(gps.get(_GPS_LAT_REF)) == "S":
                lat_v = -lat_v
            if _ascii(gps.get(_GPS_LON_REF)) == "W":
                lon_v = -lon_v
            props["point_lat"] = lat_v
            props["point_lon"] = lon_v
            alt = _rationals(gps.get(_GPS_ALT), endian)
            if alt:
                alt_v = alt[0]
                ref = gps.get(_GPS_ALT_REF)
                if ref is not None and ref[2][:1] == b"\x01":  # below sea level
                    alt_v = -alt_v
                props["point_alt"] = alt_v

        # GPS direction / track (extractGpsDirection, exif.cpp:800-831)
        img_dir = _rationals(gps.get(_GPS_IMG_DIR), endian)
        if img_dir:
            props["gpsImgDirection"] = img_dir[0]
            props["gpsImgDirectionRef"] = _ascii(gps.get(_GPS_IMG_DIR_REF)) or "T"
        track = _rationals(gps.get(_GPS_TRACK), endian)
        if track:
            props["gpsTrack"] = track[0]
            props["gpsTrackRef"] = _ascii(gps.get(_GPS_TRACK_REF)) or "T"

        # XMP drone pose + telemetry, image files only (entry.cpp:182-226
        # runs under `if (image)`; a GeoTIFF never gets camera props)
        if header[:2] == b"\xff\xd8":
            _apply_xmp(header, props)
            # sensor id + size chain and focal35 (entry.cpp:158-181).  NOTE:
            # `focalLength` stays the RAW FocalLength tag (r1-established
            # property contract); the reference only emits it via computeFocal.
            if make or model:
                _apply_sensor_chain(props, make, model)

        # EXIF scalar fallbacks, only when the XMP priority-1 keys were
        # absent (extractFlightSpeed priority 2, exif.cpp:709-739;
        # extractGpsAccuracy priority 3, exif.cpp:782-798)
        if "flightSpeedX" not in props:
            spd = _rationals(gps.get(_GPS_SPEED), endian)
            if spd:
                ref = _ascii(gps.get(_GPS_SPEED_REF)) or "K"
                speed_ms = spd[0] / {"K": 3.6, "M": 2.237, "N": 1.944}.get(ref, 3.6)
                props["flightSpeedX"] = speed_ms
                props["flightSpeedY"] = 0.0
                props["flightSpeedZ"] = 0.0
                props["flightSpeed"] = speed_ms
                props["flightSpeed3D"] = speed_ms
        if "gpsXYAccuracy" not in props and "gpsZAccuracy" not in props:
            herr = _rationals(gps.get(_GPS_H_POS_ERROR), endian)
            if herr:
                props["gpsXYAccuracy"] = herr[0]
            dop = _rationals(gps.get(_GPS_DOP), endian)
            if dop:
                props["gpsDop"] = dop[0]

        # capture time LAST: the cascade may use the GPS point (geo-TZ hook)
        gps_ts = _rationals(gps.get(_GPS_TIMESTAMP), endian)
        ms = capture_time_ms(
            dto,
            gps_datestamp=_ascii(gps.get(_GPS_DATESTAMP)),
            gps_timestamp=tuple(gps_ts) if len(gps_ts) == 3 else None,
            offset_time=_ascii(exif.get(_TAG_OFFSET_TIME_ORIGINAL)),
            subsec=_ascii(exif.get(_TAG_SUBSEC_ORIGINAL)),
            lat=props.get("point_lat"),
            lon=props.get("point_lon"),
        )
        if ms:
            props["captureTime"] = ms
        return props
    except Exception:
        return {}


# ------------------------------------------------------------------ writer


def _entry_bytes(tag: int, typ: int, count: int, payload: bytes, heap: bytearray, heap_base: int) -> bytes:
    size = _TYPE_SIZES[typ] * count
    if size <= 4:
        inline = payload + b"\x00" * (4 - len(payload))
        return struct.pack("<HHI", tag, typ, count) + inline
    off = heap_base + len(heap)
    heap.extend(payload)
    return struct.pack("<HHI", tag, typ, count) + struct.pack("<I", off)


def _ifd_bytes(entries: list[bytes]) -> bytes:
    return struct.pack("<H", len(entries)) + b"".join(entries) + struct.pack("<I", 0)


def build_exif_app1(
    lat_dms: tuple[float, float, tuple[int, int]] | None = None,
    lat_ref: str = "N",
    lon_dms: tuple[float, float, tuple[int, int]] | None = None,
    lon_ref: str = "E",
    alt: tuple[int, int] | None = None,
    alt_below_sea: bool = False,
    datetime_original: str | None = None,
    focal: tuple[int, int] | None = None,
    orientation: int = 1,
    make: str = "DDB",
    model: str = "CAM0",
    width: int = 4000,
    height: int = 3000,
    focal35: int | None = None,
    fp_xres: tuple[int, int] | None = None,
    fp_yres: tuple[int, int] | None = None,
    fp_unit: int = 2,
    offset_time: str | None = None,
    subsec: str | None = None,
    gps_datestamp: str | None = None,
    gps_timestamp: tuple[tuple[int, int], tuple[int, int], tuple[int, int]] | None = None,
    gps_speed: tuple[int, int] | None = None,
    gps_speed_ref: str | None = None,
    gps_dop: tuple[int, int] | None = None,
    gps_h_pos_error: tuple[int, int] | None = None,
) -> bytes:
    """The APP1 payload ('Exif\\0\\0' + TIFF little-endian) for the given
    properties.  DMS components are (deg, min, (sec_num, sec_den)) so the
    expected decimal degrees are exactly reconstructible by an oracle.
    ``fp_xres``/``fp_yres`` emit the FocalPlane sensor-size tags (with
    ``fp_unit``); ``focal35`` emits FocalLengthIn35mmFilm — the inputs of
    the reference's extractSensorSize/computeFocal (exif.cpp:167-232)."""
    # layout: TIFF header(8) | IFD0 | ExifIFD | GPSIFD | heap
    ifd0_n = 6
    exif_n = (
        4
        + (1 if focal35 is not None else 0)
        + (3 if fp_xres is not None else 0)
        + (1 if offset_time is not None else 0)
        + (1 if subsec is not None else 0)
    )
    gps_n = (
        (6 if lat_dms is not None else 0)
        + (2 if gps_datestamp is not None and gps_timestamp is not None else 0)
        + (1 if gps_speed is not None else 0)
        + (1 if gps_speed_ref is not None else 0)
        + (1 if gps_dop is not None else 0)
        + (1 if gps_h_pos_error is not None else 0)
    )
    ifd0_off = 8
    exif_off = ifd0_off + 2 + 12 * ifd0_n + 4
    gps_off = exif_off + 2 + 12 * exif_n + 4
    heap_base = gps_off + (2 + 12 * gps_n + 4 if gps_n else 0)
    heap = bytearray()

    def asciiz(s: str) -> bytes:
        return s.encode("ascii") + b"\x00"

    def rat(num: int, den: int) -> bytes:
        return struct.pack("<II", num, den)

    e0 = [
        _entry_bytes(_TAG_MAKE, 2, len(make) + 1, asciiz(make), heap, heap_base),
        _entry_bytes(_TAG_MODEL, 2, len(model) + 1, asciiz(model), heap, heap_base),
        _entry_bytes(_TAG_ORIENTATION, 3, 1, struct.pack("<H", orientation), heap, heap_base),
        _entry_bytes(
            _TAG_DATETIME,
            2,
            len(datetime_original or "") + 1,
            asciiz(datetime_original or ""),
            heap,
            heap_base,
        ),
        _entry_bytes(_TAG_EXIF_IFD, 4, 1, struct.pack("<I", exif_off), heap, heap_base),
        _entry_bytes(
            _TAG_GPS_IFD, 4, 1, struct.pack("<I", gps_off if gps_n else 0), heap, heap_base
        ),
    ]
    fnum, fden = focal or (50, 1)
    ee = [
        _entry_bytes(
            _TAG_DATETIME_ORIGINAL,
            2,
            len(datetime_original or "") + 1,
            asciiz(datetime_original or ""),
            heap,
            heap_base,
        ),
        _entry_bytes(_TAG_FOCAL_LENGTH, 5, 1, rat(fnum, fden), heap, heap_base),
        _entry_bytes(_TAG_PIXEL_X, 4, 1, struct.pack("<I", width), heap, heap_base),
        _entry_bytes(_TAG_PIXEL_Y, 4, 1, struct.pack("<I", height), heap, heap_base),
    ]
    if fp_xres is not None:
        ee.append(_entry_bytes(_TAG_FP_XRES, 5, 1, rat(*fp_xres), heap, heap_base))
        ee.append(_entry_bytes(_TAG_FP_YRES, 5, 1, rat(*(fp_yres or fp_xres)), heap, heap_base))
        ee.append(_entry_bytes(_TAG_FP_UNIT, 3, 1, struct.pack("<H", fp_unit), heap, heap_base))
    if focal35 is not None:
        ee.append(_entry_bytes(_TAG_FOCAL35, 3, 1, struct.pack("<H", focal35), heap, heap_base))
    if offset_time is not None:
        ee.append(
            _entry_bytes(
                _TAG_OFFSET_TIME_ORIGINAL, 2, len(offset_time) + 1,
                asciiz(offset_time), heap, heap_base,
            )
        )
    if subsec is not None:
        ee.append(
            _entry_bytes(
                _TAG_SUBSEC_ORIGINAL, 2, len(subsec) + 1, asciiz(subsec), heap, heap_base
            )
        )
    eg: list[bytes] = []
    if lat_dms is not None:
        lad, lam, (lasn, lasd) = lat_dms
        lod, lom, (losn, losd) = lon_dms
        eg = [
            _entry_bytes(_GPS_LAT_REF, 2, 2, asciiz(lat_ref), heap, heap_base),
            _entry_bytes(
                _GPS_LAT,
                5,
                3,
                rat(int(lad), 1) + rat(int(lam), 1) + rat(lasn, lasd),
                heap,
                heap_base,
            ),
            _entry_bytes(_GPS_LON_REF, 2, 2, asciiz(lon_ref), heap, heap_base),
            _entry_bytes(
                _GPS_LON,
                5,
                3,
                rat(int(lod), 1) + rat(int(lom), 1) + rat(losn, losd),
                heap,
                heap_base,
            ),
            _entry_bytes(
                _GPS_ALT_REF, 1, 1, b"\x01" if alt_below_sea else b"\x00", heap, heap_base
            ),
            _entry_bytes(_GPS_ALT, 5, 1, rat(*(alt or (0, 1))), heap, heap_base),
        ]
    if gps_datestamp is not None and gps_timestamp is not None:
        (hn, hd), (mn, md), (sn, sd) = gps_timestamp
        eg.append(
            _entry_bytes(
                _GPS_TIMESTAMP, 5, 3, rat(hn, hd) + rat(mn, md) + rat(sn, sd), heap, heap_base
            )
        )
        eg.append(
            _entry_bytes(
                _GPS_DATESTAMP, 2, len(gps_datestamp) + 1,
                asciiz(gps_datestamp), heap, heap_base,
            )
        )
    if gps_dop is not None:
        eg.append(_entry_bytes(_GPS_DOP, 5, 1, rat(*gps_dop), heap, heap_base))
    if gps_speed_ref is not None:
        eg.append(_entry_bytes(_GPS_SPEED_REF, 2, 2, asciiz(gps_speed_ref), heap, heap_base))
    if gps_speed is not None:
        eg.append(_entry_bytes(_GPS_SPEED, 5, 1, rat(*gps_speed), heap, heap_base))
    if gps_h_pos_error is not None:
        eg.append(_entry_bytes(_GPS_H_POS_ERROR, 5, 1, rat(*gps_h_pos_error), heap, heap_base))

    tiff = (
        b"II" + struct.pack("<HI", 42, ifd0_off)
        + _ifd_bytes(e0)
        + _ifd_bytes(ee)
        + (_ifd_bytes(eg) if gps_n else b"")
        + bytes(heap)
    )
    return b"Exif\x00\x00" + tiff


def build_jpeg_with_exif(xmp: dict | None = None, **kwargs) -> bytes:
    """A minimal but REAL JPEG: SOI + APP1(Exif) [+ APP1(XMP)] + EOI.
    ``xmp`` adds a real RDF/XML packet keyed ``prefix:Local`` (e.g.
    ``{"drone-dji:GimbalYawDegree": "+15.0"}``)."""
    payload = build_exif_app1(**kwargs)
    out = b"\xff\xd8" + b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    if xmp:
        from dronedb_spark.sources.xmp import build_xmp_jpeg_segment

        out += build_xmp_jpeg_segment(xmp)
    return out + b"\xff\xd9"


def build_plain_jpeg() -> bytes:
    """JPEG with a JFIF APP0 but no EXIF — stays type Image, no geometry."""
    app0 = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    return b"\xff\xd8" + b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0 + b"\xff\xd9"


# ------------------------------------------------------------------ editor
# W12 setexif (exifeditor.cpp, apps/cmd/setexif.cpp): SetGPSLatitude /
# SetGPSLongitude / SetGPSAltitude / SetGPS over a set of files.


def deg_to_dms(value: float, precision: int = 4) -> tuple[int, int, tuple[int, int]]:
    """|decimal degrees| → (deg, min, (sec_num, sec_den)) — the rational
    encoding EXIF GPS requires (exifeditor.cpp doubleToDMS)."""
    v = abs(value)
    d = int(v)
    m = int((v - d) * 60.0)
    s = (v - d - m / 60.0) * 3600.0
    den = 10**precision
    return d, m, (int(round(s * den)), den)


def set_gps(
    jpeg: bytes,
    lat: float | None = None,
    lon: float | None = None,
    alt: float | None = None,
) -> bytes:
    """Rewrite the JPEG's EXIF GPS block, preserving every other segment
    (scan data included) byte-for-byte.  Properties our tag model carries
    (capture time, orientation, focal, make/model, dims) survive the APP1
    rebuild; unmodeled EXIF tags are dropped — a full Exiv2-style editor
    is the documented swap-in for those.

    lat/lon must be set together (a GPS point needs both; the reference's
    SetGPS sets all three).  Refs follow exifeditor.cpp: lat>=0→'N',
    lon>=0→'E', alt<0→below-sea flag."""
    if (lat is None) != (lon is None):
        raise ValueError("lat and lon must be set together")
    old = parse_exif("edit.jpg", jpeg)
    if lat is None and "point_lat" in old:
        lat, lon = old["point_lat"], old["point_lon"]
    if alt is None:
        alt = old.get("point_alt")
    ms = old.get("captureTime", 0)
    dto = (
        time.strftime("%Y:%m:%d %H:%M:%S", time.gmtime(ms // 1000)) if ms else None
    )
    focal = old.get("focalLength")
    payload = build_exif_app1(
        lat_dms=deg_to_dms(lat) if lat is not None else None,
        lat_ref="N" if (lat or 0) >= 0 else "S",
        lon_dms=deg_to_dms(lon) if lon is not None else None,
        lon_ref="E" if (lon or 0) >= 0 else "W",
        alt=(int(round(abs(alt) * 10000)), 10000) if alt is not None else None,
        alt_below_sea=(alt or 0) < 0,
        datetime_original=dto,
        focal=(int(round(focal * 100)), 100) if focal is not None else None,
        orientation=old.get("orientation", 1),
        make=old.get("make", ""),
        model=old.get("model", ""),
        width=old.get("width", 0),
        height=old.get("height", 0),
    )
    new_app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload

    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    out = bytearray(b"\xff\xd8")
    out += new_app1
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker == 0xD9 or 0xD0 <= marker <= 0xD7:
            out += jpeg[pos : pos + 2]
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        is_old_exif = marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00"
        if not is_old_exif:
            out += jpeg[pos : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDA:  # start of scan — copy the rest verbatim
            out += jpeg[pos:]
            return bytes(out)
    out += jpeg[pos:]
    return bytes(out)


# ------------------------------------------------- general tag editor (W12)


def read_exif_tree(data: bytes) -> tuple[str, dict[str, dict[int, tuple[int, int, bytes]]]]:
    """Full EXIF tree (endian, {ifd: {tag: (type, count, raw_value)}}) for
    ifd0 / exif / gps — EVERY tag preserved raw, not just the modeled
    property subset.  The editor's read half (exifeditor.cpp parity)."""
    tiff = _find_tiff(data)
    if tiff is None:
        return "<", {"ifd0": {}, "exif": {}, "gps": {}}
    endian = "<" if tiff[:2] == b"II" else ">"
    (ifd0_off,) = struct.unpack_from(endian + "I", tiff, 4)
    ifd0 = _read_ifd(tiff, ifd0_off, endian)
    # distinct literals: `exif = gps = {}` aliased one dict, so editing a
    # tag in either IFD of a sub-IFD-less JPEG wrote both (phantom GPS IFD)
    exif: dict = {}
    gps: dict = {}
    if _TAG_EXIF_IFD in ifd0:
        exif = _read_ifd(tiff, _u32(ifd0[_TAG_EXIF_IFD], endian) or 0, endian)
    if _TAG_GPS_IFD in ifd0:
        gps = _read_ifd(tiff, _u32(ifd0[_TAG_GPS_IFD], endian) or 0, endian)
    ifd0 = {t: v for t, v in ifd0.items() if t not in (_TAG_EXIF_IFD, _TAG_GPS_IFD)}
    return endian, {"ifd0": ifd0, "exif": exif, "gps": gps}


def _serialize_tiff(endian: str, tree: dict[str, dict[int, tuple[int, int, bytes]]]) -> bytes:
    """Re-serialize the tree with recomputed offsets (entries tag-sorted
    per the TIFF spec; out-of-line values in a shared heap)."""
    ifd0 = dict(tree.get("ifd0", {}))
    exif = dict(tree.get("exif", {}))
    gps = dict(tree.get("gps", {}))

    def ifd_size(entries: dict) -> int:
        return 2 + 12 * len(entries) + 4

    # IFD0 carries pointer tags to the sub-IFDs when they are non-empty
    n_ifd0 = len(ifd0) + (1 if exif else 0) + (1 if gps else 0)
    ifd0_off = 8
    exif_off = ifd0_off + 2 + 12 * n_ifd0 + 4
    gps_off = exif_off + (ifd_size(exif) if exif else 0)
    heap_off = gps_off + (ifd_size(gps) if gps else 0)

    heap = bytearray()

    def entry_bytes(tag: int, typ: int, cnt: int, val: bytes) -> bytes:
        out = struct.pack(endian + "HHI", tag, typ, cnt)
        if len(val) <= 4:
            return out + val.ljust(4, b"\x00")
        off = heap_off + len(heap)
        heap.extend(val)
        if len(heap) % 2:  # word-align heap values
            heap.append(0)
        return out + struct.pack(endian + "I", off)

    def ifd_bytes(entries: dict, extra: dict | None = None) -> bytes:
        items = dict(entries)
        if extra:
            items.update(extra)
        body = b"".join(
            entry_bytes(tag, typ, cnt, val)
            for tag, (typ, cnt, val) in sorted(items.items())
        )
        return struct.pack(endian + "H", len(items)) + body + b"\x00\x00\x00\x00"

    pointers: dict[int, tuple[int, int, bytes]] = {}
    if exif:
        pointers[_TAG_EXIF_IFD] = (4, 1, struct.pack(endian + "I", exif_off))
    if gps:
        pointers[_TAG_GPS_IFD] = (4, 1, struct.pack(endian + "I", gps_off))
    # heap fills as IFDs serialize, in order
    out0 = ifd_bytes(ifd0, pointers)
    oute = ifd_bytes(exif) if exif else b""
    outg = ifd_bytes(gps) if gps else b""
    header = (b"II" if endian == "<" else b"MM") + struct.pack(endian + "HI", 42, 8)
    return header + out0 + oute + outg + bytes(heap)


def _replace_app1(jpeg: bytes, tiff: bytes) -> bytes:
    """Splice a rebuilt Exif APP1 into the JPEG, preserving every other
    segment (scan data included) byte-for-byte."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    payload = b"Exif\x00\x00" + tiff
    new_app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    out = bytearray(b"\xff\xd8")
    out += new_app1
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker == 0xD9 or 0xD0 <= marker <= 0xD7:
            out += jpeg[pos : pos + 2]
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        is_old_exif = marker == 0xE1 and jpeg[pos + 4 : pos + 10] == b"Exif\x00\x00"
        if not is_old_exif:
            out += jpeg[pos : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDA:
            out += jpeg[pos:]
            return bytes(out)
    out += jpeg[pos:]
    return bytes(out)


def tag_ascii(s: str) -> tuple[int, int, bytes]:
    b = s.encode("ascii") + b"\x00"
    return (2, len(b), b)


def tag_short(endian: str, *vals: int) -> tuple[int, int, bytes]:
    return (3, len(vals), b"".join(struct.pack(endian + "H", v) for v in vals))


def tag_long(endian: str, *vals: int) -> tuple[int, int, bytes]:
    return (4, len(vals), b"".join(struct.pack(endian + "I", v) for v in vals))


def tag_rational(endian: str, *pairs: tuple[int, int]) -> tuple[int, int, bytes]:
    return (5, len(pairs), b"".join(struct.pack(endian + "II", n, d) for n, d in pairs))


def edit_exif(
    jpeg: bytes,
    set_tags: dict[tuple[str, int], tuple[int, int, bytes]] | None = None,
    remove_tags: list[tuple[str, int]] | None = None,
) -> bytes:
    """General EXIF tag editor (W12 — exifeditor.cpp parity, superseding
    the GPS-only ``set_gps`` for arbitrary tags): parse the full
    ifd0/exif/gps tree preserving EVERY existing tag, apply the
    set/remove patch, re-serialize with recomputed offsets, and splice
    the rebuilt APP1 back into the JPEG.

    ``set_tags`` maps ("ifd0"|"exif"|"gps", tag_id) → (type, count,
    value_bytes); build values with the ``tag_*`` helpers using the
    file's endianness from ``read_exif_tree``."""
    endian, tree = read_exif_tree(jpeg)
    for (ifd, tag), val in (set_tags or {}).items():
        tree[ifd][tag] = val
    for ifd, tag in remove_tags or []:
        tree[ifd].pop(tag, None)
    return _replace_app1(jpeg, _serialize_tiff(endian, tree))
