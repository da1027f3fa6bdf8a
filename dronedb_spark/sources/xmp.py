"""XMP packet extraction — the drone-pose metadata side of ingest
(reference: Exiv2 XMP keys consumed in exif.cpp:669-875 and
entry.cpp:176-226).

A JPEG carries XMP as an APP1 segment whose payload starts with the
namespace header ``http://ns.adobe.com/xap/1.0/\\0`` followed by an
RDF/XML packet.  Drone writers (DJI, Pix4D, GPano) put their fields as
ATTRIBUTES of ``rdf:Description`` (occasionally as child elements —
both are handled).  Keys normalize to the Exiv2-style ``prefix:Local``
names the reference matches on, via the public namespace URIs.
"""

from __future__ import annotations

import re
import struct
import xml.etree.ElementTree as ET

_XAP_HEADER = b"http://ns.adobe.com/xap/1.0/\x00"

# public namespace URIs → the Exiv2 prefix the reference matches on
NS_PREFIXES = {
    "http://www.dji.com/drone-dji/1.0/": "drone-dji",
    "http://pix4d.com/camera/1.0/": "Camera",
    "http://ns.google.com/photos/1.0/panorama/": "GPano",
    "http://www.video/": "video",
    "http://ns.flir.com/xmp/1.0/": "FLIR",
    "http://ns.adobe.com/xap/1.0/": "xmp",
}

_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def extract_xmp_packet(jpeg: bytes) -> str | None:
    """Walk the JPEG marker stream for the XMP APP1 segment."""
    if jpeg[:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            break
        marker = jpeg[pos + 1]
        if marker == 0xD9 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xDA:
            break
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker == 0xE1 and jpeg[pos + 4 : pos + 4 + len(_XAP_HEADER)] == _XAP_HEADER:
            raw = jpeg[pos + 4 + len(_XAP_HEADER) : pos + 2 + seglen]
            return raw.decode("utf-8", errors="replace")
        pos += 2 + seglen
    return None


def _prefix_of(uri: str) -> str:
    p = NS_PREFIXES.get(uri)
    if p:
        return p
    return uri.rstrip("/#").rsplit("/", 1)[-1]


def parse_xmp(xml_text: str) -> dict[str, str]:
    """RDF/XML packet → {"prefix:Local": value} for every attribute and
    simple-text child of each rdf:Description."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return {}
    out: dict[str, str] = {}
    for desc in root.iter(f"{{{_RDF_NS}}}Description"):
        for qname, value in desc.attrib.items():
            m = re.match(r"\{(.+)\}(.+)", qname)
            if not m:
                continue
            uri, local = m.groups()
            if uri == _RDF_NS:
                continue
            out[f"{_prefix_of(uri)}:{local}"] = value
        for child in desc:
            m = re.match(r"\{(.+)\}(.+)", child.tag)
            if m and child.text is not None and not len(child):
                uri, local = m.groups()
                if uri != _RDF_NS:
                    out[f"{_prefix_of(uri)}:{local}"] = child.text.strip()
    return out


def _num(d: dict[str, str], *keys: str) -> float | None:
    """First present key parsed as float (DJI writes '+1.20' signs)."""
    for k in keys:
        v = d.get(k)
        if v is None:
            continue
        try:
            return float(v.replace("+", "", 1) if v.startswith("+") else v)
        except ValueError:
            continue
    return None


def camera_orientation(xmp: dict[str, str]) -> tuple[float, float, float, bool]:
    """(pitch, yaw, roll, present) — extractCameraOrientation
    (exif.cpp:667-692): DJI gimbal keys first, Pix4D Camera keys second;
    any missing component ⇒ the nadir default (-90, 0, 0, False)."""
    pitch = _num(xmp, "drone-dji:GimbalPitchDegree", "Camera:Pitch")
    yaw = _num(
        xmp, "drone-dji:GimbalYawDegree", "drone-dji:FlightYawDegree", "Camera:Yaw"
    )
    roll = _num(xmp, "drone-dji:GimbalRollDegree", "Camera:Roll")
    if pitch is None or yaw is None or roll is None:
        return (-90.0, 0.0, 0.0, False)
    return (pitch, yaw, roll, True)


def rel_altitude(xmp: dict[str, str]) -> float | None:
    """Xmp.drone-dji.RelativeAltitude (exif.cpp:395-404); the world-DSM
    estimate fallback (DSMService network fetch) is out of scope."""
    return _num(xmp, "drone-dji:RelativeAltitude")


def flight_speed(xmp: dict[str, str]) -> tuple[float, float, float] | None:
    """(x, y, z) m/s — extractFlightSpeed (exif.cpp:694-739)."""
    x = _num(xmp, "drone-dji:FlightXSpeed")
    y = _num(xmp, "drone-dji:FlightYSpeed")
    z = _num(xmp, "drone-dji:FlightZSpeed")
    if x is None or y is None or z is None:
        return None
    return (x, y, z)


def gps_accuracy(xmp: dict[str, str]) -> dict[str, float]:
    """extractGpsAccuracy (exif.cpp:741-798): Pix4D XY/Z accuracy keys,
    or the DJI RTK per-axis standard deviations combined as the planar
    vector norm (xy = sqrt(lonStd² + latStd²), z = hgt std) — the
    reference's exact combine at exif.cpp:768-771."""
    out: dict[str, float] = {}
    xy = _num(xmp, "Camera:GPSXYAccuracy")
    z = _num(xmp, "Camera:GPSZAccuracy")
    if xy is None and z is None:
        lon = _num(xmp, "drone-dji:RtkStdLon")
        lat = _num(xmp, "drone-dji:RtkStdLat")
        if lon is not None and lat is not None:
            xy = (lon * lon + lat * lat) ** 0.5
        z = _num(xmp, "drone-dji:RtkStdHgt")
    if xy is not None and xy >= 0:
        out["gpsXYAccuracy"] = xy
    if z is not None and z >= 0:
        out["gpsZAccuracy"] = z
    return out


def build_xmp_jpeg_segment(attrs: dict[str, str]) -> bytes:
    """Fixture builder: a REAL XMP APP1 segment (marker + length + XAP
    header + RDF/XML) carrying ``attrs`` keyed by ``prefix:Local``."""
    used = sorted({k.split(":", 1)[0] for k in attrs})
    uri_of = {v: k for k, v in NS_PREFIXES.items()}
    decls = " ".join(f'xmlns:{p}="{uri_of[p]}"' for p in used)
    fields = " ".join(f'{k}="{v}"' for k, v in sorted(attrs.items()))
    xml = (
        '<x:xmpmeta xmlns:x="adobe:ns:meta/">'
        f'<rdf:RDF xmlns:rdf="{_RDF_NS}">'
        f"<rdf:Description rdf:about='' {decls} {fields}/>"
        "</rdf:RDF></x:xmpmeta>"
    )
    payload = _XAP_HEADER + xml.encode("utf-8")
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
