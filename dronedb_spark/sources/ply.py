"""Pure-Python PLY point-cloud reader/writer (public Stanford PLY spec).

Closes the S9 decode seam for the canonical interchange format: the
point-cloud operators (COPC z-order pages, tile rasters, stats) can run
on REAL `.ply` bytes.  Scope: `format ascii 1.0` and
`format binary_little_endian 1.0`, vertex element with scalar properties
(the splat `f_dc_*` properties the fingerprinter sniffs are scalars too);
list properties on non-vertex elements (faces) are skipped.
Reference role-equivalent: PDAL-backed getPointCloudInfo
(../reference point-cloud info path) minus the PDAL dependency.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPES = {
    "char": ("i1", 1), "int8": ("i1", 1),
    "uchar": ("u1", 1), "uint8": ("u1", 1),
    "short": ("i2", 2), "int16": ("i2", 2),
    "ushort": ("u2", 2), "uint16": ("u2", 2),
    "int": ("i4", 4), "int32": ("i4", 4),
    "uint": ("u4", 4), "uint32": ("u4", 4),
    "float": ("f4", 4), "float32": ("f4", 4),
    "double": ("f8", 8), "float64": ("f8", 8),
}


def encode_ply(
    props: dict[str, np.ndarray], binary: bool = True, dtypes: dict[str, str] | None = None
) -> bytes:
    """Write a vertex-only PLY. ``props`` maps property name → 1-D array
    (all the same length); ``dtypes`` optionally names the PLY type per
    property (default float)."""
    names = list(props)
    n = len(props[names[0]])
    dtypes = dtypes or {}
    cols, header_props = [], []
    for name in names:
        ply_t = dtypes.get(name, "float")
        np_t, _ = _TYPES[ply_t]
        header_props.append(f"property {ply_t} {name}")
        cols.append(np.asarray(props[name]).astype(np_t))
    fmt = "binary_little_endian" if binary else "ascii"
    header = (
        "ply\n"
        f"format {fmt} 1.0\n"
        "comment dronedb_spark fixture\n"
        f"element vertex {n}\n" + "\n".join(header_props) + "\nend_header\n"
    ).encode("ascii")
    if binary:
        rec = np.rec.fromarrays(cols, names=names)
        return header + rec.tobytes()
    lines = []
    for i in range(n):
        vals = []
        for c in cols:
            v = c[i]
            vals.append(str(int(v)) if np.issubdtype(c.dtype, np.integer) else repr(float(v)))
        lines.append(" ".join(vals))
    return header + ("\n".join(lines) + "\n").encode("ascii")


def decode_ply(data: bytes) -> dict[str, np.ndarray]:
    """Parse a PLY and return the VERTEX element's properties as float64
    arrays keyed by property name."""
    end = data.find(b"end_header\n")
    if not data.startswith(b"ply") or end < 0:
        raise ValueError("not a PLY")
    header = data[: end + 11].decode("ascii", errors="replace")
    body = data[end + 11 :]
    fmt = None
    elements: list[tuple[str, int, list[tuple[str, str]]]] = []  # (name, count, [(type, prop)])
    for line in header.splitlines():
        parts = line.strip().split()
        if not parts:
            continue
        if parts[0] == "format":
            fmt = parts[1]
        elif parts[0] == "element":
            elements.append((parts[1], int(parts[2]), []))
        elif parts[0] == "property" and elements:
            if parts[1] == "list":
                elements[-1][2].append(("list:" + parts[2] + ":" + parts[3], parts[-1]))
            else:
                elements[-1][2].append((parts[1], parts[2]))
    if fmt not in ("ascii", "binary_little_endian"):
        raise NotImplementedError(f"PLY format {fmt}")

    out: dict[str, np.ndarray] = {}
    offset = 0
    if fmt == "binary_little_endian":
        for name, count, props in elements:
            if any(t.startswith("list:") for t, _ in props):
                # variable-length records (faces): walk to skip, never after vertex
                if name == "vertex":
                    raise NotImplementedError("list property on vertex element")
                for _ in range(count):
                    for t, _p in props:
                        if t.startswith("list:"):
                            _, cnt_t, item_t = t.split(":")
                            k = int.from_bytes(
                                body[offset : offset + _TYPES[cnt_t][1]], "little"
                            )
                            offset += _TYPES[cnt_t][1] + k * _TYPES[item_t][1]
                        else:
                            offset += _TYPES[t][1]
                continue
            dt = np.dtype([(p, "<" + _TYPES[t][0]) for t, p in props])
            rec = np.frombuffer(body, dtype=dt, count=count, offset=offset)
            offset += dt.itemsize * count
            if name == "vertex":
                for _t, p in props:
                    out[p] = rec[p].astype(np.float64)
        return out

    # ascii
    text = body.decode("ascii", errors="replace").split()
    pos = 0
    for name, count, props in elements:
        if any(t.startswith("list:") for t, _ in props):
            for _ in range(count):
                for t, _p in props:
                    if t.startswith("list:"):
                        k = int(text[pos]); pos += 1 + k
                    else:
                        pos += 1
            continue
        width = len(props)
        vals = np.array(text[pos : pos + count * width], dtype=np.float64).reshape(count, width)
        pos += count * width
        if name == "vertex":
            for j, (_t, p) in enumerate(props):
                out[p] = vals[:, j]
    return out
