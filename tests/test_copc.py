"""COPC container round-trips + query pruning (sources/copc.py)."""

import numpy as np

from dronedb_spark.sources.copc import (
    copc_hierarchy,
    copc_info,
    copc_query,
    encode_copc,
)
from dronedb_spark.sources.las import decode_las, las_info


def _cloud(n=20000, i=0):
    k = np.arange(n, dtype=np.int64)
    return {
        "x": ((i * 31 + k * 7919) % 10007) * 0.01,
        "y": ((i * 17 + k * 104729) % 10007) * 0.01,
        "z": ((i * 7 + k * 23) % 9000) * 0.01,
        "classification": (i + k) % 32,
        "intensity": (k * 13) % 5000,
        "gps_time": 50000.0 + k * 0.0005,
    }


def test_copc_is_valid_laz14():
    """A COPC file must read as a plain LAS 1.4 LAZ file — same point
    set, any order."""
    c = _cloud(12000)
    data = encode_copc(c["x"], c["y"], c["z"], node_capacity=2000, grid=12,
                       classification=c["classification"])
    info = las_info(data)
    assert info["version"] == "1.4" and info["point_format"] == 6 and info["compressed"]
    d = decode_las(data)
    assert len(d["x"]) == 12000
    got = sorted(zip(np.round(d["x"], 3), np.round(d["y"], 3), d["classification"]))
    exp = sorted(zip(np.round(c["x"], 3), np.round(c["y"], 3), c["classification"]))
    assert got == exp


def test_copc_info_and_hierarchy():
    c = _cloud(15000)
    data = encode_copc(c["x"], c["y"], c["z"], node_capacity=2000, grid=12,
                       gps_time=c["gps_time"])
    info = copc_info(data)
    assert info["halfsize"] > 0 and info["spacing"] > 0
    assert abs(info["gpstime_min"] - 50000.0) < 1e-9
    ents = copc_hierarchy(data)
    assert sum(e["count"] for e in ents) == 15000
    assert len({e["key"] for e in ents}) == len(ents)  # unique voxel keys
    levels = {e["key"][0] for e in ents}
    assert 0 in levels and len(levels) > 1  # actual octree, not one page
    # every child key must be inside its parent's voxel range
    keys = {e["key"] for e in ents}
    for lvl, kx, ky, kz in keys:
        assert 0 <= kx < (1 << lvl) and 0 <= ky < (1 << lvl) and 0 <= kz < (1 << lvl)


def test_copc_query_prunes_and_is_exact():
    c = _cloud(20000)
    data = encode_copc(c["x"], c["y"], c["z"], node_capacity=2500, grid=12,
                       classification=c["classification"], intensity=c["intensity"])
    bbox = (10.0, 10.0, 40.0, 40.0)
    pts, st = copc_query(data, bbox=bbox)
    m = (c["x"] >= 10) & (c["x"] <= 40) & (c["y"] >= 10) & (c["y"] <= 40)
    assert len(pts["x"]) == m.sum()
    assert st["nodes_decoded"] < st["nodes_total"]  # the pruning contract
    got = sorted(zip(np.round(pts["x"], 3), np.round(pts["y"], 3), pts["intensity"]))
    exp = sorted(zip(np.round(c["x"][m], 3), np.round(c["y"][m], 3), c["intensity"][m]))
    assert got == exp


def test_copc_lod_query():
    """max_level=0 reads only the root's sampled preview."""
    c = _cloud(20000)
    data = encode_copc(c["x"], c["y"], c["z"], node_capacity=2500, grid=12)
    pts, st = copc_query(data, max_level=0)
    assert st["nodes_decoded"] == 1
    assert 0 < len(pts["x"]) <= 12 * 12 * 12  # at most one point per root cell


def test_copc_selective_fields():
    c = _cloud(8000)
    data = encode_copc(c["x"], c["y"], c["z"], node_capacity=2000, grid=12,
                       intensity=c["intensity"])
    full, _ = copc_query(data, bbox=(0, 0, 50, 50))
    sel, _ = copc_query(data, bbox=(0, 0, 50, 50), want={"z"})
    assert np.allclose(np.sort(sel["x"]), np.sort(full["x"]))
    assert np.allclose(np.sort(sel["z"]), np.sort(full["z"]))
