"""WKB wire format (SURVEY.md §1.3 geometry wire row).

Encodes the engine's rank-4 ragged coordinates to standard little-endian
ISO WKB and back (Point/MultiPoint/LineString/MultiLineString/Polygon/
MultiPolygon, 2-D). PySpark 4.1 ships GeometryType storage functions —
``st_geomfromwkb``/``st_asbinary`` — but no spatial predicates [SURVEY §0];
this module is the bridge: our decode layer emits WKB, the native functions
wrap it into GeometryType(srid) for storage/interop, and computation stays
on the struct/array form.
"""

from __future__ import annotations

import struct

import numpy as np

_TYPES = {"Point": 1, "LineString": 2, "Polygon": 3,
          "MultiPoint": 4, "MultiLineString": 5, "MultiPolygon": 6}
_NAMES = {v: k for k, v in _TYPES.items()}


def _pts(points) -> bytes:
    arr = np.asarray(points, dtype="<f8")[:, :2]
    return struct.pack("<I", arr.shape[0]) + arr.tobytes()


def geojson_to_wkb(geom: dict) -> bytes:
    """GeoJSON-style {type, coordinates} → little-endian WKB."""
    t, c = geom["type"], geom["coordinates"]
    head = struct.pack("<BI", 1, _TYPES[t])
    if t == "Point":
        return head + struct.pack("<dd", float(c[0]), float(c[1]))
    if t == "LineString":
        return head + _pts(c)
    if t == "Polygon":
        return (head + struct.pack("<I", len(c))
                + b"".join(_pts(r) for r in c))
    if t == "MultiPoint":
        return (head + struct.pack("<I", len(c))
                + b"".join(geojson_to_wkb({"type": "Point",
                                           "coordinates": p}) for p in c))
    if t == "MultiLineString":
        return (head + struct.pack("<I", len(c))
                + b"".join(geojson_to_wkb({"type": "LineString",
                                           "coordinates": l}) for l in c))
    if t == "MultiPolygon":
        return (head + struct.pack("<I", len(c))
                + b"".join(geojson_to_wkb({"type": "Polygon",
                                           "coordinates": p}) for p in c))
    raise ValueError(f"unsupported geometry type {t}")


def _read_pts(buf: bytes, off: int):
    (n,) = struct.unpack_from("<I", buf, off)
    pts = np.frombuffer(buf, "<f8", n * 2, off + 4).reshape(n, 2)
    return pts.tolist(), off + 4 + 16 * n


def wkb_to_geojson(buf: bytes, off: int = 0) -> tuple[dict, int]:
    """little-endian WKB → ({type, coordinates}, bytes_consumed_end)."""
    byte_order, wtype = struct.unpack_from("<BI", buf, off)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    off += 5
    name = _NAMES[wtype & 0xFF]
    if name == "Point":
        x, y = struct.unpack_from("<dd", buf, off)
        return {"type": "Point", "coordinates": [x, y]}, off + 16
    if name == "LineString":
        pts, off = _read_pts(buf, off)
        return {"type": "LineString", "coordinates": pts}, off
    if name == "Polygon":
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        rings = []
        for _ in range(n):
            r, off = _read_pts(buf, off)
            rings.append(r)
        return {"type": "Polygon", "coordinates": rings}, off
    (n,) = struct.unpack_from("<I", buf, off)
    off += 4
    parts = []
    for _ in range(n):
        g, off = wkb_to_geojson(buf, off)
        parts.append(g["coordinates"])
    return {"type": name, "coordinates": parts}, off
