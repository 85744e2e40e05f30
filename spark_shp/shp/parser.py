"""Vectorized SHP/DBF decode kernels (SURVEY.md §2.A, A1–A15).

Semantics replicate upstream shpjs (`lib/parseShp.js`, `parsedbf/index.js`
[RECONSTRUCTED — SURVEY.md §0]; byte offsets independently pinned by the
public ESRI Shapefile Technical Description and dBASE spec):

* M-fold (A9): shape codes > 20 are reduced by 20, M values dropped.
* Null shape (A10): record emitted with geometry None (keeps positional
  alignment with DBF for the combine join).
* Unknown shape code (A11): raises ``I don't know shp type "N"`` verbatim.
* Polygon assembly (A6): geom.assemble_rings — CW ring (positive shoelace,
  zero-area translation tie-break) or first ring starts a polygon; other
  rings attach as holes of the most recent polygon.
* Record scan (A2): trusts actual buffer length over the header's file
  length (header-length lie guard).
* DBF numerics (A14): JS ``parseFloat`` semantics — leading-float prefix
  parse; blank/garbage → NaN (not NULL).
* Reprojection (A12): .prj WKT → inverse transform to WGS84 at decode time;
  malformed/unknown WKT → identity (reference try/catch behavior).

Coordinate decode is numpy ``frombuffer`` per record — the reference's
per-coordinate DataView loop becomes one vectorized read (SURVEY §4.2).
"""

from __future__ import annotations

import math
import re

import numpy as np

from ..geom import assemble_rings

_HAS_Z = {11, 13, 15, 18}


def parse_header(buf: bytes) -> dict:
    """A1: 100-byte SHP header."""
    if len(buf) < 100:
        raise ValueError("SHP buffer shorter than 100-byte header")
    file_len_words = int(np.frombuffer(buf, ">i4", 1, 24)[0])
    version = int(np.frombuffer(buf, "<i4", 1, 28)[0])
    shp_type = int(np.frombuffer(buf, "<i4", 1, 32)[0])
    bbox = np.frombuffer(buf, "<f8", 4, 36)
    return {"length": file_len_words * 2, "version": version,
            "type": shp_type,
            "bbox": (float(bbox[0]), float(bbox[1]),
                     float(bbox[2]), float(bbox[3]))}


def record_scan(buf: bytes):
    """A2: yield (rec_no, rec_type, payload) from offset 100.

    Uses the real buffer length (not the header's), mirroring the
    reference's guard against lying headers."""
    import struct
    be = struct.Struct(">ii").unpack_from
    le = struct.Struct("<i").unpack_from
    off, n = 100, len(buf)
    while off + 12 <= n:
        rec_no, content_words = be(buf, off)
        rec_type, = le(buf, off + 8)
        content_len = content_words * 2
        if content_len < 4 or off + 8 + content_len > n:
            # content_len < 4: corrupt header — record content can never be
            # smaller than the 4-byte shape type, and a non-positive length
            # would stop `off` advancing (content_words=-4 made this loop
            # spin forever) or walk backwards.
            # off+8+content_len > n: truncated trailing record — the payload
            # the header promises is not all there. Either way stop at the
            # last intact record rather than handing garbage to the parsers.
            return
        payload = buf[off + 12: off + 8 + content_len]
        yield rec_no, rec_type, payload
        off += 8 + content_len


def _check_type(num: int) -> tuple[int, bool]:
    """A9/A11: M-fold and unknown-type error. → (base_type, had_m).

    Only the spec's M codes (21/23/25/28) fold by −20; any other code —
    including MultiPatch(31) — raises the reference's message with the
    ORIGINAL number."""
    is_m = num in (21, 23, 25, 28)
    folded = num - 20 if is_m else num
    if folded not in (0, 1, 3, 5, 8, 11, 13, 15, 18):
        raise ValueError(f'I don\'t know shp type "{num}"')
    return folded, is_m


def _xy(payload: bytes, count: int, offset: int, trans=None) -> np.ndarray:
    pts = np.frombuffer(payload, "<f8", count * 2, offset).reshape(count, 2)
    if trans is not None:
        pts = trans(pts)
    return pts


def _parse_parts(payload: bytes, has_z: bool, trans=None):
    """Shared PolyLine/Polygon body: bbox(32) numParts numPoints parts pts
    [+ z-range + z per point]; M block (if trailing) ignored."""
    num_parts = int(np.frombuffer(payload, "<i4", 1, 32)[0])
    num_points = int(np.frombuffer(payload, "<i4", 1, 36)[0])
    parts = np.frombuffer(payload, "<i4", num_parts, 40)
    pts_off = 40 + 4 * num_parts
    pts = _xy(payload, num_points, pts_off, trans)
    if has_z:
        z_off = pts_off + 16 * num_points + 16  # skip zmin/zmax
        z = np.frombuffer(payload, "<f8", num_points, z_off)
        pts = np.column_stack([pts, z])
    bounds = list(parts[1:]) + [num_points]
    return [pts[s:e] for s, e in zip(parts, bounds)]


def parse_record(rec_type: int, payload: bytes, trans=None):
    """One record → GeoJSON-style dict or None (null shape).

    ``trans``: optional (n,2)->(n,2) inverse-projection (A12)."""
    if rec_type == 0:
        return None
    base, _ = _check_type(rec_type)
    has_z = base in _HAS_Z
    base_flat = base - 10 if has_z else base

    if base_flat == 1:  # Point / PointZ (A3, A7)
        pt = _xy(payload, 1, 0, trans)[0]
        coords = [float(pt[0]), float(pt[1])]
        if has_z:
            coords.append(float(np.frombuffer(payload, "<f8", 1, 16)[0]))
        return {"type": "Point", "coordinates": coords}

    if base_flat == 8:  # MultiPoint / Z (A4, A8)
        n = int(np.frombuffer(payload, "<i4", 1, 32)[0])
        pts = _xy(payload, n, 36, trans)
        if has_z:
            z = np.frombuffer(payload, "<f8", n, 36 + 16 * n + 16)
            pts = np.column_stack([pts, z])
        return {"type": "MultiPoint", "coordinates": pts.tolist()}

    if base_flat == 3:  # PolyLine / Z (A5, A8)
        parts = _parse_parts(payload, has_z, trans)
        if len(parts) == 1:
            return {"type": "LineString", "coordinates": parts[0].tolist()}
        return {"type": "MultiLineString",
                "coordinates": [p.tolist() for p in parts]}

    if base_flat == 5:  # Polygon / Z (A6, A8)
        rings = _parse_parts(payload, has_z, trans)
        # Assembly decisions use xy winding only; assemble_rings consumes
        # rings in file order, so the full (xyz) rings map back positionally.
        polys = assemble_rings([r[:, :2] for r in rings])
        coords, pos = [], 0
        for poly in polys:
            coords.append([rings[pos + i].tolist()
                           for i in range(len(poly))])
            pos += len(poly)
        if len(coords) == 1:
            return {"type": "Polygon", "coordinates": coords[0]}
        return {"type": "MultiPolygon", "coordinates": coords}

    raise AssertionError("unreachable")


def parse_shp(buf: bytes, trans=None) -> list:
    """A1+A2+A3..A11: full .shp buffer → list of geometries (None = null).

    The HEADER type drives the M-fold/unknown check like the reference's
    dispatch-table construction; per-record types 0 are emitted as null."""
    header = parse_header(buf)
    _check_type(header["type"])
    out = []
    for _rec_no, rec_type, payload in record_scan(buf):
        out.append(parse_record(rec_type, payload, trans))
    return out


_POINT_REC = np.dtype([("rec_no", ">i4"), ("len_words", ">i4"),
                       ("shape", "<i4"), ("x", "<f8"), ("y", "<f8")])


def parse_shp_points_columns(buf: bytes, trans=None):
    """Columnar fast path for uniform Point files: ONE strided frombuffer
    decodes the whole buffer at memory bandwidth (~100x the per-record
    dict loop). Returns (rec_no:int64, x:f64, y:f64) arrays, or None when
    the file is not a uniform fixed-stride type-1 file (mixed null shapes,
    irregular content lengths, other geometry) — callers fall back to
    :func:`parse_shp`, whose per-record semantics stay the parity
    reference. Validation is total (every record header checked), so the
    fast path can never silently mis-decode a file the slow path would
    reject or read differently."""
    if len(buf) < 100:
        return None
    header = parse_header(buf)
    if header["type"] != 1:
        return None
    body = memoryview(buf)[100:]
    n, rem = divmod(len(body), _POINT_REC.itemsize)
    if n == 0 or rem:
        return None
    arr = np.frombuffer(body, dtype=_POINT_REC)
    if not (np.all(arr["len_words"] == 10) and np.all(arr["shape"] == 1)):
        return None
    x = arr["x"].astype(np.float64)
    y = arr["y"].astype(np.float64)
    if trans is not None:
        pts = trans(np.column_stack([x, y]))
        x, y = pts[:, 0], pts[:, 1]
    return arr["rec_no"].astype(np.int64), x, y


def parse_shp_vertices_columns(buf: bytes, trans=None):
    """Columnar vertex decode for uniform PolyLine(3)/Polygon(5)/
    MultiPoint(8) files: flat arrays (rec_no, part_no, pt_no, x, y) — the
    shape spatial indexing consumes at scale (tile-assign per vertex,
    cover building) — without per-record GeoJSON dict/list nesting.

    ~15 small numpy ops per record + one concatenate for the coordinate
    blocks, vs hundreds of Python ops per record on the parity path.
    Returns None for any other layout (Point files → use
    parse_shp_points_columns; Z/M, null shapes, irregular records → caller
    falls back to parse_shp). part_no is the FILE-ORDER part index (for
    Polygon that's the raw ring index, before A6 ring-assembly regroups
    rings into polygons/holes — indexing wants raw vertices; assembly
    semantics live in the parity path); pt_no counts within a part; both
    0-based. MultiPoint is a single part 0.
    """
    import struct

    if len(buf) < 100:
        return None
    header = parse_header(buf)
    base = header["type"]
    if base not in (3, 5, 8):
        return None
    be = struct.Struct(">ii").unpack_from
    le3 = struct.Struct("<3i").unpack_from   # type, (bbox skipped), counts
    le = struct.Struct("<i").unpack_from
    # pass 1: record headers + counts only (3 cheap unpack_from per record);
    # everything payload-sized is gathered vectorized in pass 2
    recs, n = [], len(buf)
    off = 100
    while off + 12 <= n:
        rec_no, content_words = be(buf, off)
        content_len = content_words * 2
        if content_len < 4 or off + 8 + content_len > n:
            break  # corrupt or truncated header — same guard as record_scan
        rec_type, = le(buf, off + 8)
        if rec_type != base:
            return None                      # null shape / mixed → parity
        body = off + 12                      # past the 4-byte type
        if base == 8:
            if content_len < 40:
                return None
            n_parts, n_pts = 1, le(buf, body + 32)[0]
            pts_off = body + 36
            if content_len != 4 + 36 + 16 * n_pts:
                return None                  # trailing M/Z → parity path
            parts_off = -1
        else:
            if content_len < 44:
                return None
            n_parts, = le(buf, body + 32)
            n_pts, = le(buf, body + 36)
            parts_off = body + 40
            pts_off = parts_off + 4 * n_parts
            if n_parts <= 0 or content_len != 4 + 40 + 4 * n_parts + 16 * n_pts:
                return None
        recs.append((rec_no, n_parts, n_pts, parts_off, pts_off))
        off += 8 + content_len
    if not recs:
        return None
    ra = np.array(recs, dtype=np.int64)
    rec_ids, n_parts_a, n_pts_a = ra[:, 0], ra[:, 1], ra[:, 2]
    parts_offs, pts_offs = ra[:, 3], ra[:, 4]
    raw = np.frombuffer(buf, np.uint8)

    def gather(starts, lens):
        """Vectorized ranges→bytes: one fancy-index gather, O(total).

        When every (start, len) is 8- or 4-aligned — true for the parts
        and coordinate tables of well-formed files, whose offsets and
        sizes are all multiples of 4 — the gather runs on an int64/int32
        view of the buffer: 4–8x fewer indices to materialize and move
        (the round-1 residual lever, ~0.3 s per 38 MB at byte
        granularity). Falls back to the byte gather otherwise."""
        total = int(lens.sum())
        for unit, code in ((8, "<u8"), (4, "<u4")):
            if (not np.any(starts % unit)) and (not np.any(lens % unit)):
                v = raw[: (len(raw) // unit) * unit].view(code)
                lu = lens // unit
                seg_starts = np.cumsum(lu) - lu
                within = (np.arange(total // unit, dtype=np.int64)
                          - np.repeat(seg_starts, lu))
                out = v[np.repeat(starts // unit, lu) + within]
                return out.view(np.uint8)
        seg_starts = np.cumsum(lens) - lens
        within = np.arange(total, dtype=np.int64) - np.repeat(seg_starts,
                                                              lens)
        return raw[np.repeat(starts, lens) + within]

    # parts tables (polyline/polygon): batched validation, no per-record ops
    if base != 8:
        parts = gather(parts_offs, 4 * n_parts_a).view("<i4").astype(
            np.int64)
        bounds = np.cumsum(n_parts_a) - n_parts_a    # first part per record
        if np.any(parts[bounds] != 0):
            return None
        d = np.diff(parts)
        interior = np.ones(len(parts) - 1, dtype=bool)
        interior[bounds[1:] - 1] = False             # diffs across records
        if np.any(d[interior] <= 0):
            return None
        if np.any(parts >= np.repeat(n_pts_a, n_parts_a)):
            return None
        nxt = np.empty(len(parts), dtype=np.int64)
        nxt[:-1] = parts[1:]
        nxt[np.cumsum(n_parts_a) - 1] = n_pts_a      # last part ends at n_pts
        sizes = nxt - parts
    else:
        sizes = n_pts_a.copy()
    xy = gather(pts_offs, 16 * n_pts_a).view("<f8").reshape(-1, 2)
    if trans is not None:
        xy = trans(xy)
    total_parts = int(n_parts_a.sum())
    rec_no = np.repeat(rec_ids, n_pts_a)
    part_idx = (np.arange(total_parts, dtype=np.int64)
                - np.repeat(np.cumsum(n_parts_a) - n_parts_a, n_parts_a))
    part_no = np.repeat(part_idx, sizes)
    part_starts = np.repeat(np.cumsum(sizes) - sizes, sizes)
    pt_no = np.arange(len(rec_no), dtype=np.int64) - part_starts
    return (rec_no, part_no, pt_no,
            np.ascontiguousarray(xy[:, 0]), np.ascontiguousarray(xy[:, 1]))


# --- A12: .prj WKT → inverse transform --------------------------------------

_R_MERC = 6378137.0


def _inv_webmerc(pts: np.ndarray) -> np.ndarray:
    lon = pts[:, 0] / _R_MERC * (180.0 / math.pi)
    lat = (2.0 * np.arctan(np.exp(pts[:, 1] / _R_MERC))
           - math.pi / 2.0) * (180.0 / math.pi)
    return np.column_stack([lon, lat])


def _wkt_params(wkt: str) -> dict:
    """PARAMETER["name", value] pairs (lower-cased names) from projected WKT."""
    return {m.group(1).lower(): float(m.group(2)) for m in re.finditer(
        r'PARAMETER\[\s*"([^"]+)"\s*,\s*([-+0-9.eE]+)', wkt, re.I)}


def _wkt_linear_unit(wkt: str) -> float:
    """Meters-per-unit of the PROJCS linear UNIT (the LAST ``UNIT[...]``
    in WKT1 — the GEOGCS's angular degree unit appears earlier, nested).
    US State Plane zones routinely ship in feet (0.3048...); treating
    those as meters silently corrupts every coordinate. An angular-looking
    factor in last position means malformed WKT → 1.0 (meters)."""
    units = re.findall(r'UNIT\[\s*"[^"]*"\s*,\s*([-+0-9.eE]+)', wkt, re.I)
    if not units:
        return 1.0
    factor = float(units[-1])
    return factor if factor > 0.01 else 1.0


def _with_unit(inv, unit: float):
    """Wrap an inverse so raw coordinates convert unit → meters first
    (false eastings/northings are converted where constants are built)."""
    if unit == 1.0 or inv is None:
        return inv

    def f(pts):
        return inv(np.asarray(pts, dtype=np.float64) * unit)

    return f


def _wkt_spheroid(wkt: str) -> tuple[float, float]:
    """(semi-major a, inverse flattening) from SPHEROID[...]; WGS84 default."""
    m = re.search(r'SPHEROID\[\s*"[^"]*"\s*,\s*([-+0-9.eE]+)\s*,'
                  r'\s*([-+0-9.eE]+)', wkt, re.I)
    if m:
        return float(m.group(1)), float(m.group(2))
    return 6378137.0, 298.257223563


def _e2_of(inv_f: float) -> float:
    """First eccentricity squared from inverse flattening; inv_f == 0 is
    the WKT convention for a SPHERE (MODIS sinusoidal, authalic-sphere
    grids) — e² = 0, every Snyder series below degenerates correctly."""
    if inv_f == 0.0:
        return 0.0
    return (2.0 - 1.0 / inv_f) / inv_f


def tmerc_constants(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                    k0: float, fe: float, fn: float) -> dict:
    """Point-independent Transverse-Mercator constants (Snyder 1987
    eq. 3-21/3-24/8-12..8-15). Shared by the numpy inverse kernel AND the
    DuckDB oracle SQL generator — both consume these exact float64 values,
    so the only cross-engine divergence left is libm sin/cos ulps, absorbed
    by the 1e-9° terminal rounding (same policy as the webmerc oracle)."""
    e2 = _e2_of(inv_f)                        # e^2 = 2f - f^2
    ep2 = e2 / (1.0 - e2)
    e1 = (1.0 - math.sqrt(1.0 - e2)) / (1.0 + math.sqrt(1.0 - e2))
    m_coef = (1.0 - e2 / 4.0 - 3.0 * e2 ** 2 / 64.0 - 5.0 * e2 ** 3 / 256.0)
    phi0 = math.radians(lat0_deg)
    m0 = a * (m_coef * phi0
              - (3.0 * e2 / 8.0 + 3.0 * e2 ** 2 / 32.0
                 + 45.0 * e2 ** 3 / 1024.0) * math.sin(2.0 * phi0)
              + (15.0 * e2 ** 2 / 256.0
                 + 45.0 * e2 ** 3 / 1024.0) * math.sin(4.0 * phi0)
              - (35.0 * e2 ** 3 / 3072.0) * math.sin(6.0 * phi0))
    return {
        "a": a, "k0": k0, "fe": fe, "fn": fn, "e2": e2, "ep2": ep2,
        "m_coef": m_coef, "m0": m0, "lam0": math.radians(lon0_deg),
        # rectifying-latitude series coefficients (Snyder eq. 3-24)
        "mu2": 3.0 * e1 / 2.0 - 27.0 * e1 ** 3 / 32.0,
        "mu4": 21.0 * e1 ** 2 / 16.0 - 55.0 * e1 ** 4 / 32.0,
        "mu6": 151.0 * e1 ** 3 / 96.0,
        "mu8": 1097.0 * e1 ** 4 / 512.0,
    }


def make_inv_tmerc(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                   k0: float, fe: float, fn: float):
    """Closed-form Transverse-Mercator inverse (UTM / Gauss–Krüger /
    State-Plane TM): USGS Snyder 1987 'Map Projections — A Working Manual'
    eq. 3-21 + 8-12..8-15 + 8-17..8-25 (public-domain series, ~0.1 mm over a
    UTM zone). Returns a vectorized (n,2) meters → (n,2) lon/lat° fn."""
    c = tmerc_constants(a, inv_f, lon0_deg, lat0_deg, k0, fe, fn)
    e2, ep2, m_coef, m0, lam0 = (c["e2"], c["ep2"], c["m_coef"], c["m0"],
                                 c["lam0"])
    mu2, mu4, mu6, mu8 = c["mu2"], c["mu4"], c["mu6"], c["mu8"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        m = m0 + y / k0
        mu = m / (a * m_coef)
        phi1 = (mu + mu2 * np.sin(2.0 * mu) + mu4 * np.sin(4.0 * mu)
                + mu6 * np.sin(6.0 * mu) + mu8 * np.sin(8.0 * mu))
        sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
        c1 = ep2 * cos1 * cos1
        t1 = tan1 * tan1
        w = 1.0 - e2 * sin1 * sin1
        n1 = a / np.sqrt(w)
        r1 = a * (1.0 - e2) / (w * np.sqrt(w))
        d = x / (n1 * k0)
        d2 = d * d
        phi = phi1 - (n1 * tan1 / r1) * (
            d2 / 2.0
            - (5.0 + 3.0 * t1 + 10.0 * c1 - 4.0 * c1 * c1
               - 9.0 * ep2) * d2 * d2 / 24.0
            + (61.0 + 90.0 * t1 + 298.0 * c1 + 45.0 * t1 * t1
               - 252.0 * ep2 - 3.0 * c1 * c1) * d2 * d2 * d2 / 720.0)
        lam = lam0 + (d
                      - (1.0 + 2.0 * t1 + c1) * d2 * d / 6.0
                      + (5.0 - 2.0 * c1 + 28.0 * t1 - 3.0 * c1 * c1
                         + 8.0 * ep2 + 24.0 * t1 * t1)
                      * d2 * d2 * d / 120.0) / cos1
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def _conic_m_t_q(e2: float, phi: float) -> tuple[float, float, float]:
    """Snyder conic helpers at latitude phi (radians): m (eq. 14-15),
    t (eq. 15-9), q (eq. 3-12)."""
    e = math.sqrt(e2)
    s = math.sin(phi)
    m = math.cos(phi) / math.sqrt(1.0 - e2 * s * s)
    t = (math.tan(math.pi / 4.0 - phi / 2.0)
         / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2.0))
    q = (1.0 - e2) * (s / (1.0 - e2 * s * s)
                      - (1.0 / (2.0 * e))
                      * math.log((1.0 - e * s) / (1.0 + e * s)))
    return m, t, q


def lcc_constants(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                  lat1_deg: float, lat2_deg: float, k0: float,
                  fe: float, fn: float) -> dict:
    """Point-independent Lambert-Conformal-Conic constants (Snyder 1987
    eq. 14-15, 15-7a..15-10, plus the conformal-latitude series eq. 3-5).
    2SP when lat1 != lat2 (State Plane, national grids); 1SP otherwise
    (n = sin(lat0), with k0). Shared float64 source for the numpy inverse
    kernel AND the DuckDB oracle generator — same policy as
    :func:`tmerc_constants`."""
    e2 = (2.0 - 1.0 / inv_f) / inv_f
    phi1, phi2 = math.radians(lat1_deg), math.radians(lat2_deg)
    m1, t1, _ = _conic_m_t_q(e2, phi1)
    _, t0, _ = _conic_m_t_q(e2, math.radians(lat0_deg))
    if lat1_deg != lat2_deg:                       # 2SP
        m2, t2, _ = _conic_m_t_q(e2, phi2)
        n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
    else:                                          # 1SP
        n = math.sin(phi1)
    f = m1 / (n * t1 ** n)
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e4 * e4
    return {
        "n": n, "af": a * k0 * f, "rho0": a * k0 * f * t0 ** n,
        "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
        # conformal → geodetic latitude series (Snyder eq. 3-5)
        "c2": e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0,
        "c4": 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0,
        "c6": 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0,
        "c8": 4279.0 * e8 / 161280.0,
    }


def make_inv_lcc(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                 lat1_deg: float, lat2_deg: float, k0: float = 1.0,
                 fe: float = 0.0, fn: float = 0.0):
    """Closed-form Lambert-Conformal-Conic inverse (Snyder 1987 eq. 15-11
    reversed via 14-10/14-11 + conformal-latitude series 3-5; ~0.1 mm).
    Returns a vectorized (n,2) meters → (n,2) lon/lat° fn."""
    c = lcc_constants(a, inv_f, lon0_deg, lat0_deg, lat1_deg, lat2_deg,
                      k0, fe, fn)
    n, af, rho0, lam0 = c["n"], c["af"], c["rho0"], c["lam0"]
    c2, c4, c6, c8 = c["c2"], c["c4"], c["c6"], c["c8"]
    sgn = 1.0 if n >= 0 else -1.0

    def inv(pts: np.ndarray) -> np.ndarray:
        x = (pts[:, 0] - c["fe"]) * sgn
        yr = (rho0 - (pts[:, 1] - c["fn"])) * sgn
        rho = np.sqrt(x * x + yr * yr)
        tp = (rho / abs(af)) ** (1.0 / n)
        chi = math.pi / 2.0 - 2.0 * np.arctan(tp)
        phi = (chi + c2 * np.sin(2.0 * chi) + c4 * np.sin(4.0 * chi)
               + c6 * np.sin(6.0 * chi) + c8 * np.sin(8.0 * chi))
        lam = lam0 + np.arctan2(x, yr) / n
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def albers_constants(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                     lat1_deg: float, lat2_deg: float,
                     fe: float, fn: float) -> dict:
    """Point-independent Albers-Equal-Area constants (Snyder 1987
    eq. 14-12a..14-15, 3-12, plus the authalic-latitude series eq. 3-18).
    Same shared-constants policy as :func:`lcc_constants`."""
    e2 = (2.0 - 1.0 / inv_f) / inv_f
    e = math.sqrt(e2)
    m1, _, q1 = _conic_m_t_q(e2, math.radians(lat1_deg))
    _, _, q0 = _conic_m_t_q(e2, math.radians(lat0_deg))
    if lat1_deg != lat2_deg:                       # 2SP
        m2, _, q2 = _conic_m_t_q(e2, math.radians(lat2_deg))
        n = (m1 * m1 - m2 * m2) / (q2 - q1)
    else:                                          # 1SP
        n = math.sin(math.radians(lat1_deg))
    cc = m1 * m1 + n * q1
    qp = (1.0 - e2) * (1.0 / (1.0 - e2)
                       - (1.0 / (2.0 * e))
                       * math.log((1.0 - e) / (1.0 + e)))
    e4 = e2 * e2
    e6 = e4 * e2
    return {
        "n": n, "c": cc, "rho0": a * math.sqrt(cc - n * q0) / n,
        "a": a, "qp": qp, "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
        # authalic → geodetic latitude series (Snyder eq. 3-18)
        "b2": e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0,
        "b4": 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0,
        "b6": 761.0 * e6 / 45360.0,
    }


def make_inv_albers(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                    lat1_deg: float, lat2_deg: float,
                    fe: float = 0.0, fn: float = 0.0):
    """Closed-form Albers-Equal-Area-Conic inverse (Snyder 1987 eq. 14-19
    + authalic-latitude series 3-18). Returns a vectorized (n,2) meters →
    (n,2) lon/lat° fn."""
    c = albers_constants(a, inv_f, lon0_deg, lat0_deg, lat1_deg, lat2_deg,
                         fe, fn)
    n, cc, rho0, qp, lam0 = c["n"], c["c"], c["rho0"], c["qp"], c["lam0"]
    b2, b4, b6 = c["b2"], c["b4"], c["b6"]
    sgn = 1.0 if n >= 0 else -1.0

    def inv(pts: np.ndarray) -> np.ndarray:
        x = (pts[:, 0] - c["fe"]) * sgn
        yr = (rho0 - (pts[:, 1] - c["fn"])) * sgn
        # rho² used directly (not sqrt-then-square) so the DuckDB oracle
        # can reproduce the identical float64 sequence
        q = (cc - (x * x + yr * yr) * n * n / (c["a"] * c["a"])) / n
        beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        phi = (beta + b2 * np.sin(2.0 * beta) + b4 * np.sin(4.0 * beta)
               + b6 * np.sin(6.0 * beta))
        lam = lam0 + np.arctan2(x, yr) / n
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def polar_stereo_constants(a: float, inv_f: float, lon0_deg: float,
                           lat_ts_deg: float, k0: float, fe: float,
                           fn: float, south: bool) -> dict:
    """Point-independent Polar-Stereographic constants (Snyder 1987
    eq. 15-9, 21-32..21-35, conformal-latitude series 3-5). ``lat_ts`` is
    the standard parallel (true-scale latitude); when |lat_ts| == 90 the
    scale comes from k0 via eq. 21-33's limit form. ``south=True`` mirrors
    the aspect. Shared float64 source for kernel + oracle."""
    e2 = (2.0 - 1.0 / inv_f) / inv_f
    e = math.sqrt(e2)
    ts_abs = abs(lat_ts_deg)
    if ts_abs >= 89.999999:          # pole itself: rho = 2 a k0 t / C
        cpole = math.sqrt((1.0 + e) ** (1.0 + e) * (1.0 - e) ** (1.0 - e))
        scale = 2.0 * a * k0 / cpole
    else:
        phi_c = math.radians(ts_abs)
        m_c, t_c, _ = _conic_m_t_q(e2, phi_c)
        scale = a * m_c / t_c        # rho = scale * t  (eq. 21-34)
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e4 * e4
    return {
        "scale": scale, "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
        "south": south,
        "c2": e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0,
        "c4": 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0,
        "c6": 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0,
        "c8": 4279.0 * e8 / 161280.0,
    }


def make_inv_polar_stereo(a: float, inv_f: float, lon0_deg: float,
                          lat_ts_deg: float, k0: float = 1.0,
                          fe: float = 0.0, fn: float = 0.0,
                          south: bool = False):
    """Closed-form Polar-Stereographic inverse (Snyder 1987 eq. 21-39/
    21-40 reversed + conformal series 3-5). North aspect:
    λ = λ0 + atan2(x, -y); south mirrors x/y and negates φ. Returns a
    vectorized (n,2) meters → (n,2) lon/lat° fn."""
    c = polar_stereo_constants(a, inv_f, lon0_deg, lat_ts_deg, k0, fe, fn,
                               south)
    scale, lam0 = c["scale"], c["lam0"]
    c2, c4, c6, c8 = c["c2"], c["c4"], c["c6"], c["c8"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - c["fe"]
        y = pts[:, 1] - c["fn"]
        rho = np.sqrt(x * x + y * y)
        tp = rho / scale
        chi = math.pi / 2.0 - 2.0 * np.arctan(tp)
        phi = (chi + c2 * np.sin(2.0 * chi) + c4 * np.sin(4.0 * chi)
               + c6 * np.sin(6.0 * chi) + c8 * np.sin(8.0 * chi))
        if south:                    # forward south: y = fn + rho*cos(dlam)
            lam = lam0 + np.arctan2(x, y)
            phi = -phi
        else:                        # forward north: y = fn - rho*cos(dlam)
            lam = lam0 + np.arctan2(x, -y)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def laea_constants(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                   fe: float, fn: float) -> dict:
    """Point-independent Lambert-Azimuthal-Equal-Area constants (Snyder
    1987 eq. 3-12, 24-19..24-21, authalic-latitude series eq. 3-18) — the
    ETRS89-LAEA (EPSG:3035) / polar-LAEA family. Same shared-constants
    policy as :func:`lcc_constants`: one float64 source for the numpy
    kernel and any SQL oracle."""
    e2 = (2.0 - 1.0 / inv_f) / inv_f
    e = math.sqrt(e2)
    qp = (1.0 - e2) * (1.0 / (1.0 - e2)
                       - (1.0 / (2.0 * e))
                       * math.log((1.0 - e) / (1.0 + e)))
    phi0 = math.radians(lat0_deg)
    m1, _, q0 = _conic_m_t_q(e2, phi0)
    polar = 0 if abs(lat0_deg) < 89.999999 else (1 if lat0_deg > 0 else -1)
    rq = a * math.sqrt(qp / 2.0)
    if polar:
        beta1 = math.copysign(math.pi / 2.0, lat0_deg)
        d = 1.0
    else:
        beta1 = math.asin(q0 / qp)
        d = a * m1 / (rq * math.cos(beta1))
    e4 = e2 * e2
    e6 = e4 * e2
    return {
        "a": a, "qp": qp, "rq": rq, "d": d, "polar": polar,
        "sin_b1": math.sin(beta1), "cos_b1": math.cos(beta1),
        "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
        # authalic → geodetic latitude series (Snyder eq. 3-18)
        "b2": e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0,
        "b4": 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0,
        "b6": 761.0 * e6 / 45360.0,
    }


def make_inv_laea(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                  fe: float = 0.0, fn: float = 0.0):
    """Closed-form Lambert-Azimuthal-Equal-Area inverse (Snyder 1987
    eq. 24-26..24-29 oblique, 24-31 polar aspects, authalic series 3-18).
    Returns a vectorized (n,2) meters → (n,2) lon/lat° fn."""
    c = laea_constants(a, inv_f, lon0_deg, lat0_deg, fe, fn)
    qp, rq, d, lam0 = c["qp"], c["rq"], c["d"], c["lam0"]
    sb1, cb1 = c["sin_b1"], c["cos_b1"]
    b2, b4, b6 = c["b2"], c["b4"], c["b6"]
    polar = c["polar"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        if polar:
            rho2 = x * x + y * y
            q = qp - rho2 / (a * a)
            if polar > 0:
                lam = lam0 + np.arctan2(x, -y)
            else:
                q = -q
                lam = lam0 + np.arctan2(x, y)
            beta = np.arcsin(np.clip(q / qp, -1.0, 1.0))
        else:
            xd = x / d
            yd = d * y
            rho = np.sqrt(xd * xd + yd * yd)
            ce = 2.0 * np.arcsin(np.clip(rho / (2.0 * rq), -1.0, 1.0))
            sin_ce, cos_ce = np.sin(ce), np.cos(ce)
            with np.errstate(invalid="ignore"):
                qq = qp * (cos_ce * sb1 + yd * sin_ce * cb1 / rho)
            qq = np.where(rho == 0.0, qp * sb1, qq)     # center point
            beta = np.arcsin(np.clip(qq / qp, -1.0, 1.0))
            lam = lam0 + np.arctan2(
                xd * sin_ce, rho * cb1 * cos_ce - yd * sb1 * sin_ce)
        phi = (beta + b2 * np.sin(2.0 * beta) + b4 * np.sin(4.0 * beta)
               + b6 * np.sin(6.0 * beta))
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def mercator_constants(a: float, inv_f: float, lon0_deg: float,
                       k0: float, sp1_deg, fe: float, fn: float) -> dict:
    """Point-independent ELLIPSOIDAL Mercator constants (Snyder 1987
    eq. 7-8/7-13 + conformal-latitude series 3-5) — the EPSG:3395 World
    Mercator family. 2SP form when a standard parallel is given
    (k0 = m(sp1), Snyder eq. 14-15); 1SP uses scale_factor. inv_f == 0
    degenerates to the exact spherical Mercator (all series terms 0).
    Shared float64 source for the numpy kernel and any SQL oracle."""
    e2 = _e2_of(inv_f)
    if sp1_deg is not None:
        s = math.sin(math.radians(sp1_deg))
        k0 = math.cos(math.radians(sp1_deg)) / math.sqrt(1.0 - e2 * s * s)
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e4 * e4
    return {
        "ak": a * k0, "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
        "c2": e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0,
        "c4": 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0,
        "c6": 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0,
        "c8": 4279.0 * e8 / 161280.0,
    }


def make_inv_mercator(a: float, inv_f: float, lon0_deg: float,
                      k0: float = 1.0, sp1_deg=None,
                      fe: float = 0.0, fn: float = 0.0):
    """Closed-form ellipsoidal Mercator inverse (Snyder 1987 eq. 7-10
    reversed: t = exp(-y/(a k0)), χ = π/2 − 2 atan t, conformal series
    3-5). Returns a vectorized (n,2) meters → (n,2) lon/lat° fn."""
    c = mercator_constants(a, inv_f, lon0_deg, k0, sp1_deg, fe, fn)
    ak, lam0 = c["ak"], c["lam0"]
    c2, c4, c6, c8 = c["c2"], c["c4"], c["c6"], c["c8"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        chi = math.pi / 2.0 - 2.0 * np.arctan(np.exp(-y / ak))
        phi = (chi + c2 * np.sin(2.0 * chi) + c4 * np.sin(4.0 * chi)
               + c6 * np.sin(6.0 * chi) + c8 * np.sin(8.0 * chi))
        lam = lam0 + x / ak
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def make_inv_sinusoidal(a: float, inv_f: float, lon0_deg: float,
                        fe: float = 0.0, fn: float = 0.0):
    """Closed-form Sinusoidal inverse (Snyder 1987 eq. 25-5..25-11: φ from
    the rectifying-latitude series already built by tmerc_constants, then
    λ = λ0 + x·sqrt(1−e²sin²φ)/(a cosφ)) — the MODIS land-product grid
    (sphere, inv_f == 0 → φ = y/a exactly). Returns a vectorized (n,2)
    meters → (n,2) lon/lat° fn."""
    c = tmerc_constants(a, inv_f, lon0_deg, 0.0, 1.0, fe, fn)
    e2, m_coef, lam0 = c["e2"], c["m_coef"], c["lam0"]
    mu2, mu4, mu6, mu8 = c["mu2"], c["mu4"], c["mu6"], c["mu8"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        mu = y / (a * m_coef)
        phi = (mu + mu2 * np.sin(2.0 * mu) + mu4 * np.sin(4.0 * mu)
               + mu6 * np.sin(6.0 * mu) + mu8 * np.sin(8.0 * mu))
        sinp = np.sin(phi)
        lam = lam0 + x * np.sqrt(1.0 - e2 * sinp * sinp) / (a * np.cos(phi))
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def oblique_stereo_constants(a: float, inv_f: float, lon0_deg: float,
                             lat0_deg: float, k0: float = 1.0,
                             fe: float = 0.0, fn: float = 0.0) -> dict:
    """Shared float64 constants for the EPSG Guidance Note 7-2 Oblique
    ("double") Stereographic — the EPSG:28992 Amersfoort / RD New and
    Stereo-70 family: project to a conformal sphere of radius
    R = sqrt(rho0*nu0), then sphere-stereographic about the conformal
    origin chi0. Consumed by the numpy kernel AND the DuckDB oracle
    generator (same literal float64 values)."""
    e2 = _e2_of(inv_f)
    e = math.sqrt(e2)
    phi0 = math.radians(lat0_deg)
    s0 = math.sin(phi0)
    rho0 = a * (1.0 - e2) / (1.0 - e2 * s0 * s0) ** 1.5
    nu0 = a / math.sqrt(1.0 - e2 * s0 * s0)
    R = math.sqrt(rho0 * nu0)
    n = math.sqrt(1.0 + e2 * math.cos(phi0) ** 4 / (1.0 - e2))
    S1 = (1.0 + s0) / (1.0 - s0)
    S2 = (1.0 - e * s0) / (1.0 + e * s0)
    w1 = (S1 * S2 ** e) ** n
    sin_chi00 = (w1 - 1.0) / (w1 + 1.0)
    c = ((n + s0) * (1.0 - sin_chi00)) / ((n - s0) * (1.0 + sin_chi00))
    w2 = c * w1
    chi0 = math.asin((w2 - 1.0) / (w2 + 1.0))
    rk = 2.0 * R * k0
    return {
        "e": e, "e2": e2, "n": n, "c": c, "chi0": chi0, "rk": rk,
        "g": rk * math.tan(math.pi / 4.0 - chi0 / 2.0),
        "h": 2.0 * rk * math.tan(chi0)
             + rk * math.tan(math.pi / 4.0 - chi0 / 2.0),
        "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
    }


def make_inv_oblique_stereo(a: float, inv_f: float, lon0_deg: float,
                            lat0_deg: float, k0: float = 1.0,
                            fe: float = 0.0, fn: float = 0.0):
    """EPSG 7-2 Oblique Stereographic inverse (the double-stereographic
    used by Dutch RD New / Romanian Stereo 70): sphere-stereographic
    un-project about the conformal origin, then invert the conformal →
    geodetic latitude with four fixed Newton steps on the isometric
    latitude (fixed count keeps the float64 op sequence identical to the
    SQL oracle). Returns a vectorized (n,2) meters → (n,2) lon/lat° fn."""
    cst = oblique_stereo_constants(a, inv_f, lon0_deg, lat0_deg, k0, fe, fn)
    e, e2, n, c = cst["e"], cst["e2"], cst["n"], cst["c"]
    chi0, rk, g, h, lam0 = (cst["chi0"], cst["rk"], cst["g"], cst["h"],
                            cst["lam0"])

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - cst["fe"]
        y = pts[:, 1] - cst["fn"]
        i = np.arctan2(x, h + y)
        j = np.arctan2(x, g - y) - i
        chi = chi0 + 2.0 * np.arctan((y - x * np.tan(j / 2.0)) / rk)
        lam = (j + 2.0 * i) / n + lam0
        psi = 0.5 * np.log((1.0 + np.sin(chi))
                           / (c * (1.0 - np.sin(chi)))) / n
        phi = 2.0 * np.arctan(np.exp(psi)) - math.pi / 2.0
        for _ in range(4):
            sp = np.sin(phi)
            psi_i = np.log(np.tan(phi / 2.0 + math.pi / 4.0)
                           * ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))
            phi = phi - (psi_i - psi) * np.cos(phi) * (1.0 - e2 * sp * sp) \
                / (1.0 - e2)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def eckert4_constants(a: float, lon0_deg: float,
                      fe: float = 0.0, fn: float = 0.0) -> dict:
    """Shared float64 constants for the Eckert IV inverse (Snyder 1987
    eq. 32-19..32-21) — the equal-area world-map pseudocylindrical
    (ESRI World_Eckert_IV / EPSG:54012 family).  Spherical-only; on an
    ellipsoidal datum the semimajor axis is the sphere radius (the
    Mollweide convention)."""
    pi = math.pi
    return {
        "cx": 2.0 / math.sqrt(pi * (4.0 + pi)) * a,   # x = cx·λ·(1+cosθ)
        "cy": 2.0 * math.sqrt(pi / (4.0 + pi)) * a,   # y = cy·sinθ
        "den": 2.0 + pi / 2.0,
        "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
    }


def make_inv_eckert4(a: float, lon0_deg: float,
                     fe: float = 0.0, fn: float = 0.0):
    """Closed-form Eckert IV inverse: θ = arcsin(y/cy),
    φ = arcsin((θ + sinθcosθ + 2sinθ)/(2+π/2)), λ = λ0 + x/(cx(1+cosθ)).
    Returns a vectorized (n,2) meters → (n,2) lon/lat° fn."""
    c = eckert4_constants(a, lon0_deg, fe, fn)
    cx, cy, den, lam0 = c["cx"], c["cy"], c["den"], c["lam0"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        theta = np.arcsin(np.clip(y / cy, -1.0, 1.0))
        st, ct = np.sin(theta), np.cos(theta)
        phi = np.arcsin(np.clip(
            (theta + st * ct + 2.0 * st) / den, -1.0, 1.0))
        lam = lam0 + x / (cx * (1.0 + ct))
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


# Robinson's defining table (Robinson 1974; ACIC "A New Map Projection"):
# PLEN (parallel length factor) and PDFE (pole-distance fraction) at 5°
# latitude steps 0..90. The projection IS this table — interpolated here
# LINEARLY (documented choice; NatGeo used Aitken interpolation) so the
# inverse is exact piecewise algebra both engines replay identically.
ROBINSON_PLEN = (1.0000, 0.9986, 0.9954, 0.9900, 0.9822, 0.9730, 0.9600,
                 0.9427, 0.9216, 0.8962, 0.8679, 0.8350, 0.7986, 0.7597,
                 0.7186, 0.6732, 0.6213, 0.5722, 0.5322)
ROBINSON_PDFE = (0.0000, 0.0620, 0.1240, 0.1860, 0.2480, 0.3100, 0.3720,
                 0.4340, 0.4958, 0.5571, 0.6176, 0.6769, 0.7346, 0.7903,
                 0.8435, 0.8936, 0.9394, 0.9761, 1.0000)
ROBINSON_XS = 0.8487
ROBINSON_YS = 1.3523


def make_inv_robinson(a: float, lon0_deg: float,
                      fe: float = 0.0, fn: float = 0.0):
    """Robinson inverse (the NatGeo world-map projection, ESRI
    World_Robinson / EPSG:54030): Y = |y|/(1.3523·R) locates its table
    segment (PDFE is strictly monotone), t interpolates linearly inside
    it, φ = ±5°(k+t), and λ = λ0 + x/(0.8487·R·plen(t)).  Spherical by
    definition (table-driven).  Returns a vectorized (n,2) meters →
    (n,2) lon/lat° fn."""
    lam0 = math.radians(lon0_deg)
    pdfe = np.asarray(ROBINSON_PDFE)
    plen = np.asarray(ROBINSON_PLEN)

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        yy = np.abs(y) / (ROBINSON_YS * a)
        k = np.clip(np.searchsorted(pdfe, yy, side="right") - 1, 0, 17)
        t = (yy - pdfe[k]) / (pdfe[k + 1] - pdfe[k])
        phi = np.sign(y) * 5.0 * (k + t)
        pl = plen[k] + t * (plen[k + 1] - plen[k])
        lam = np.degrees(lam0) + np.degrees(x / (ROBINSON_XS * a * pl))
        return np.column_stack([lam, phi])

    return inv


# Equal Earth polynomial (Šavrič, Patterson & Jenny 2018 — the published
# coefficients every implementation shares)
_EE_A1, _EE_A2, _EE_A3, _EE_A4 = 1.340264, -0.081106, 0.000893, 0.003796
_EE_ITERS = 8           # fixed Newton unroll (oracle-replayable)


def equalearth_constants(a: float, lon0_deg: float,
                         fe: float = 0.0, fn: float = 0.0) -> dict:
    """Shared float64 constants for the Equal Earth inverse — consumed by
    the numpy kernel AND the DuckDB oracle generator (tmerc policy)."""
    return {
        "a": a, "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
        "m": math.sqrt(3.0) / 2.0,
        "a1": _EE_A1, "a2": _EE_A2, "a3": _EE_A3, "a4": _EE_A4,
    }


def make_inv_equalearth(a: float, lon0_deg: float,
                        fe: float = 0.0, fn: float = 0.0):
    """Equal Earth inverse (EPSG:8857 / ESRI:54035 — the 2018 equal-area
    world projection adopted as the Robinson successor). Forward:
    θ = asin(M sin φ) with M = √3/2, y = R·θ·P(θ), x = R·λ·cosθ/(M·P'(θ))
    with P(θ) = A1 + A2θ² + θ⁶(A3 + A4θ²). Inverse: a FIXED
    ``_EE_ITERS``-step Newton solve of θ(A1+A2θ²+θ⁶(A3+A4θ²)) = y/R
    (converges in ≤3 steps over the valid range; the fixed unroll is what
    lets the oracle replay it op-for-op), then φ = asin(sinθ/M),
    λ = λ0 + x·M·P'(θ)/(R·cosθ). Spherical by definition (the published
    projection is authalic-sphere-based). Returns a vectorized (n,2)
    meters → (n,2) lon/lat° fn."""
    c = equalearth_constants(a, lon0_deg, fe, fn)
    m, a1, a2, a3, a4 = c["m"], c["a1"], c["a2"], c["a3"], c["a4"]
    lam0 = c["lam0"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = (pts[:, 1] - fn) / a
        th = y                                     # Newton start: θ0 = y/R
        for _ in range(_EE_ITERS):
            th2 = th * th
            th6 = th2 * th2 * th2
            f = th * (a1 + a2 * th2 + th6 * (a3 + a4 * th2)) - y
            fp = a1 + 3.0 * a2 * th2 + th6 * (7.0 * a3 + 9.0 * a4 * th2)
            th = th - f / fp
        th2 = th * th
        th6 = th2 * th2 * th2
        fp = a1 + 3.0 * a2 * th2 + th6 * (7.0 * a3 + 9.0 * a4 * th2)
        phi = np.arcsin(np.clip(np.sin(th) / m, -1.0, 1.0))
        lam = lam0 + (x / a) * m * fp / np.cos(th)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def mollweide_constants(a: float, lon0_deg: float,
                        fe: float = 0.0, fn: float = 0.0) -> dict:
    """Shared float64 constants for the Mollweide inverse — consumed by the
    numpy kernel AND the DuckDB oracle generator so both evaluate the same
    literal values. PROJ semantics: Mollweide is a spherical-only
    projection; on an ellipsoidal datum the semimajor axis is used as the
    sphere radius (``+proj=moll`` behavior)."""
    return {"rs2": a * math.sqrt(2.0), "lam0": math.radians(lon0_deg),
            "fe": fe, "fn": fn, "pi": math.pi}


def make_inv_mollweide(a: float, lon0_deg: float,
                       fe: float = 0.0, fn: float = 0.0):
    """Closed-form Mollweide inverse (Snyder 1987 eq. 31-4..31-7):
    θ = arcsin(y / (R√2)), φ = arcsin((2θ + sin 2θ) / π),
    λ = λ0 + πx / (2R√2 cos θ). Returns a vectorized (n,2) meters →
    (n,2) lon/lat° fn. (ESRI World_Mollweide / EPSG:54009 family.)"""
    c = mollweide_constants(a, lon0_deg, fe, fn)
    rs2, lam0, pi = c["rs2"], c["lam0"], c["pi"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        theta = np.arcsin(np.clip(y / rs2, -1.0, 1.0))
        phi = np.arcsin(np.clip(
            (2.0 * theta + np.sin(2.0 * theta)) / pi, -1.0, 1.0))
        lam = lam0 + pi * x / (2.0 * rs2 * np.cos(theta))
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def miller_constants(a: float, lon0_deg: float,
                     fe: float = 0.0, fn: float = 0.0) -> dict:
    """Shared float64 constants for the Miller Cylindrical inverse
    (Snyder 1987 eq. 33-3) — ESRI World_Miller_Cylindrical /
    EPSG:54003, the compromise world-map cylindrical.  Spherical-only
    (R = semimajor, the Mollweide convention)."""
    return {"a": a, "lam0": math.radians(lon0_deg), "fe": fe, "fn": fn,
            "c58": 0.625 * math.pi}   # 5π/8


def make_inv_miller(a: float, lon0_deg: float,
                    fe: float = 0.0, fn: float = 0.0):
    """Closed-form Miller Cylindrical inverse (Snyder 1987 eq. 33-3):
    φ = 2.5·arctan(e^(0.8·y/R)) − 5π/8, λ = λ0 + x/R.  Returns a
    vectorized (n,2) meters → (n,2) lon/lat° fn."""
    c = miller_constants(a, lon0_deg, fe, fn)
    lam0, c58 = c["lam0"], c["c58"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        phi = 2.5 * np.arctan(np.exp(0.8 * y / a)) - c58
        lam = lam0 + x / a
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def vdg_constants(a: float, lon0_deg: float,
                  fe: float = 0.0, fn: float = 0.0) -> dict:
    """Shared float64 constants for the Van der Grinten I inverse
    (Snyder 1987 eq. 29-12..29-17) — ESRI World_Van_der_Grinten_I /
    EPSG:54029, the circular NatGeo-era world map.  Spherical-only."""
    return {"pr": math.pi * a, "lam0": math.radians(lon0_deg),
            "fe": fe, "fn": fn, "pi": math.pi}


def make_inv_vdg(a: float, lon0_deg: float,
                 fe: float = 0.0, fn: float = 0.0):
    """Van der Grinten I inverse (Snyder 1987 eq. 29-12..29-17, the
    closed-form cubic solution): with X = x/(πR), Y = y/(πR),
    the latitude comes from the trigonometric roots of the cubic in
    sin-like variable (c1..c3, d, a1, m1, θ1) and
    λ = λ0 + π·[S − 1 + √(1 + 2(X²−Y²) + S²)] / (2X), S = X²+Y².
    Every operation is staged in the same order as the DuckDB oracle so
    both engines replay one float64 sequence.  Returns a vectorized
    (n,2) meters → (n,2) lon/lat° fn."""
    c = vdg_constants(a, lon0_deg, fe, fn)
    pr, lam0, pi = c["pr"], c["lam0"], c["pi"]

    def inv(pts: np.ndarray) -> np.ndarray:
        X = (pts[:, 0] - fe) / pr
        Y = (pts[:, 1] - fn) / pr
        x2 = X * X
        y2 = Y * Y
        s = x2 + y2
        c1 = -np.abs(Y) * (1.0 + s)
        c2 = c1 - 2.0 * y2 + x2
        c3 = -2.0 * c1 + 1.0 + 2.0 * y2 + s * s
        d = y2 / c3 + (2.0 * c2 * c2 * c2 / (c3 * c3 * c3)
                       - 9.0 * c1 * c2 / (c3 * c3)) / 27.0
        a1 = (c1 - c2 * c2 / (3.0 * c3)) / c3
        m1 = 2.0 * np.sqrt(-a1 / 3.0)
        # a1 == 0 only at the exact origin; guard the division, the
        # origin maps to (λ0, 0) via the Y==0 branch anyway
        den = np.where(a1 * m1 == 0.0, 1.0, a1 * m1)
        th1 = np.arccos(np.clip(3.0 * d / den, -1.0, 1.0)) / 3.0
        phi = np.where(
            Y == 0.0, 0.0,
            np.sign(Y) * pi * (-m1 * np.cos(th1 + pi / 3.0)
                               - c2 / (3.0 * c3)))
        xden = np.where(X == 0.0, 1.0, 2.0 * X)
        lam = lam0 + np.where(
            X == 0.0, 0.0,
            pi * (s - 1.0 + np.sqrt(1.0 + 2.0 * (x2 - y2) + s * s))
            / xden)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def cea_constants(a: float, inv_f: float, lon0_deg: float,
                  sp1_deg: float, fe: float = 0.0, fn: float = 0.0) -> dict:
    """Point-independent Lambert Cylindrical Equal Area constants (EPSG
    method 9835, Snyder 1987 eq. 10-13/10-14 normal aspect + authalic
    series 3-18) — the NSIDC EASE-Grid 2.0 family (EPSG:6933 global,
    ±86° remote-sensing grids) and the Behrmann/Gall-Peters world maps.
    k0 = m(φ1) (Snyder eq. 14-15 at the standard parallel).  Same
    shared-constants policy as :func:`lcc_constants`."""
    e2 = _e2_of(inv_f)
    e = math.sqrt(e2)
    if e2 > 0.0:
        qp = (1.0 - e2) * (1.0 / (1.0 - e2)
                           - (1.0 / (2.0 * e))
                           * math.log((1.0 - e) / (1.0 + e)))
        k0, _, _ = _conic_m_t_q(e2, math.radians(sp1_deg))
    else:
        qp = 2.0
        k0 = math.cos(math.radians(sp1_deg))
    e4 = e2 * e2
    e6 = e4 * e2
    return {
        "a": a, "qp": qp, "k0": k0, "lam0": math.radians(lon0_deg),
        "fe": fe, "fn": fn,
        "b2": e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0,
        "b4": 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0,
        "b6": 761.0 * e6 / 45360.0,
    }


def make_inv_cea(a: float, inv_f: float, lon0_deg: float, sp1_deg: float,
                 fe: float = 0.0, fn: float = 0.0):
    """Lambert Cylindrical Equal Area inverse (EPSG 9835 normal aspect):
    λ = λ0 + x/(a k0); q = 2 y k0 / a; β = arcsin(q/q_p); φ by the
    authalic series (Snyder eq. 3-18; exact identity on the sphere where
    the series coefficients vanish).  Returns a vectorized (n,2) meters →
    (n,2) lon/lat° fn."""
    c = cea_constants(a, inv_f, lon0_deg, sp1_deg, fe, fn)
    qp, k0, lam0 = c["qp"], c["k0"], c["lam0"]
    b2, b4, b6 = c["b2"], c["b4"], c["b6"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        lam = lam0 + x / (a * k0)
        beta = np.arcsin(np.clip(2.0 * y * k0 / a / qp, -1.0, 1.0))
        phi = (beta + b2 * np.sin(2.0 * beta) + b4 * np.sin(4.0 * beta)
               + b6 * np.sin(6.0 * beta))
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def polyconic_constants(a: float, inv_f: float, lon0_deg: float,
                        lat0_deg: float, fe: float = 0.0,
                        fn: float = 0.0) -> dict:
    """Point-independent American Polyconic constants (EPSG method 9818,
    Snyder 1987 eq. 18-18..18-22 — Brazil's historic national grids, old
    USGS quads): the meridian-arc series M(φ)/a = c0·φ − c2·sin2φ +
    c4·sin4φ − c6·sin6φ and its derivative feed the fixed-unroll Newton
    inverse.  Same shared-constants policy as :func:`lcc_constants`."""
    e2 = _e2_of(inv_f)
    e4 = e2 * e2
    e6 = e4 * e2
    c0 = 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0
    c2 = 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0
    c4 = 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0
    c6 = 35.0 * e6 / 3072.0
    phi0 = math.radians(lat0_deg)
    m0a = (c0 * phi0 - c2 * math.sin(2.0 * phi0)
           + c4 * math.sin(4.0 * phi0) - c6 * math.sin(6.0 * phi0))
    return {"a": a, "e2": e2, "c0": c0, "c2": c2, "c4": c4, "c6": c6,
            "m0a": m0a, "lam0": math.radians(lon0_deg),
            "fe": fe, "fn": fn}


POLY_ITERS = 6


def make_inv_polyconic(a: float, inv_f: float, lon0_deg: float,
                       lat0_deg: float, fe: float = 0.0, fn: float = 0.0):
    """American Polyconic inverse (Snyder eq. 18-18..18-22): A = (M0+y)/a,
    B = x²/a² + A², then POLY_ITERS FIXED Newton steps on φ (EPSG
    prescribes iterate-to-convergence; the fixture band converges by
    step 4, and the fixed count keeps the float64 op sequence identical
    to the SQL oracle — the Krovak rule), finally λ = λ0 +
    arcsin(x·C/a)/sinφ.  The equator row (φ→0, 2/sin2φ singular) is
    outside the supported band and the fixture; returns a vectorized
    (n,2) meters → (n,2) lon/lat° fn."""
    c = polyconic_constants(a, inv_f, lon0_deg, lat0_deg, fe, fn)
    e2, c0, c2, c4, c6 = c["e2"], c["c0"], c["c2"], c["c4"], c["c6"]
    m0a, lam0 = c["m0a"], c["lam0"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        A = (m0a + y / a)
        B = (x / a) * (x / a) + A * A
        phi = A.copy()
        for _ in range(POLY_ITERS):
            s = np.sin(phi)
            s2 = np.sin(2.0 * phi)
            C = np.sqrt(1.0 - e2 * s * s) * np.tan(phi)
            Ma = (c0 * phi - c2 * np.sin(2.0 * phi)
                  + c4 * np.sin(4.0 * phi) - c6 * np.sin(6.0 * phi))
            Mp = (c0 - 2.0 * c2 * np.cos(2.0 * phi)
                  + 4.0 * c4 * np.cos(4.0 * phi)
                  - 6.0 * c6 * np.cos(6.0 * phi))
            num = A * (C * Ma + 1.0) - Ma - 0.5 * (Ma * Ma + B) * C
            den = (e2 * s2 * (Ma * Ma + B - 2.0 * A * Ma) / (4.0 * C)
                   + (A - Ma) * (C * Mp - 2.0 / s2) - Mp)
            phi = phi - num / den
        sC = np.sqrt(1.0 - e2 * np.sin(phi) ** 2) * np.tan(phi)
        lam = lam0 + np.arcsin(np.clip(x * sC / a, -1.0, 1.0)) \
            / np.sin(phi)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def aeqd_constants(a: float, lon0_deg: float, lat0_deg: float,
                   fe: float = 0.0, fn: float = 0.0) -> dict:
    """Point-independent constants for the SPHERICAL Azimuthal
    Equidistant projection (Snyder 1987 eq. 25-15..25-18 — the ESRI
    World_Azimuthal_Equidistant / ESRI:54032 family and proj's
    ``+proj=aeqd +R=``; aviation range-ring and polar-research maps).
    Shared float64 source for the numpy inverse kernel AND the DuckDB
    oracle generator — same policy as :func:`lcc_constants`."""
    phi0 = math.radians(lat0_deg)
    return {
        "r": a, "lam0": math.radians(lon0_deg),
        "sin0": math.sin(phi0), "cos0": math.cos(phi0),
        "fe": fe, "fn": fn,
    }


def make_inv_aeqd(a: float, inv_f: float, lon0_deg: float, lat0_deg: float,
                  fe: float = 0.0, fn: float = 0.0):
    """Spherical Azimuthal Equidistant inverse (Snyder eq. 25-15/25-16/
    25-18, all aspects): c = ρ/R, φ = arcsin(cos c sin φ0 +
    y sin c cos φ0 / ρ), λ = λ0 + atan2(x sin c, ρ cos φ0 cos c −
    y sin φ0 sin c).  Sphere-only — the ellipsoidal oblique form is
    geodesic-based (what PROJ does) and out of scope; an ellipsoidal
    SPHEROID raises loudly rather than silently mis-decoding (the
    Mercator-dispatch lesson).  Returns a vectorized (n,2) meters →
    (n,2) lon/lat° fn."""
    if inv_f != 0.0:
        raise ValueError(
            "Azimuthal_Equidistant: only the spherical form is supported "
            f"(SPHEROID inverse flattening {inv_f!r} != 0); the "
            "ellipsoidal oblique variant is geodesic-based")
    c = aeqd_constants(a, lon0_deg, lat0_deg, fe, fn)
    r, lam0, sin0, cos0 = c["r"], c["lam0"], c["sin0"], c["cos0"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        rho = np.sqrt(x * x + y * y)
        cc = rho / r
        sc, co = np.sin(cc), np.cos(cc)
        safe = np.where(rho == 0.0, 1.0, rho)
        phi = np.arcsin(np.clip(
            co * sin0 + np.where(rho == 0.0, 0.0,
                                 y * sc * cos0 / safe), -1.0, 1.0))
        lam = lam0 + np.arctan2(x * sc, rho * cos0 * co - y * sin0 * sc)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def make_inv_gnomonic(a: float, inv_f: float, lon0_deg: float,
                      lat0_deg: float, fe: float = 0.0, fn: float = 0.0):
    """Spherical Gnomonic inverse (Snyder 1987 eq. 22-16 with the generic
    azimuthal inverse 20-14/20-15: c = arctan(ρ/R)) — the great-circle
    navigation projection (every straight line is a geodesic; ESRI
    World_Gnomonic / proj ``+proj=gnom``).  Sphere-only by definition;
    an ellipsoidal SPHEROID raises loudly (the Mercator-dispatch
    lesson).  Shares :func:`aeqd_constants` (same constant set)."""
    if inv_f != 0.0:
        raise ValueError(
            "Gnomonic: only the spherical form is supported (SPHEROID "
            f"inverse flattening {inv_f!r} != 0)")
    c = aeqd_constants(a, lon0_deg, lat0_deg, fe, fn)
    r, lam0, sin0, cos0 = c["r"], c["lam0"], c["sin0"], c["cos0"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        rho = np.sqrt(x * x + y * y)
        cc = np.arctan(rho / r)
        sc, co = np.sin(cc), np.cos(cc)
        safe = np.where(rho == 0.0, 1.0, rho)
        phi = np.arcsin(np.clip(
            co * sin0 + np.where(rho == 0.0, 0.0,
                                 y * sc * cos0 / safe), -1.0, 1.0))
        lam = lam0 + np.arctan2(x * sc, rho * cos0 * co - y * sin0 * sc)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def make_inv_ortho(a: float, inv_f: float, lon0_deg: float,
                   lat0_deg: float, fe: float = 0.0, fn: float = 0.0):
    """Spherical Orthographic inverse (Snyder 1987 eq. 20-14/20-15 with
    c = arcsin(ρ/R)) — the satellite-view / globe-thumbnail projection
    (ESRI World_From_Space family).  Valid for ρ ≤ R (one hemisphere);
    the ρ/R ratio is clipped into asin's domain so boundary roundoff
    cannot NaN.  Sphere-only: the EPSG 9840 ellipsoidal variant raises
    loudly rather than silently sphere-decoding."""
    if inv_f != 0.0:
        raise ValueError(
            "Orthographic: only the spherical form is supported (SPHEROID "
            f"inverse flattening {inv_f!r} != 0); EPSG 9840 ellipsoidal "
            "Orthographic is out of scope")
    c = aeqd_constants(a, lon0_deg, lat0_deg, fe, fn)
    r, lam0, sin0, cos0 = c["r"], c["lam0"], c["sin0"], c["cos0"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        rho = np.sqrt(x * x + y * y)
        cc = np.arcsin(np.clip(rho / r, -1.0, 1.0))
        sc, co = np.sin(cc), np.cos(cc)
        safe = np.where(rho == 0.0, 1.0, rho)
        phi = np.arcsin(np.clip(
            co * sin0 + np.where(rho == 0.0, 0.0,
                                 y * sc * cos0 / safe), -1.0, 1.0))
        lam = lam0 + np.arctan2(x * sc, rho * cos0 * co - y * sin0 * sc)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def hom_constants(a: float, inv_f: float, lonc_deg: float, lat0_deg: float,
                  azi_deg: float, gamma_deg: float, k0: float,
                  fe: float, fn: float, variant: str = "A") -> dict:
    """Point-independent Hotine Oblique Mercator constants (Snyder 1987
    eq. 9-11..9-24 / EPSG Guidance Note 7-2 method 9812 "variant A" and
    9815 "variant B" — Alaska zone 1, Malaysia BRSO/RSO, Swiss-style
    oblique aspects). Shared float64 source for the numpy inverse kernel
    AND the DuckDB oracle generator — same policy as :func:`lcc_constants`.

    ``variant="B"`` (Azimuth_Center names): false E/N apply at the
    projection CENTER, so the reverse adds ``|u_c|*sign(lat0)`` to u'."""
    e2 = (2.0 - 1.0 / inv_f) / inv_f
    e = math.sqrt(e2)
    phi0 = math.radians(lat0_deg)
    alphac = math.radians(azi_deg)
    gammac = math.radians(gamma_deg)
    s0, c0 = math.sin(phi0), math.cos(phi0)
    bb = math.sqrt(1.0 + e2 * c0 ** 4 / (1.0 - e2))
    aa = a * bb * k0 * math.sqrt(1.0 - e2) / (1.0 - e2 * s0 * s0)
    t0 = (math.tan(math.pi / 4.0 - phi0 / 2.0)
          / ((1.0 - e * s0) / (1.0 + e * s0)) ** (e / 2.0))
    dd = bb * math.sqrt(1.0 - e2) / (c0 * math.sqrt(1.0 - e2 * s0 * s0))
    d2 = max(dd * dd, 1.0)
    sgn = 1.0 if lat0_deg >= 0 else -1.0
    ff = dd + math.sqrt(d2 - 1.0) * sgn
    hh = ff * t0 ** bb                          # Snyder's E
    gg = (ff - 1.0 / ff) / 2.0
    gamma0 = math.asin(math.sin(alphac) / dd)
    lam0 = math.radians(lonc_deg) - math.asin(gg * math.tan(gamma0)) / bb
    if abs(math.cos(alphac)) < 1e-12:           # EPSG: alpha_c = 90 deg
        uc = aa * (math.radians(lonc_deg) - lam0)
    else:
        uc = (aa / bb) * math.atan2(math.sqrt(d2 - 1.0),
                                    math.cos(alphac)) * sgn
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e4 * e4
    return {
        "b": bb, "a_": aa, "h": hh, "b_over_a": bb / aa,
        "inv_b": 1.0 / bb, "lam0": lam0,
        "sg0": math.sin(gamma0), "cg0": math.cos(gamma0),
        "sgc": math.sin(gammac), "cgc": math.cos(gammac),
        "u_off": (abs(uc) * sgn) if variant == "B" else 0.0,
        "fe": fe, "fn": fn,
        # conformal -> geodetic latitude series (Snyder eq. 3-5)
        "c2": e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0,
        "c4": 7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0,
        "c6": 7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0,
        "c8": 4279.0 * e8 / 161280.0,
        "e": e,
    }


def make_inv_hom(a: float, inv_f: float, lonc_deg: float, lat0_deg: float,
                 azi_deg: float, gamma_deg: float, k0: float = 1.0,
                 fe: float = 0.0, fn: float = 0.0, variant: str = "A"):
    """Closed-form Hotine Oblique Mercator inverse (EPSG 9812/9815 reverse
    formulas; conformal-latitude series 3-5). Returns a vectorized (n,2)
    grid meters → (n,2) lon/lat° fn."""
    c = hom_constants(a, inv_f, lonc_deg, lat0_deg, azi_deg, gamma_deg,
                      k0, fe, fn, variant)
    ba, ib, hh = c["b_over_a"], c["inv_b"], c["h"]
    sg0, cg0, sgc, cgc = c["sg0"], c["cg0"], c["sgc"], c["cgc"]
    lam0, u_off = c["lam0"], c["u_off"]
    c2, c4, c6, c8 = c["c2"], c["c4"], c["c6"], c["c8"]

    def inv(pts: np.ndarray) -> np.ndarray:
        de = pts[:, 0] - c["fe"]
        dn = pts[:, 1] - c["fn"]
        vp = de * cgc - dn * sgc
        up = dn * cgc + de * sgc + u_off
        q = np.exp(-ba * vp)
        s = (q - 1.0 / q) / 2.0
        t = (q + 1.0 / q) / 2.0
        bua = ba * up
        v = np.sin(bua)
        u = (v * cg0 + s * sg0) / t
        tp = (hh / np.sqrt((1.0 + u) / (1.0 - u))) ** ib
        chi = np.pi / 2.0 - 2.0 * np.arctan(tp)
        phi = (chi + c2 * np.sin(2.0 * chi) + c4 * np.sin(4.0 * chi)
               + c6 * np.sin(6.0 * chi) + c8 * np.sin(8.0 * chi))
        lam = lam0 - np.arctan2(s * cg0 - v * sg0, np.cos(bua)) / c["b"]
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def hom_forward(a: float, inv_f: float, lonc_deg: float, lat0_deg: float,
                azi_deg: float, gamma_deg: float, k0: float = 1.0,
                fe: float = 0.0, fn: float = 0.0, variant: str = "A"):
    """Independent HOM forward (Snyder eq. 9-25..9-34 via the EPSG forward
    sequence) — test-only roundtrip witness for :func:`make_inv_hom`."""
    c = hom_constants(a, inv_f, lonc_deg, lat0_deg, azi_deg, gamma_deg,
                      k0, fe, fn, variant)
    e = c["e"]

    def fwd(lon_deg, lat_deg):
        phi = math.radians(lat_deg)
        sp = math.sin(phi)
        t = (math.tan(math.pi / 4.0 - phi / 2.0)
             / ((1.0 - e * sp) / (1.0 + e * sp)) ** (e / 2.0))
        q = c["h"] / t ** c["b"]
        s = (q - 1.0 / q) / 2.0
        tt = (q + 1.0 / q) / 2.0
        dl = c["b"] * (math.radians(lon_deg) - c["lam0"])
        v = math.sin(dl)
        u_ = (-v * c["cg0"] + s * c["sg0"]) / tt
        vq = math.log((1.0 - u_) / (1.0 + u_)) / (2.0 * c["b_over_a"])
        uq = (math.atan2(s * c["cg0"] + v * c["sg0"], math.cos(dl))
              / c["b_over_a"]) - c["u_off"]
        east = vq * c["cgc"] + uq * c["sgc"] + c["fe"]
        north = uq * c["cgc"] - vq * c["sgc"] + c["fn"]
        return east, north

    return fwd


def make_inv_cassini(a: float, inv_f: float, lon0_deg: float,
                     lat0_deg: float, fe: float = 0.0, fn: float = 0.0):
    """Cassini-Soldner inverse (EPSG method 9806 — the old cadastral
    grids: Trinidad, Cyprus, Palestine, historic German/Danish surveys):
    Snyder 1987 eq. 8-32..8-34 reverse. Reuses the Transverse-Mercator
    rectifying-latitude machinery (tmerc_constants with k0=1): M1 = M0 +
    northing directly, footpoint latitude via the eq. 3-26 series, then
    the short Cassini D-series (T1-only coefficients — the projection is
    only used near its central meridian, where the truncation is sub-mm).
    Returns a vectorized (n,2) meters -> (n,2) lon/lat degrees fn."""
    c = tmerc_constants(a, inv_f, lon0_deg, lat0_deg, 1.0, fe, fn)
    e2, m_coef, m0, lam0 = c["e2"], c["m_coef"], c["m0"], c["lam0"]
    mu2, mu4, mu6, mu8 = c["mu2"], c["mu4"], c["mu6"], c["mu8"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        mu = (m0 + y) / (a * m_coef)
        phi1 = (mu + mu2 * np.sin(2.0 * mu) + mu4 * np.sin(4.0 * mu)
                + mu6 * np.sin(6.0 * mu) + mu8 * np.sin(8.0 * mu))
        sin1, cos1, tan1 = np.sin(phi1), np.cos(phi1), np.tan(phi1)
        t1 = tan1 * tan1
        w = 1.0 - e2 * sin1 * sin1
        n1 = a / np.sqrt(w)
        r1 = a * (1.0 - e2) / (w * np.sqrt(w))
        d = x / n1
        d2 = d * d
        phi = phi1 - (n1 * tan1 / r1) * (d2 / 2.0
                                         - (1.0 + 3.0 * t1) * d2 * d2
                                         / 24.0)
        lam = lam0 + (d - t1 * d2 * d / 3.0
                      + (1.0 + 3.0 * t1) * t1 * d2 * d2 * d / 15.0) / cos1
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def bonne_constants(a: float, inv_f: float, lon0_deg: float,
                    lat1_deg: float, fe: float = 0.0,
                    fn: float = 0.0) -> dict:
    """Point-independent constants for the Bonne pseudoconic (EPSG method
    9827 — the classic atlas / historic national projection: France's
    Depôt de la Guerre, Portugal, pre-LV03 Switzerland): the TM
    rectifying-latitude machinery (tmerc_constants with k0 = 1, lat0 =
    the standard parallel) plus a·m1/sin(φ1), the cone radius at the
    standard parallel. Shared between the numpy kernel and the DuckDB
    oracle generator (same float64 literals)."""
    c = tmerc_constants(a, inv_f, lon0_deg, lat1_deg, 1.0, fe, fn)
    phi1 = math.radians(lat1_deg)
    s1 = math.sin(phi1)
    if s1 == 0.0:
        raise ValueError("Bonne: standard parallel 0 is the (different) "
                         "Sinusoidal projection; use its own WKT name")
    m1 = math.cos(phi1) / math.sqrt(1.0 - c["e2"] * s1 * s1)
    c["am1s"] = a * m1 / s1          # Snyder 19-12's a·m1/sin φ1 term
    c["sgn"] = 1.0 if s1 > 0.0 else -1.0
    return c


def make_inv_bonne(a: float, inv_f: float, lon0_deg: float, lat1_deg: float,
                   fe: float = 0.0, fn: float = 0.0):
    """Bonne inverse (Snyder 1987 eq. 19-12..19-14, ellipsoidal form;
    sphere degenerates via inv_f = 0): ρ from the offset radius about the
    cone apex, meridian distance M = a·m1/sinφ1 + M1 − ρ, footpoint
    latitude via the eq. 3-26 rectifying series, then λ from the arc
    angle scaled by 1/(a·m).  Both hemispheres (the ± of eq. 19-12
    carried as a sign constant).  Returns a vectorized (n,2) meters →
    (n,2) lon/lat degrees fn."""
    c = bonne_constants(a, inv_f, lon0_deg, lat1_deg, fe, fn)
    e2, m_coef, m0, lam0 = c["e2"], c["m_coef"], c["m0"], c["lam0"]
    mu2, mu4, mu6, mu8 = c["mu2"], c["mu4"], c["mu6"], c["mu8"]
    am1s, sgn = c["am1s"], c["sgn"]

    def inv(pts: np.ndarray) -> np.ndarray:
        x = pts[:, 0] - fe
        y = pts[:, 1] - fn
        rho = sgn * np.sqrt(x * x + (am1s - y) * (am1s - y))
        mm = am1s + m0 - rho
        mu = mm / (a * m_coef)
        phi = (mu + mu2 * np.sin(2.0 * mu) + mu4 * np.sin(4.0 * mu)
               + mu6 * np.sin(6.0 * mu) + mu8 * np.sin(8.0 * mu))
        sinp = np.sin(phi)
        m = np.cos(phi) / np.sqrt(1.0 - e2 * sinp * sinp)
        lam = lam0 + rho * np.arctan2(sgn * x, sgn * (am1s - y)) / (a * m)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv


def krovak_constants(a: float, inv_f: float, lonc_deg: float,
                     latc_deg: float, azimuth_deg: float,
                     pseudo_sp_deg: float, k0: float = 0.9999,
                     fe: float = 0.0, fn: float = 0.0) -> dict:
    """Point-independent constants for EPSG method 9819 (Krovak, the
    Czech/Slovak S-JTSK oblique conformal conic): Gaussian sphere about
    the projection centre, oblique rotation by the cone-axis azimuth,
    conic with the pseudo standard parallel. Shared between the numpy
    kernel and the DuckDB oracle generator (same float64 literals)."""
    e2 = _e2_of(inv_f)
    e = math.sqrt(e2)
    phic = math.radians(latc_deg)
    sc = math.sin(phic)
    A = a * math.sqrt(1.0 - e2) / (1.0 - e2 * sc * sc)
    B = math.sqrt(1.0 + e2 * math.cos(phic) ** 4 / (1.0 - e2))
    g0 = math.asin(sc / B)
    t0 = (math.tan(math.pi / 4.0 + g0 / 2.0)
          * ((1.0 + e * sc) / (1.0 - e * sc)) ** (e * B / 2.0)
          / math.tan(math.pi / 4.0 + phic / 2.0) ** B)
    phip = math.radians(pseudo_sp_deg)
    n = math.sin(phip)
    r0 = k0 * A / math.tan(phip)
    return {
        "e": e, "e2": e2, "B": B, "invB": 1.0 / B, "t0": t0,
        "ti": t0 ** (-1.0 / B), "n": n, "invn": 1.0 / n, "r0": r0,
        "alpha": math.radians(azimuth_deg),
        "tp": math.tan(math.pi / 4.0 + phip / 2.0),
        "lam0": math.radians(lonc_deg), "fe": fe, "fn": fn,
    }


def make_inv_krovak(a: float, inv_f: float, lonc_deg: float,
                    latc_deg: float, azimuth_deg: float,
                    pseudo_sp_deg: float, k0: float = 0.9999,
                    fe: float = 0.0, fn: float = 0.0):
    """EPSG 9819 Krovak inverse in the GIS East-North axis convention
    (EPSG:5514: easting = -westing, northing = -southing — the axes
    shapefiles in the wild carry; the native CRS is south/west-positive).
    Un-rotate the oblique cone, then invert the Gaussian-sphere latitude
    with four FIXED iterations (EPSG prescribes iterate-to-convergence,
    which this fixture reaches by round 3; the fixed count keeps the
    float64 op sequence identical to the SQL oracle).  Returns a
    vectorized (n,2) meters -> (n,2) lon/lat degrees function."""
    cst = krovak_constants(a, inv_f, lonc_deg, latc_deg, azimuth_deg,
                           pseudo_sp_deg, k0, fe, fn)
    e, B, invB = cst["e"], cst["B"], cst["invB"]
    ti, n, invn, r0 = cst["ti"], cst["n"], cst["invn"], cst["r0"]
    alpha, tp, lam0 = cst["alpha"], cst["tp"], cst["lam0"]

    def inv(pts: np.ndarray) -> np.ndarray:
        xs = -(pts[:, 1] - cst["fn"])    # southing  = -(northing)
        ys = -(pts[:, 0] - cst["fe"])    # westing   = -(easting)
        r = np.sqrt(xs * xs + ys * ys)
        theta = np.arctan2(ys, xs)
        d = theta * invn
        t = 2.0 * (np.arctan(np.power(r0 / r, invn) * tp) - math.pi / 4.0)
        u = np.arcsin(math.cos(alpha) * np.sin(t)
                      - math.sin(alpha) * np.cos(t) * np.cos(d))
        v = np.arcsin(np.cos(t) * np.sin(d) / np.cos(u))
        lam = lam0 - v / B
        base = ti * np.power(np.tan(u / 2.0 + math.pi / 4.0), invB)
        phi = u
        for _ in range(4):
            sp = np.sin(phi)
            phi = 2.0 * (np.arctan(
                base * np.power((1.0 + e * sp) / (1.0 - e * sp), e / 2.0))
                - math.pi / 4.0)
        return np.column_stack([np.degrees(lam), np.degrees(phi)])

    return inv



# --- TOWGS84 datum shifts (Helmert position-vector, EPSG method 9606) --------

_WGS84_A = 6378137.0
_WGS84_INV_F = 298.257223563


def _wkt_towgs84(wkt: str) -> "tuple | None":
    """Explicit ``TOWGS84[dx,dy,dz(,rx,ry,rz,ds)]`` parameters from WKT1,
    or None. Matches the reference's proj4 behavior (``lib/index.js:≈125-140``
    [RECONSTRUCTED]): proj4's WKT path applies a datum transform only when
    the WKT carries an explicit TOWGS84 — ESRI-style WKTs without one get
    no shift (so e.g. the bare D_S_JTSK Krovak fixture stays projection-
    only, exactly as proj4 leaves it). An all-zero TOWGS84 (already WGS84)
    also means no shift."""
    m = re.search(r'TOWGS84\[([^\]]*)\]', wkt, re.I)
    if not m:
        return None
    try:
        vals = [float(v) for v in m.group(1).split(",")]
    except ValueError:
        return None
    if len(vals) == 3:
        vals += [0.0, 0.0, 0.0, 0.0]
    if len(vals) != 7 or all(v == 0.0 for v in vals):
        return None
    return tuple(vals)


def datum_constants(a: float, inv_f: float, p7) -> dict:
    """Point-independent constants for the source-datum → WGS84 Helmert
    step: source ellipsoid (a, e²), position-vector terms (rotations
    arc-sec → radians, scale ppm → factor), and the WGS84 target-ellipsoid
    terms the Bowring closed-form geocentric→geodetic step needs. Shared
    by the numpy kernel AND the DuckDB oracle generator (the
    tmerc_constants policy — both consume these exact float64 values)."""
    dx, dy, dz, rx_s, ry_s, rz_s, ds_ppm = p7
    e2w = _e2_of(_WGS84_INV_F)
    bw = _WGS84_A * (1.0 - 1.0 / _WGS84_INV_F)
    sec2rad = math.pi / 648000.0          # arc-seconds → radians
    return {
        "a_src": a, "e2_src": _e2_of(inv_f),
        "dx": dx, "dy": dy, "dz": dz,
        "rx": rx_s * sec2rad, "ry": ry_s * sec2rad, "rz": rz_s * sec2rad,
        "m": 1.0 + ds_ppm * 1e-6,
        "aw": _WGS84_A, "bw": bw,
        "ep2w_bw": e2w / (1.0 - e2w) * bw,    # e'² · b  (Bowring numerator)
        "e2w_aw": e2w * _WGS84_A,             # e² · a   (Bowring denominator)
    }


def make_datum_shift(a: float, inv_f: float, p7):
    """source-datum lon/lat° → WGS84 lon/lat° (EPSG method 9606, the
    position-vector sign convention proj4's datum_transform uses):
    geodetic→geocentric at h=0 on the source ellipsoid, 7-param Helmert,
    then geocentric→geodetic on WGS84 via the Bowring (1976) closed form
    — sub-µm vs the iterative solution for earth-surface points, and
    fully unrollable into oracle SQL (no data-dependent iteration).
    Returns a vectorized (n,2) degrees → (n,2) degrees fn."""
    c = datum_constants(a, inv_f, p7)
    a_s, e2s = c["a_src"], c["e2_src"]
    dx, dy, dz, rx, ry, rz, m = (c["dx"], c["dy"], c["dz"],
                                 c["rx"], c["ry"], c["rz"], c["m"])
    aw, bw, ep2w_bw, e2w_aw = c["aw"], c["bw"], c["ep2w_bw"], c["e2w_aw"]

    def shift(lonlat: np.ndarray) -> np.ndarray:
        lam = np.radians(lonlat[:, 0])
        phi = np.radians(lonlat[:, 1])
        sp, cp = np.sin(phi), np.cos(phi)
        n = a_s / np.sqrt(1.0 - e2s * sp * sp)
        x = n * cp * np.cos(lam)
        y = n * cp * np.sin(lam)
        z = n * (1.0 - e2s) * sp
        x2 = dx + m * (x - rz * y + ry * z)
        y2 = dy + m * (rz * x + y - rx * z)
        z2 = dz + m * (-ry * x + rx * y + z)
        p = np.sqrt(x2 * x2 + y2 * y2)
        u = np.arctan2(z2 * aw, p * bw)
        su, cu = np.sin(u), np.cos(u)
        lat = np.arctan2(z2 + ep2w_bw * su * su * su,
                         p - e2w_aw * cu * cu * cu)
        lon = np.arctan2(y2, x2)
        return np.column_stack([np.degrees(lon), np.degrees(lat)])

    return shift


def projection_from_wkt(wkt) -> "callable | None":
    """WKT string → inverse-transform fn to WGS84 lon/lat, or None
    (identity). Dispatches the projection inverse via
    :func:`_projection_only_from_wkt` below, then — when the WKT carries
    an explicit non-zero ``TOWGS84`` — composes the 3/7-param Helmert
    datum shift after it (projection inverse yields lon/lat on the SOURCE
    datum; the shift moves them to WGS84). A GEOGCS-only WKT with a
    TOWGS84 gets the pure datum shift (coordinates are already degrees on
    the source datum). Upstream anchor: proj4's WKT datum path,
    ``lib/index.js:≈125-140`` [RECONSTRUCTED]."""
    inv = _projection_only_from_wkt(wkt)
    if not wkt or not isinstance(wkt, str):
        return inv
    try:
        p7 = _wkt_towgs84(wkt)
        if p7 is None:
            return inv
        a, inv_f = _wkt_spheroid(wkt)
        shift = make_datum_shift(a, inv_f, p7)
    except Exception:
        return inv
    if inv is None:
        # geographic CRS on a shifted datum — apply only the Helmert step.
        # Gate on a GENUINELY geographic CRS (GEOGCS present AND PROJCS
        # absent): a PROJCS WKT whose projection inverse resolved to None
        # (missing PROJECTION tag / swallowed parse error) still embeds a
        # GEOGCS, and bare-shifting its projected meters as if they were
        # degrees yields in-range but wrong lon/lat (ADVICE r4 #1).
        if (re.search(r'GEOGCS\[', wkt, re.I)
                and not re.search(r'PROJCS\[', wkt, re.I)):
            return shift
        return None

    def f(pts):
        return shift(inv(pts))

    return f


def _projection_only_from_wkt(wkt) -> "callable | None":
    """WKT string → inverse-transform fn to WGS84 lon/lat, or None (identity).

    Recognizes Pseudo-Mercator (EPSG:3857 — sphere, dispatched on the
    authority/name markers real 3857 WKTs carry), ellipsoidal Mercator
    1SP/2SP (EPSG:3395 World Mercator family), Sinusoidal (MODIS grid,
    sphere or ellipsoid), Transverse-Mercator / Gauss–Krüger (UTM,
    State-Plane TM zones — ellipsoidal Snyder-series inverse with
    WKT-supplied central meridian / origin / scale / false E-N /
    spheroid), Lambert Conformal
    Conic (1SP and 2SP — State Plane / national grids), Albers Equal Area
    Conic (1SP/2SP), Lambert Azimuthal Equal Area (oblique — ETRS89-LAEA
    EPSG:3035 — and both polar aspects), Polar Stereographic (north/south
    aspects — Arctic/Antarctic grids; generic oblique Stereographic still
    raises), and
    geographic CRSes (passthrough). Malformed / non-WKT content → None, matching the
    reference's proj4 try/catch → no transform. A *well-formed* PROJCS whose
    PROJECTION the engine lacks raises instead of silently decoding
    projected meters as degrees — that failure corrupted coordinates
    silently in round 1 (VERDICT 'What's missing' #1)."""
    if not wkt or not isinstance(wkt, str):
        return None
    try:
        # PROJCS linear unit (feet-based State Plane zones are common);
        # false E/N are expressed in this unit, raw coordinates too
        unit = _wkt_linear_unit(wkt)
        if re.search(r'PROJECTION\["?Lambert[_ ]?Conformal[_ ]?Conic',
                     wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            lat0 = p.get("latitude_of_origin", p.get("latitude_of_center",
                                                     0.0))
            sp1 = p.get("standard_parallel_1", lat0)
            sp2 = p.get("standard_parallel_2", sp1)   # absent → 1SP
            return _with_unit(make_inv_lcc(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                lat0, sp1, sp2, p.get("scale_factor", 1.0),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?(Polar[_ ]?Stereographic'
                     r'|Stereographic[_ ]?(North|South)[_ ]?Pole)',
                     wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            lat_ts = p.get("standard_parallel_1",
                           p.get("latitude_of_standard_parallel",
                                 p.get("latitude_of_origin", 90.0)))
            # south aspect: negative standard parallel / origin, or an
            # explicit South_Pole projection name
            south = (lat_ts < 0.0
                     or bool(re.search(r"South[_ ]?Pole", wkt, re.I)))
            return _with_unit(make_inv_polar_stereo(
                a, inv_f,
                p.get("central_meridian",
                      p.get("longitude_of_origin",
                            p.get("straight_vertical_longitude_from_pole",
                                  0.0))),
                lat_ts, p.get("scale_factor", 1.0),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit,
                south), unit)
        if re.search(r'PROJECTION\["?(Oblique[_ ]?Stereographic'
                     r'|Double[_ ]?Stereographic|Stereographic)',
                     wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            lat0 = p.get("latitude_of_origin",
                         p.get("latitude_of_center", 0.0))
            if abs(lat0) >= 89.999999:   # plain name with a polar origin
                return _with_unit(make_inv_polar_stereo(
                    a, inv_f, p.get("central_meridian", 0.0), lat0,
                    p.get("scale_factor", 1.0),
                    p.get("false_easting", 0.0) * unit,
                    p.get("false_northing", 0.0) * unit,
                    lat0 < 0.0), unit)
            return _with_unit(make_inv_oblique_stereo(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                lat0, p.get("scale_factor", 1.0),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?(Equirectangular'
                     r'|Equidistant[_ ]?Cylindrical|Plate[_ ]?Carree)',
                     wkt, re.I):
            p = _wkt_params(wkt)
            a, _ = _wkt_spheroid(wkt)
            lat1 = math.radians(p.get("standard_parallel_1",
                                      p.get("latitude_of_origin", 0.0)))
            lon0 = p.get("central_meridian", 0.0)
            fe = p.get("false_easting", 0.0) * unit
            fn = p.get("false_northing", 0.0) * unit
            cos1 = math.cos(lat1)

            def inv_eqc(pts: np.ndarray) -> np.ndarray:
                # spherical Plate-Carrée (Snyder eq. 12-5/12-6): the form
                # web map servers and global rasters actually emit
                lon = lon0 + np.degrees((pts[:, 0] - fe) / (a * cos1))
                lat = np.degrees((pts[:, 1] - fn) / a)
                return np.column_stack([lon, lat])

            return _with_unit(inv_eqc, unit)
        if re.search(r'PROJECTION\["?Lambert[_ ]?Azimuthal', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_laea(
                a, inv_f,
                p.get("longitude_of_center", p.get("central_meridian", 0.0)),
                p.get("latitude_of_center", p.get("latitude_of_origin", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Albers', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            lat0 = p.get("latitude_of_origin", p.get("latitude_of_center",
                                                     0.0))
            sp1 = p.get("standard_parallel_1", lat0)
            return _with_unit(make_inv_albers(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                lat0, sp1, p.get("standard_parallel_2", sp1),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Cassini', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_cassini(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("latitude_of_origin", p.get("latitude_of_center",
                                                  0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Bonne', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_bonne(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("standard_parallel_1",
                      p.get("latitude_of_origin", 45.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Krovak', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_krovak(
                a, inv_f,
                p.get("longitude_of_center", p.get("central_meridian", 0.0)),
                p.get("latitude_of_center", p.get("latitude_of_origin",
                                                  0.0)),
                p.get("azimuth", 30.28813975277778),
                p.get("pseudo_standard_parallel_1", 78.5),
                p.get("scale_factor", 0.9999),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?(Hotine[_ ]?)?Oblique[_ ]?Mercator',
                     wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            azi = p.get("azimuth", 90.0)
            variant = ("B" if re.search(r"Azimuth[_ ]?Center", wkt, re.I)
                       else "A")
            return _with_unit(make_inv_hom(
                a, inv_f,
                p.get("longitude_of_center", p.get("central_meridian", 0.0)),
                p.get("latitude_of_center", p.get("latitude_of_origin", 0.0)),
                azi, p.get("rectified_grid_angle", azi),
                p.get("scale_factor", 1.0),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit, variant), unit)
        if re.search(r'PROJECTION\["?Transverse[_ ]?Mercator', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_tmerc(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("latitude_of_origin", p.get("latitude_of_center", 0.0)),
                p.get("scale_factor", 1.0),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Sinusoidal', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_sinusoidal(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Eckert[_ ]?IV', wkt, re.I):
            p = _wkt_params(wkt)
            a, _inv_f = _wkt_spheroid(wkt)  # spherical-only: R = semimajor
            return _with_unit(make_inv_eckert4(
                a,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Robinson', wkt, re.I):
            p = _wkt_params(wkt)
            a, _inv_f = _wkt_spheroid(wkt)  # table-driven, spherical
            return _with_unit(make_inv_robinson(
                a,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Mollweide', wkt, re.I):
            p = _wkt_params(wkt)
            a, _inv_f = _wkt_spheroid(wkt)  # spherical-only: R = semimajor
            return _with_unit(make_inv_mollweide(
                a,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Miller', wkt, re.I):
            p = _wkt_params(wkt)
            a, _inv_f = _wkt_spheroid(wkt)  # spherical-only: R = semimajor
            return _with_unit(make_inv_miller(
                a,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Equal[_ ]?Earth', wkt, re.I):
            p = _wkt_params(wkt)
            a, _inv_f = _wkt_spheroid(wkt)  # spherical by definition
            return _with_unit(make_inv_equalearth(
                a,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Van[_ ]?der[_ ]?Grinten', wkt, re.I):
            p = _wkt_params(wkt)
            a, _inv_f = _wkt_spheroid(wkt)  # spherical-only: R = semimajor
            return _with_unit(make_inv_vdg(
                a,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?(Lambert[_ ]?)?Cylindrical[_ ]?'
                     r'Equal[_ ]?Area', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_cea(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("standard_parallel_1",
                      p.get("latitude_of_origin", 0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?(American[_ ]?)?Polyconic', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_polyconic(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("latitude_of_origin", p.get("latitude_of_center",
                                                  0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Gnomonic', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)   # sphere-only: raises on e2>0
            return _with_unit(make_inv_gnomonic(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("latitude_of_origin", p.get("latitude_of_center",
                                                  0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Orthographic', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)   # sphere-only: raises on e2>0
            return _with_unit(make_inv_ortho(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("latitude_of_origin", p.get("latitude_of_center",
                                                  0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Azimuthal[_ ]?Equidistant', wkt, re.I):
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)   # sphere-only: raises on e2>0
            return _with_unit(make_inv_aeqd(
                a, inv_f,
                p.get("central_meridian", p.get("longitude_of_center", 0.0)),
                p.get("latitude_of_origin", p.get("latitude_of_center",
                                                  0.0)),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        if re.search(r'PROJECTION\["?Mercator', wkt, re.I) or "3857" in wkt:
            # Real EPSG:3857 WKTs always carry a marker (authority code,
            # Pseudo/Web-Mercator name, Auxiliary_Sphere projection, or a
            # sphere PROJ4 extension) — those decode on the sphere. A plain
            # Mercator_1SP/2SP on a true ellipsoid is the EPSG:3395 World
            # Mercator family: the sphere approximation is off by up to
            # ~20 km in latitude, so it gets the ellipsoidal inverse.
            if ("3857" in wkt
                    or re.search(r"Pseudo[-_ ]?Mercator|Web[_ ]?Mercator"
                                 r"|Auxiliary[_ ]?Sphere"
                                 r"|Popular[_ ]?Visualisation", wkt, re.I)
                    or re.search(r"\+nadgrids=@null|\+b=6378137", wkt)):
                return _with_unit(_inv_webmerc, unit)
            p = _wkt_params(wkt)
            a, inv_f = _wkt_spheroid(wkt)
            return _with_unit(make_inv_mercator(
                a, inv_f, p.get("central_meridian", 0.0),
                p.get("scale_factor", 1.0),
                p.get("standard_parallel_1",
                      p.get("latitude_of_true_scale")),
                p.get("false_easting", 0.0) * unit,
                p.get("false_northing", 0.0) * unit), unit)
        proj = re.search(r'PROJECTION\[\s*"([^"]+)"', wkt, re.I)
        if proj:
            raise ValueError(
                f'unsupported PROJECTION "{proj.group(1)}" in .prj — '
                f"refusing to decode projected coordinates as degrees")
        # geographic (GEOGCS) or unrecognizable content → identity
        return None
    except ValueError:
        raise
    except Exception:
        return None


# --- A13–A15: DBF ------------------------------------------------------------

_FLOAT_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?")


def js_parse_float(txt: str) -> float:
    """JS parseFloat: longest leading float prefix; none → NaN."""
    m = _FLOAT_RE.match(txt.strip())
    return float(m.group(0)) if m else float("nan")


def parse_dbf_header(buf: bytes):
    """A13: (record_count, header_len, record_len, fields)."""
    n_records = int(np.frombuffer(buf, "<u4", 1, 4)[0])
    header_len = int(np.frombuffer(buf, "<u2", 1, 8)[0])
    record_len = int(np.frombuffer(buf, "<u2", 1, 10)[0])
    fields, off = [], 32
    # off+32 bound: a buffer truncated mid-descriptor (terminator never
    # reached) contributes only its complete descriptors
    while off + 32 <= len(buf) and buf[off] != 0x0D:
        fd = buf[off:off + 32]
        name = fd[0:11].split(b"\x00", 1)[0].decode("ascii", "replace")
        fields.append({"name": name, "type": chr(fd[11]),
                       "len": fd[16], "dec": fd[17]})
        off += 32
    return n_records, header_len, record_len, fields


def _decode_value(ftype: str, raw: bytes, encoding: str):
    if ftype in ("N", "F", "O"):
        return js_parse_float(raw.decode("ascii", "replace"))
    if ftype == "D":
        txt = raw.decode("ascii", "replace").strip()
        if len(txt) == 8 and txt.isdigit():
            from datetime import date
            return date(int(txt[:4]), int(txt[4:6]), int(txt[6:8]))
        return None
    if ftype == "L":
        ch = raw[:1].decode("ascii", "replace").lower()
        if ch in ("y", "t"):
            return True
        if ch in ("n", "f"):
            return False
        return None
    return raw.decode(encoding, "replace").strip()


def parse_dbf(buf: bytes, encoding: str = "latin-1") -> list[dict]:
    """A14+A15: DBF buffer → list of row dicts.

    Columnar inner loop: the record area is reshaped to an
    (n_records, record_len) byte slab; each field decodes from one
    contiguous column slice of that slab."""
    n_records, header_len, record_len, fields = parse_dbf_header(buf)
    avail = (len(buf) - header_len) // record_len if record_len else 0
    n = min(n_records, max(avail, 0))
    if n <= 0:
        # truncated inside the header / no intact record: nothing decodable
        # (frombuffer would reject even a zero-count read past the buffer)
        return []
    slab = np.frombuffer(buf, np.uint8, n * record_len,
                         header_len).reshape(n, record_len)
    rows = [dict() for _ in range(n)]
    off = 1  # skip deletion flag
    for f in fields:
        col = slab[:, off:off + f["len"]]
        for i in range(n):
            rows[i][f["name"]] = _decode_value(
                f["type"], col[i].tobytes(), encoding)
        off += f["len"]
    return rows


def parse_cpg(buf: bytes | str | None) -> str:
    """A15: .cpg content → python codec name (default latin-1)."""
    if buf is None:
        return "latin-1"
    txt = buf.decode("ascii", "replace") if isinstance(buf, bytes) else buf
    txt = txt.strip().lower()
    if "utf" in txt and "8" in txt:
        return "utf-8"
    if "8859" in txt or "latin" in txt:
        return "latin-1"
    m = re.match(r"^(?:cp)?(\d{3,5})$", txt)
    if m:
        return f"cp{m.group(1)}"
    return "latin-1"


def combine(geoms: list, rows: list[dict]) -> list[dict]:
    """A17: positional zip — feature i = geometry i + (dbf row i or {})."""
    return [{"type": "Feature", "geometry": g,
             "properties": rows[i] if i < len(rows) else {}}
            for i, g in enumerate(geoms)]
