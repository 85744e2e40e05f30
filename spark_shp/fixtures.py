"""Deterministic synthetic inputs (FIXTURES.md §1–§2, §4).

Everything here is reproducible from integer formulas only — no RNG state, no
external data — and each generated column has a twin SQL expression (same
string in Spark SQL and DuckDB) so oracle queries can re-derive it.

  * ``images``  — the north-rule input table (BASELINE.json input_hint):
    (image_id, bytes, w, h, fmt, caption, phash) + derived lon/lat footprint
    with 30% of rows forced into one hot cell (exercises skew salting).
  * ``fences``  — M rectangle (multi)polygons, some with holes, some
    two-part; fence 63 pinned over the hot spot.
  * driver-table spatializers — events → points, nation → rectangle fences,
    as SQL fragments shared verbatim between engine and oracle.
"""

from __future__ import annotations

import numpy as np

from . import codecs
from .hashing import mix, u01, u01_sql

FMTS = ("raw", "png", "qb")
HOT_LON, HOT_LAT = 10.0, 50.0


# ---------------------------------------------------------------------------
# images table (numpy / Arrow side)
# ---------------------------------------------------------------------------

def image_pixels(i: int, w: int, h: int) -> np.ndarray:
    """P_i[y,x,c] = uint8(mix(i*1_000_003 + y*4096 + x*4 + c) % 256)."""
    y, x, c = np.meshgrid(np.arange(h, dtype=np.int64),
                          np.arange(w, dtype=np.int64),
                          np.arange(3, dtype=np.int64), indexing="ij")
    k = i * 1_000_003 + y * 4096 + x * 4 + c
    return (mix(k) % 256).astype(np.uint8)


def images_meta(ids: np.ndarray) -> dict[str, np.ndarray]:
    """Vectorized metadata columns for image ids (everything but pixels)."""
    i = np.asarray(ids, dtype=np.int64)
    w = (16 + (mix(i * 5 + 1) % 5) * 16).astype(np.int32)
    h = (16 + (mix(i * 5 + 2) % 5) * 16).astype(np.int32)
    lon = u01(i * 5 + 3) * 360.0 - 180.0
    lat = u01(i * 5 + 4) * 170.0 - 85.0
    hot = (i % 10) < 3
    lon = np.where(hot, HOT_LON + u01(i * 5 + 3) * 0.01, lon)
    lat = np.where(hot, HOT_LAT + u01(i * 5 + 4) * 0.01, lat)
    return {"i": i, "w": w, "h": h, "lon": lon, "lat": lat}


def images_meta_sql(i: str) -> dict[str, str]:
    """The same metadata as SQL expressions of a non-negative int column
    ``i`` — valid in Spark SQL and DuckDB (oracle twin of images_meta)."""
    base_lon = f"({u01_sql(f'({i}) * 5 + 3')} * 360.0 - 180.0)"
    base_lat = f"({u01_sql(f'({i}) * 5 + 4')} * 170.0 - 85.0)"
    hot = f"(({i}) % 10) < 3"
    return {
        "w": f"CAST(16 + (({mixw_sql(i, 1)}) % 5) * 16 AS INT)",
        "h": f"CAST(16 + (({mixw_sql(i, 2)}) % 5) * 16 AS INT)",
        "lon": (f"(CASE WHEN {hot} THEN {HOT_LON!r} + "
                f"{u01_sql(f'({i}) * 5 + 3')} * 0.01 ELSE {base_lon} END)"),
        "lat": (f"(CASE WHEN {hot} THEN {HOT_LAT!r} + "
                f"{u01_sql(f'({i}) * 5 + 4')} * 0.01 ELSE {base_lat} END)"),
        "fmt": (f"(CASE (({i}) % 3) WHEN 0 THEN 'raw' WHEN 1 THEN 'png' "
                f"ELSE 'qb' END)"),
        "image_id": f"concat('img', lpad(CAST(({i}) AS STRING), 12, '0'))",
    }


def mixw_sql(i: str, off: int) -> str:
    from .hashing import mix_sql
    return mix_sql(f"({i}) * 5 + {off}")


def image_row(i: int) -> dict:
    """Fully materialized image row (pixels encoded, phash computed)."""
    m = images_meta(np.array([i]))
    w, h = int(m["w"][0]), int(m["h"][0])
    px = image_pixels(i, w, h)
    fmt = FMTS[i % 3]
    lon, lat = float(m["lon"][0]), float(m["lat"][0])
    return {
        "image_id": f"img{i:012d}",
        "bytes": codecs.encode(px, fmt),
        "w": w, "h": h, "fmt": fmt,
        "caption": f"synthetic image {i} at ({lon:.3f},{lat:.3f})",
        "phash": codecs.phash(px),
        "lon": lon, "lat": lat,
    }


def images_df(spark, n: int, partitions: int = 32, with_pixels: bool = True):
    """Distributed synthesis of the images table: spark.range → mapInArrow.

    Pixel generation + encoding happen inside executor tasks (Arrow batches),
    so synthesis scales with cores — this is the bench generator.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
        T.StructField("lon", T.DoubleType()),
        T.StructField("lat", T.DoubleType()),
    ])
    pa_schema = pa.schema([
        ("image_id", pa.string()), ("bytes", pa.binary()),
        ("w", pa.int32()), ("h", pa.int32()), ("fmt", pa.string()),
        ("caption", pa.string()), ("phash", pa.int64()),
        ("lon", pa.float64()), ("lat", pa.float64()),
    ])

    def gen(batches):
        for batch in batches:
            ids = batch.column(0).to_numpy()
            m = images_meta(ids)
            rows = {k: [] for k in
                    ("image_id", "bytes", "caption", "phash")}
            for j, i in enumerate(ids):
                i = int(i)
                if with_pixels:
                    px = image_pixels(i, int(m["w"][j]), int(m["h"][j]))
                    rows["bytes"].append(codecs.encode(px, FMTS[i % 3]))
                    rows["phash"].append(codecs.phash(px))
                else:
                    rows["bytes"].append(b"")
                    rows["phash"].append(0)
                rows["image_id"].append(f"img{i:012d}")
                rows["caption"].append(
                    f"synthetic image {i} at "
                    f"({m['lon'][j]:.3f},{m['lat'][j]:.3f})")
            yield pa.RecordBatch.from_arrays(
                [pa.array(rows["image_id"], pa.string()),
                 pa.array(rows["bytes"], pa.binary()),
                 pa.array(m["w"], pa.int32()),
                 pa.array(m["h"], pa.int32()),
                 pa.array([FMTS[int(i) % 3] for i in ids], pa.string()),
                 pa.array(rows["caption"], pa.string()),
                 pa.array(rows["phash"], pa.int64()),
                 pa.array(m["lon"], pa.float64()),
                 pa.array(m["lat"], pa.float64())],
                schema=pa_schema)

    return spark.range(0, n, numPartitions=partitions).mapInArrow(gen, schema)


# ---------------------------------------------------------------------------
# fence polygon layer (FIXTURES.md §2) — M rectangles, holes, multi-parts
# ---------------------------------------------------------------------------

def _rect_ring(cx, cy, hx, hy, clockwise):
    """Closed rectangle ring with the requested reference orientation."""
    ring = np.array([(cx - hx, cy - hy), (cx - hx, cy + hy),
                     (cx + hx, cy + hy), (cx + hx, cy - hy),
                     (cx - hx, cy - hy)], dtype=np.float64)
    from .geom import is_clockwise
    if is_clockwise(ring) != clockwise:
        ring = ring[::-1].copy()
    return ring


def fence_params(j: int):
    if j == 63:
        return HOT_LON + 0.005, HOT_LAT + 0.005, 1.0, 1.0
    clon = u01(np.int64(j * 7 + 1)) * 360.0 - 180.0
    clat = u01(np.int64(j * 7 + 2)) * 160.0 - 80.0
    hx = 0.5 + u01(np.int64(j * 7 + 3)) * 4.0
    hy = 0.5 + u01(np.int64(j * 7 + 4)) * 4.0
    return float(clon), float(clat), float(hx), float(hy)


def fence_rings(j: int) -> list[np.ndarray]:
    """Rings (file order) for fence j: outer CW, hole CCW, optional 2nd part."""
    cx, cy, hx, hy = fence_params(j)
    rings = [_rect_ring(cx, cy, hx, hy, True)]
    if j % 4 == 0:
        rings.append(_rect_ring(cx, cy, hx / 2, hy / 2, False))
    if j % 8 == 0:
        rings.append(_rect_ring(cx + 4 * hx, cy, hx, hy, True))
    return rings


def fence_edges(m: int = 64) -> np.ndarray:
    """Edge table rows (poly_id, x1, y1, x2, y2) for fences 0..m-1."""
    from .geom import rings_to_edges
    out = []
    for j in range(m):
        e = rings_to_edges(fence_rings(j))
        out.append(np.hstack([np.full((e.shape[0], 1), j, dtype=np.float64), e]))
    return np.vstack(out)


def fences_df(spark, m: int = 64):
    """Fence layer as a DataFrame of MultiPolygon-rank ragged arrays."""
    from pyspark.sql import types as T
    from .geom import assemble_rings, ring_bbox

    rows = []
    for j in range(m):
        rings = fence_rings(j)
        polys = assemble_rings(rings)
        coords = [[[list(map(float, pt)) for pt in ring] for ring in poly]
                  for poly in polys]
        xs = np.vstack(rings)
        rows.append((j, "fence", coords,
                     (float(xs[:, 0].min()), float(xs[:, 1].min()),
                      float(xs[:, 0].max()), float(xs[:, 1].max())),
                     f"poly{j}"))
    schema = T.StructType([
        T.StructField("poly_id", T.LongType()),
        T.StructField("layer", T.StringType()),
        T.StructField("coordinates", T.ArrayType(T.ArrayType(
            T.ArrayType(T.ArrayType(T.DoubleType()))))),
        T.StructField("bbox", T.StructType([
            T.StructField("xmin", T.DoubleType()),
            T.StructField("ymin", T.DoubleType()),
            T.StructField("xmax", T.DoubleType()),
            T.StructField("ymax", T.DoubleType())])),
        T.StructField("name", T.StringType()),
    ])
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# driver-table spatializers (FIXTURES.md §4) — dialect-shared SQL
# ---------------------------------------------------------------------------

EVENT_LON_SQL = f"({u01_sql('event_id')} * 360.0 - 180.0)"
EVENT_LAT_SQL = f"({u01_sql('event_id * 2 + 1')} * 170.0 - 85.0)"

NATION_CLON_SQL = f"({u01_sql('n_nationkey * 7 + 1')} * 360.0 - 180.0)"
NATION_CLAT_SQL = f"({u01_sql('n_nationkey * 7 + 2')} * 160.0 - 80.0)"
NATION_HALF_SQL = "(2.0 + CAST(n_nationkey % 5 AS DOUBLE))"


def nation_edges_sql() -> str:
    """Subquery producing nation fence rectangles as an edge table
    (n_nationkey, x1, y1, x2, y2) — same string in Spark SQL and DuckDB.

    Corner order matches :func:`_rect_ring`:
    (cx−h,cy−h) → (cx−h,cy+h) → (cx+h,cy+h) → (cx+h,cy−h) → close.
    """
    corners = [(-1, -1), (-1, 1), (1, 1), (1, -1), (-1, -1)]
    cases_x1, cases_y1, cases_x2, cases_y2 = [], [], [], []
    for e in range(4):
        (sx1, sy1), (sx2, sy2) = corners[e], corners[e + 1]
        cases_x1.append(f"WHEN {e} THEN cx + ({sx1}) * hw")
        cases_y1.append(f"WHEN {e} THEN cy + ({sy1}) * hw")
        cases_x2.append(f"WHEN {e} THEN cx + ({sx2}) * hw")
        cases_y2.append(f"WHEN {e} THEN cy + ({sy2}) * hw")
    return f"""(
      SELECT n_nationkey, n_name,
             CASE e.i {' '.join(cases_x1)} END AS x1,
             CASE e.i {' '.join(cases_y1)} END AS y1,
             CASE e.i {' '.join(cases_x2)} END AS x2,
             CASE e.i {' '.join(cases_y2)} END AS y2
      FROM (
        SELECT n_nationkey, n_name,
               {NATION_CLON_SQL} AS cx,
               {NATION_CLAT_SQL} AS cy,
               {NATION_HALF_SQL} AS hw
        FROM nation
      ) f
      CROSS JOIN (VALUES (0), (1), (2), (3)) AS e(i)
    )"""


def nation_fences_np(nationkeys: np.ndarray):
    """numpy twin of the SQL nation fences: (cx, cy, half)."""
    k = np.asarray(nationkeys, dtype=np.int64)
    cx = u01(k * 7 + 1) * 360.0 - 180.0
    cy = u01(k * 7 + 2) * 160.0 - 80.0
    hw = 2.0 + (k % 5).astype(np.float64)
    return cx, cy, hw


def fence_wkt(j: int) -> str:
    """Fence j as a WKT POLYGON/MULTIPOLYGON string (rings grouped by the
    reference assembly, coordinates rendered as exact 6-decimal strings
    from micro-degree integers). Interop fixture for wkt_polygon_ingest."""
    from .geom import assemble_rings

    def fmt(v: float) -> str:
        u = int(np.floor(v * 1e6 + 0.5))
        sign = "-" if u < 0 else ""
        a = abs(u)
        return f"{sign}{a // 1000000}.{a % 1000000:06d}"

    def ring_txt(r) -> str:
        return "(" + ", ".join(f"{fmt(x)} {fmt(y)}" for x, y in r) + ")"

    polys = assemble_rings(fence_rings(j))
    parts = ["(" + ", ".join(ring_txt(r) for r in p) + ")" for p in polys]
    if len(parts) == 1:
        return "POLYGON" + parts[0]
    return "MULTIPOLYGON(" + ", ".join(parts) + ")"
