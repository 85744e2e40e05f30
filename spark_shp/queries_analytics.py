"""Sixth query batch — analytics & raster-algebra operators that round out
the engine's surface (all oracle-gated exact; registered past the driver's
50-query window in registry._TAIL because each family keeps an in-window
row):

  * chunk_documents     — sliding-window token chunking with overlap, the
                          RAG/pretraining chunker (text-pipeline family).
  * pareto_frontier     — 2-D skyline over ``part`` (C7/C8 family) via the
                          sort+running-max trick, NOT an O(n^2) self-join.
  * gapfill_locf        — hourly spine + last-observation-carried-forward
                          per sampled user (C5/C7 time-series family).
  * cell_morphology     — raster erosion/boundary extraction on the
                          occupied-cell set (B3 grid-stencil family).
  * map_algebra_cells   — two-layer raster algebra (events density vs
                          images density per cell; B1/B5 family).
  * geohash_encode      — canonical base32 geohash strings from the same
                          Morton machinery (B1 family; verified against the
                          published 'ezs42'/'gcpvj'/'xn76' test vectors).

Scale notes are per-operator in the docstrings; the shared constraint is
the repo rule: exact cross-engine hashes need integer (or copied-through)
values everywhere, with at most one final float division per statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from . import cells, fixtures
from .queries_spatial import N_IMAGES_ORACLE, _images_meta_df, _images_meta_oracle_src


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- chunk_documents: sliding-window token chunking ---------------------------

CHUNK_SIZE = 8   # tokens per chunk
CHUNK_STRIDE = 6  # tokens between chunk starts (overlap = 2)


def q_chunk_documents(spark, sf_dir):
    """Overlapping fixed-size token chunks — the step that turns a cleaned
    corpus into model-ready windows (RAG passages / pretraining sequences).
    Chunk starts at token offsets 0, STRIDE, 2*STRIDE, ... < n_tokens; the
    final chunk may be short. Entirely JVM-side: split → sequence →
    posexplode → slice → array_join, no Python, no shuffle at all (narrow
    per-row fan-out) — at 100 TB this is a map-only stage that parallelizes
    with the scan."""
    d = _t(spark, sf_dir, "documents")
    return d.selectExpr(
        "doc_id", "split(text, ' ') AS toks",
    ).selectExpr(
        "doc_id",
        f"posexplode(sequence(0, greatest(0, size(toks) - 1), {CHUNK_STRIDE}))"
        " AS (chunk_idx, s)",
        "toks",
    ).selectExpr(
        "doc_id",
        "CAST(chunk_idx AS BIGINT) AS chunk_idx",
        f"CAST(size(slice(toks, s + 1, {CHUNK_SIZE})) AS BIGINT) AS n_toks",
        f"array_join(slice(toks, s + 1, {CHUNK_SIZE}), ' ') AS chunk_text",
    )


ORACLE_CHUNKS = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
st AS (SELECT doc_id, ts, CAST(u.s AS BIGINT) AS s
       FROM toks, UNNEST(range(0, GREATEST(len(ts), 1), {CHUNK_STRIDE}))
            AS u(s))
SELECT doc_id,
       CAST(s / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(len(ts[s + 1 : s + {CHUNK_SIZE}]) AS BIGINT) AS n_toks,
       array_to_string(ts[s + 1 : s + {CHUNK_SIZE}], ' ') AS chunk_text
FROM st
"""


# --- pareto_frontier: 2-D skyline over part -----------------------------------

def q_pareto_frontier(spark, sf_dir):
    """Skyline query: parts not dominated on (minimize p_retailprice,
    maximize p_size). A part is dominated iff some other part is <= on
    price AND >= on size with at least one strict. Instead of the naive
    O(n^2) self-join, aggregate to one row per DISTINCT price (max size),
    take a running max of size over ascending price (rows-frame on the
    distinct-price table, where rows == range), and join back: a part
    survives iff no strictly-cheaper price reaches its size AND it carries
    the max size at its own price. The global-order window runs on the
    aggregated distinct-price table — orders of magnitude smaller than the
    fact table — and the join-back broadcasts it; the fact table itself is
    never shuffled."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", "p_size")
    byprice = p.groupBy("p_retailprice").agg(F.max("p_size").alias("mx"))
    w = W.orderBy("p_retailprice").rowsBetween(W.unboundedPreceding, -1)
    run = byprice.withColumn("run_lt", F.max("mx").over(w))
    j = p.join(F.broadcast(run), "p_retailprice")
    return (j.where((F.col("run_lt").isNull()
                     | (F.col("run_lt") < F.col("p_size")))
                    & (F.col("mx") <= F.col("p_size")))
            .select("p_partkey", "p_retailprice", "p_size"))


# Independent algorithm on the oracle side: literal NOT EXISTS dominance —
# a stronger differential than replaying the window trick.
ORACLE_PARETO = """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
"""


# --- gapfill_locf: hourly spine + last-observation-carried-forward -----------

GAPFILL_USER_MOD = 101  # sampled users: user_id % 101 == 0
HOUR_US = 3_600_000_000


def q_gapfill_locf(spark, sf_dir):
    """Time-series gap filling: for each sampled user, build the dense
    hourly spine between their first and last event hour and carry the
    last observed ``value`` forward into empty hours (LOCF). The spine is
    generated distributed (sequence+explode per user — no driver loop),
    sized by each user's own span; the LOCF is one window pass per user.
    Values are copied, never recomputed, so the float column hashes
    exactly. Scale: output is O(users x span-hours), each user's chain is
    independent — partition by user and it parallelizes perfectly."""
    e = (_t(spark, sf_dir, "events")
         .where(f"user_id % {GAPFILL_USER_MOD} = 0")
         .selectExpr(
             "user_id", "event_id", "value",
             f"CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) "
             f"/ {float(HOUR_US)!r}) AS BIGINT) AS hr",
             "ts"))
    # last observation within each observed hour
    wlast = W.partitionBy("user_id", "hr").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    hourly = (e.withColumn("rn", F.row_number().over(wlast))
              .where("rn = 1").select("user_id", "hr",
                                      F.col("value").alias("hv")))
    spine = (e.groupBy("user_id")
             .agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
             .selectExpr("user_id",
                         "explode(sequence(mn, mx)) AS hr"))
    j = spine.join(hourly, ["user_id", "hr"], "left")
    wf = (W.partitionBy("user_id").orderBy("hr")
          .rowsBetween(W.unboundedPreceding, 0))
    return (j.withColumn("val", F.last("hv", ignorenulls=True).over(wf))
            .selectExpr("user_id", "hr", "val",
                        "CAST(hv IS NOT NULL AS INT) AS observed"))


ORACLE_GAPFILL = f"""
WITH e AS (
  SELECT user_id, event_id, value, ts,
         CAST(FLOOR(epoch_us(ts) / {float(HOUR_US)!r}) AS BIGINT) AS hr
  FROM events WHERE user_id % {GAPFILL_USER_MOD} = 0),
hourly AS (
  SELECT user_id, hr, value AS hv FROM (
    SELECT user_id, hr, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, hr
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM e) t WHERE rn = 1),
b AS (SELECT user_id, MIN(hr) AS mn, MAX(hr) AS mx FROM e GROUP BY user_id),
spine AS (SELECT user_id, CAST(u.h AS BIGINT) AS hr
          FROM b, UNNEST(range(mn, mx + 1)) AS u(h))
SELECT s.user_id, s.hr,
       LAST_VALUE(h.hv IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.hr
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS val,
       CAST(CASE WHEN h.hv IS NOT NULL THEN 1 ELSE 0 END AS INT) AS observed
FROM spine s LEFT JOIN hourly h ON h.user_id = s.user_id AND h.hr = s.hr
"""


# --- cell_morphology: erosion / boundary extraction on the cell raster -------

MORPH_LEVEL = 6  # 64x64 world grid — mixed occupancy at every driver SF

_OFFSETS = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]


def q_cell_morphology(spark, sf_dir):
    """Binary raster morphology over the occupied-cell set of ``events``:
    a cell is INTERIOR iff all 8 neighbors are occupied (erosion), else
    BOUNDARY — the same stencil shape as focal_density but over set
    membership, i.e. the morphological-erosion / edge-extraction step of a
    density-mask pipeline. Lattice-edge cells are boundary by construction
    (their outside neighbors are unoccupied). Implementation: distinct
    (ix,iy) once, constant 8-way codegen explode, one self-equi-join on
    the shifted key, LEFT join so zero-neighbor islands keep count 0.
    Output folds to one row per ix stripe (all-integer checksums) so the
    gate row stays small at any SF. Scale: everything is keyed by cell —
    two shuffles (distinct + neighbor join) over a set whose size is
    bounded by the lattice (4^level), not the corpus."""
    e = _t(spark, sf_dir, "events")
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, MORPH_LEVEL)
    occ = e.selectExpr(f"{ix} AS ix", f"{iy} AS iy").distinct()
    shifted = occ.selectExpr(
        f"explode(array({','.join(f'struct(ix + {dx} AS nx, iy + {dy} AS ny)' for dx, dy in _OFFSETS)})) AS o"
    ).selectExpr("o.nx AS ix", "o.ny AS iy")
    n_nb = shifted.groupBy("ix", "iy").agg(F.count(F.lit(1)).alias("n_nb"))
    cellrows = (occ.join(n_nb, ["ix", "iy"], "left")
                .selectExpr("ix", "iy", "COALESCE(n_nb, 0) AS n_nb")
                .selectExpr("ix", "iy",
                            "CAST(n_nb = 8 AS INT) AS interior"))
    return (cellrows.groupBy("ix")
            .agg(F.count(F.lit(1)).alias("n_occ"),
                 F.sum("interior").alias("n_interior"),
                 F.sum(F.expr("iy * (1 + interior)")).alias("checksum"))
            .selectExpr("ix", "CAST(n_occ AS BIGINT) AS n_occ",
                        "CAST(n_interior AS BIGINT) AS n_interior",
                        "CAST(checksum AS BIGINT) AS checksum"))


def _oracle_morphology() -> str:
    ix, iy = cells.quantize_sql(fixtures.EVENT_LON_SQL,
                                fixtures.EVENT_LAT_SQL, MORPH_LEVEL)
    offs = ",".join(f"({dx},{dy})" for dx, dy in _OFFSETS)
    return f"""
WITH occ AS (SELECT DISTINCT {ix} AS ix, {iy} AS iy FROM events),
off AS (SELECT * FROM (VALUES {offs}) AS o(dx, dy)),
nb AS (
  SELECT a.ix, a.iy, COUNT(b.ix) AS n_nb
  FROM occ a CROSS JOIN off
  LEFT JOIN occ b ON b.ix = a.ix + off.dx AND b.iy = a.iy + off.dy
  GROUP BY a.ix, a.iy),
cellrows AS (
  SELECT ix, iy, CASE WHEN n_nb = 8 THEN 1 ELSE 0 END AS interior FROM nb)
SELECT ix, CAST(COUNT(*) AS BIGINT) AS n_occ,
       CAST(SUM(interior) AS BIGINT) AS n_interior,
       CAST(SUM(iy * (1 + interior)) AS BIGINT) AS checksum
FROM cellrows GROUP BY ix
"""


# --- map_algebra_cells: two-layer raster algebra ------------------------------

ALGEBRA_LEVEL = 8


def q_map_algebra_cells(spark, sf_dir):
    """Raster (map) algebra: overlay the events-density grid and the
    images-density grid at the same cell level and compute per-cell
    difference and ratio — the cross-layer normalization step of any
    multi-source spatial rollup (e.g. observations per asset). Both layers
    aggregate map-side to one row per cell BEFORE the join, so the full
    outer join is cell-count-bounded (4^level), independent of corpus
    size. diff is exact int64; ratio is ONE int/int float64 division
    (bit-deterministic on both engines, the repo's autocorr rule)."""
    e = _t(spark, sf_dir, "events")
    ecell = e.selectExpr(
        f"{cells.cell_sql(fixtures.EVENT_LON_SQL, fixtures.EVENT_LAT_SQL, ALGEBRA_LEVEL)} AS cell_id")
    eg = ecell.groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_events"))
    img = _images_meta_df(spark, N_IMAGES_ORACLE, full_schema=False)
    ig = (img.selectExpr(
        f"{cells.cell_sql('lon', 'lat', ALGEBRA_LEVEL)} AS cell_id")
        .groupBy("cell_id").agg(F.count(F.lit(1)).alias("n_images")))
    j = eg.join(ig, "cell_id", "full_outer")
    return j.selectExpr(
        "cell_id",
        "CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events",
        "CAST(COALESCE(n_images, 0) AS BIGINT) AS n_images",
        "CAST(COALESCE(n_events, 0) - COALESCE(n_images, 0) AS BIGINT) AS diff",
        "CASE WHEN COALESCE(n_images, 0) > 0 THEN "
        "CAST(COALESCE(n_events, 0) AS DOUBLE) / COALESCE(n_images, 0) "
        "END AS ratio")


def _oracle_map_algebra() -> str:
    return f"""
WITH eg AS (
  SELECT {cells.cell_sql(fixtures.EVENT_LON_SQL, fixtures.EVENT_LAT_SQL, ALGEBRA_LEVEL)} AS cell_id,
         COUNT(*) AS n_events
  FROM events GROUP BY 1),
ig AS (
  SELECT {cells.cell_sql('lon', 'lat', ALGEBRA_LEVEL)} AS cell_id,
         COUNT(*) AS n_images
  FROM {_images_meta_oracle_src(N_IMAGES_ORACLE)} img GROUP BY 1)
SELECT COALESCE(eg.cell_id, ig.cell_id) AS cell_id,
       CAST(COALESCE(n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(n_images, 0) AS BIGINT) AS n_images,
       CAST(COALESCE(n_events, 0) - COALESCE(n_images, 0) AS BIGINT) AS diff,
       CASE WHEN COALESCE(n_images, 0) > 0 THEN
         CAST(COALESCE(n_events, 0) AS DOUBLE) / COALESCE(n_images, 0)
       END AS ratio
FROM eg FULL OUTER JOIN ig ON eg.cell_id = ig.cell_id
"""


# --- geohash_encode: canonical base32 geohash ---------------------------------

GH_BITS_PER_AXIS = 15  # 6 chars = 30 bits = 15 lon + 15 lat
GH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"


def _geohash6_sql(lon: str, lat: str) -> str:
    """Canonical 6-character geohash as a dialect-shared SQL expression.

    Geohash interleaves bits MSB-first starting with LONGITUDE over the
    ±180/±90 ranges (note: ±90 latitude, unlike the engine's internal
    ±85 cells), then maps 5-bit groups to the base32 alphabet. In the
    engine's LSB-spread terms that is ``spread(iy) | spread(ix) << 1``
    — morton_sql with (iy, ix) swapped. Verified this session against the
    published vectors: (-5.603, 42.605) → 'ezs42…', London → 'gcpvj…',
    Tokyo → 'xn76…'. Pure integer/float arithmetic valid in Spark SQL and
    DuckDB alike (no bit-shift operators needed: values < 2**30)."""
    n = 1 << GH_BITS_PER_AXIS
    ix = (f"GREATEST(0, LEAST({n - 1}, CAST(FLOOR((({lon}) + 180.0) / 360.0 "
          f"* {float(n)!r}) AS BIGINT)))")
    iy = (f"GREATEST(0, LEAST({n - 1}, CAST(FLOOR((({lat}) + 90.0) / 180.0 "
          f"* {float(n)!r}) AS BIGINT)))")
    g = cells.morton_sql(iy, ix)  # lon bits land at odd (higher) positions
    chars = []
    for i in range(6):
        shift = 1 << (25 - 5 * i)
        idx = f"(CAST(FLOOR(({g}) / {float(shift)!r}) AS BIGINT) % 32)"
        chars.append(f"SUBSTRING('{GH_ALPHABET}', CAST({idx} + 1 AS INT), 1)")
    return "CONCAT(" + ", ".join(chars) + ")"


def q_geohash_encode(spark, sf_dir):
    """Geohash the events table and aggregate per 4-character prefix —
    interop with the one cell format the rest of the geo world speaks.
    The full 6-char hash is gated through MIN(gh6) per prefix plus an
    event-id checksum, so a single wrong bit in any row flips the result.
    Pure codegen arithmetic + one groupBy: scales like tile_assign."""
    e = _t(spark, sf_dir, "events")
    gh = _geohash6_sql(fixtures.EVENT_LON_SQL, fixtures.EVENT_LAT_SQL)
    return (e.selectExpr("event_id", f"{gh} AS gh6")
            .selectExpr("event_id", "gh6", "SUBSTRING(gh6, 1, 4) AS gh4")
            .groupBy("gh4")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("gh6").alias("min_gh6"),
                 F.sum("event_id").alias("id_sum"))
            .selectExpr("gh4", "CAST(n_events AS BIGINT) AS n_events",
                        "min_gh6", "CAST(id_sum AS BIGINT) AS id_sum"))


def _oracle_geohash() -> str:
    gh = _geohash6_sql(fixtures.EVENT_LON_SQL, fixtures.EVENT_LAT_SQL)
    return f"""
WITH g AS (SELECT event_id, {gh} AS gh6 FROM events)
SELECT SUBSTRING(gh6, 1, 4) AS gh4,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MIN(gh6) AS min_gh6,
       CAST(SUM(event_id) AS BIGINT) AS id_sum
FROM g GROUP BY 1
"""


QUERIES: dict = {
    "chunk_documents": (q_chunk_documents, ORACLE_CHUNKS),
    "pareto_frontier": (q_pareto_frontier, ORACLE_PARETO),
    "gapfill_locf": (q_gapfill_locf, ORACLE_GAPFILL),
    "cell_morphology": (q_cell_morphology, _oracle_morphology()),
    "map_algebra_cells": (q_map_algebra_cells, _oracle_map_algebra()),
    "geohash_encode": (q_geohash_encode, _oracle_geohash()),
}
