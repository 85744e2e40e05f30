"""Spatial-statistics & image-QA operators (round-3 batches, continued):

spatial stats — standard deviational ellipse (the ArcGIS directional-
                distribution primitive) from exact integer µdeg moments;
                emerging-hotspot classification (space-time-cube analog:
                per-cell Mann-Kendall trend × adaptive hot threshold)
image QA      — GLCM texture features (Haralick contrast/energy) and a
                codec-distortion audit (exact SSE of decoded vs ground
                truth — the decode path's bit-exactness proof) over REAL
                decoded raw/png/qb bytes

All oracle-gated exact (DuckDB twins) and parked in registry._TAIL — each
operator family keeps an in-window row (B1/B3/B5 grids, B11 image decode,
C6 stats).  Reference parity: upstream shapefile-js is geometry ingest
(SURVEY.md §2.A [RECONSTRUCTED]); these extend the §6 analytics family.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import cells, fixtures

_ = np  # numpy used by tests importing this module's constants


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- std_dev_ellipse: directional distribution of event points -------------------
#
# The standard deviational ellipse (mean center, orientation, major/minor
# axis) per event type — the GIS "directional distribution" tool.  Points
# quantize to exact µdeg integers, so every moment (n, Sx, Sy, Sxx, Syy,
# Sxy) is an exact DECIMAL(38,0)/int64 aggregate at ANY aggregation order
# (Sxx ~ 3e21 at 100M rows — past int64, exact in DECIMAL); the ellipse
# parameters compose the moments in ONE literal float expression shared
# verbatim with the oracle (the spatial_autocorr determinism rule), with
# ATAN2/SQRT under the repo's round-6 libm guard.

_EV_UDEG = (f"CAST(FLOOR(({fixtures.EVENT_LON_SQL}) * 1000000.0) AS BIGINT)",
            f"CAST(FLOOR(({fixtures.EVENT_LAT_SQL}) * 1000000.0) AS BIGINT)")

_VX = "((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n)"
_VY = "((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n)"
_CXY = "((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / n)"
_DISC = (f"SQRT(({_VX} - {_VY}) * ({_VX} - {_VY}) "
         f"+ 4.0 * {_CXY} * {_CXY})")

_ELLIPSE_OUT = (
    "CAST(n AS BIGINT) AS n_events",
    "ROUND(CAST(sx AS DOUBLE) / n, 6) AS cx_udeg",
    "ROUND(CAST(sy AS DOUBLE) / n, 6) AS cy_udeg",
    f"ROUND(0.5 * ATAN2(2.0 * {_CXY}, {_VX} - {_VY}), 6) AS theta",
    f"ROUND(SQRT(GREATEST(({_VX} + {_VY} + {_DISC}) / 2.0, 0.0)), 6) "
    "AS sigma_major",
    f"ROUND(SQRT(GREATEST(({_VX} + {_VY} - {_DISC}) / 2.0, 0.0)), 6) "
    "AS sigma_minor",
)


def q_std_dev_ellipse(spark, sf_dir):
    e = _t(spark, sf_dir, "events").selectExpr(
        "event_type AS g",
        f"{_EV_UDEG[0]} AS ix", f"{_EV_UDEG[1]} AS iy")
    m = e.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("ix").alias("sx"), F.sum("iy").alias("sy"),
        F.expr("SUM(CAST(ix AS DECIMAL(38, 0)) * ix)").alias("sxx"),
        F.expr("SUM(CAST(iy AS DECIMAL(38, 0)) * iy)").alias("syy"),
        F.expr("SUM(CAST(ix AS DECIMAL(38, 0)) * iy)").alias("sxy"))
    return m.selectExpr("g", *_ELLIPSE_OUT)


ORACLE_ELLIPSE = f"""
WITH e AS (
  SELECT event_type AS g,
         {_EV_UDEG[0]} AS ix, {_EV_UDEG[1]} AS iy
  FROM events),
m AS (
  SELECT g, COUNT(*) AS n, SUM(ix) AS sx, SUM(iy) AS sy,
         SUM(CAST(ix AS DECIMAL(38, 0)) * ix) AS sxx,
         SUM(CAST(iy AS DECIMAL(38, 0)) * iy) AS syy,
         SUM(CAST(ix AS DECIMAL(38, 0)) * iy) AS sxy
  FROM e GROUP BY 1)
SELECT g, {', '.join(_ELLIPSE_OUT)}
FROM m
"""


# --- codec_distortion: decoded-vs-ground-truth error audit ------------------------
#
# Decode REAL raw/png/qb bytes and compare to the generator formula
# P(y,x,c) = mix(i·1000003 + y·4096 + x·4 + c) % 256.  Lossless formats
# must report sse = 0 (the decode path's bit-exactness proof, now a gated
# row, not just a pytest); the lossy qb codec stores (P >> 2) << 2 | 2,
# so its per-pixel error is exactly (P % 4) − 2 and the oracle rebuilds
# the SSE by lattice sums.  PSNR composes the exact integers in one
# round-6 literal; an i-weighted checksum pins errors to the right image.

DIST_N = 24          # ids 0..23 — all three formats


def q_codec_distortion(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, DIST_N, partitions=4)
    d = multimodal.distortion_checksums(img)
    withi = d.selectExpr(
        "n_px", "sse", "max_err",
        "CAST(substr(image_id, 4) AS BIGINT) AS i",
        "CASE (CAST(substr(image_id, 4) AS BIGINT) % 3) WHEN 0 THEN 'raw' "
        "WHEN 1 THEN 'png' ELSE 'qb' END AS fmt")
    return (withi.groupBy("fmt")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("n_px").alias("n_pixels"),
                 F.sum("sse").alias("total_sse"),
                 F.max("max_err").alias("worst_err"),
                 F.expr("SUM(sse * (i + 3))").alias("checksum"))
            .selectExpr(
                "fmt", "CAST(n_images AS BIGINT) AS n_images",
                "CAST(n_pixels AS BIGINT) AS n_pixels",
                "CAST(total_sse AS BIGINT) AS total_sse",
                "CAST(worst_err AS BIGINT) AS worst_err",
                "CAST(checksum AS BIGINT) AS checksum",
                "CASE WHEN total_sse = 0 THEN CAST(NULL AS DOUBLE) "
                "ELSE ROUND(10.0 * LOG10(65025.0 * n_pixels / total_sse), 6) "
                "END AS psnr_db"))


def _oracle_distortion() -> str:
    from .hashing import mix_sql
    m = fixtures.images_meta_sql("i")
    px = mix_sql("i * 1000003 + yy.y * 4096 + xx.x * 4 + cc.c")
    return f"""
WITH imgs AS (
  SELECT i, {m['w']} AS w, {m['h']} AS h, {m['fmt']} AS fmt
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {DIST_N - 1})) AS i) t),
pix AS (
  SELECT i, fmt,
         CASE WHEN fmt = 'qb' THEN (({px}) % 256) % 4 - 2 ELSE 0 END AS err
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, h - 1)) AS y) yy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w - 1)) AS x) xx,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS c) cc),
per AS (
  SELECT i, fmt, COUNT(*) AS n_px, SUM(err * err) AS sse,
         MAX(ABS(err)) AS max_err
  FROM pix GROUP BY 1, 2)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(n_px) AS BIGINT) AS n_pixels,
       CAST(SUM(sse) AS BIGINT) AS total_sse,
       CAST(MAX(max_err) AS BIGINT) AS worst_err,
       CAST(SUM(sse * (i + 3)) AS BIGINT) AS checksum,
       CASE WHEN SUM(sse) = 0 THEN CAST(NULL AS DOUBLE)
       ELSE ROUND(10.0 * LOG10(65025.0 * SUM(n_px) / SUM(sse)), 6)
       END AS psnr_db
FROM per GROUP BY 1
"""


# --- glcm_texture: Haralick co-occurrence texture features ------------------------
#
# Horizontal (0,1)-offset gray-level co-occurrence over pixels quantized
# to 8 levels, per channel: contrast = Σ count·(i−j)² and energy =
# Σ count² are exact int64 per image, aggregated per format with an
# i-weighted checksum.  qb images decode to (P>>2)<<2 | 2, so even the
# lossy format's texture is exactly reproducible by the oracle's lattice
# pair sums.  The Spark side runs the REAL decode (multimodal kernel).

GLCM_N = 24
GLCM_LEVELS = 8


def q_glcm_texture(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, GLCM_N, partitions=4)
    g = multimodal.glcm_checksums(img, levels=GLCM_LEVELS)
    withi = g.selectExpr(
        "n_pairs", "contrast", "energy",
        "CAST(substr(image_id, 4) AS BIGINT) AS i",
        "CASE (CAST(substr(image_id, 4) AS BIGINT) % 3) WHEN 0 THEN 'raw' "
        "WHEN 1 THEN 'png' ELSE 'qb' END AS fmt")
    return (withi.groupBy("fmt")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("n_pairs").alias("n_pairs"),
                 F.sum("contrast").alias("contrast"),
                 F.sum("energy").alias("energy"),
                 F.expr("SUM(contrast * (i + 5))").alias("checksum"))
            .selectExpr("fmt", "CAST(n_images AS BIGINT) AS n_images",
                        "CAST(n_pairs AS BIGINT) AS n_pairs",
                        "CAST(contrast AS BIGINT) AS contrast",
                        "CAST(energy AS BIGINT) AS energy",
                        "CAST(checksum AS BIGINT) AS checksum"))


def _oracle_glcm() -> str:
    from .hashing import mix_sql
    m = fixtures.images_meta_sql("i")
    shift = 256 // GLCM_LEVELS
    pl = mix_sql("i * 1000003 + yy.y * 4096 + xx.x * 4 + cc.c")
    pr = mix_sql("i * 1000003 + yy.y * 4096 + (xx.x + 1) * 4 + cc.c")
    # decoded value per fmt: qb quantizes to FLOOR(P/4)*4 + 2
    dl = (f"CASE WHEN fmt = 'qb' THEN CAST(FLOOR((({pl}) % 256) / 4.0) "
          f"AS BIGINT) * 4 + 2 ELSE ({pl}) % 256 END")
    dr = (f"CASE WHEN fmt = 'qb' THEN CAST(FLOOR((({pr}) % 256) / 4.0) "
          f"AS BIGINT) * 4 + 2 ELSE ({pr}) % 256 END")
    return f"""
WITH imgs AS (
  SELECT i, {m['w']} AS w, {m['h']} AS h, {m['fmt']} AS fmt
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {GLCM_N - 1})) AS i) t),
pairs AS (
  SELECT i, fmt,
         CAST(FLOOR(({dl}) / {float(shift)!r}) AS BIGINT) AS ql,
         CAST(FLOOR(({dr}) / {float(shift)!r}) AS BIGINT) AS qr
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, h - 1)) AS y) yy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w - 2)) AS x) xx,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS c) cc),
cooc AS (
  SELECT i, fmt, ql, qr, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2, 3, 4),
per AS (
  SELECT i, fmt, SUM(cnt) AS n_pairs,
         SUM(cnt * (ql - qr) * (ql - qr)) AS contrast,
         SUM(cnt * cnt) AS energy
  FROM cooc GROUP BY 1, 2)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(n_pairs) AS BIGINT) AS n_pairs,
       CAST(SUM(contrast) AS BIGINT) AS contrast,
       CAST(SUM(energy) AS BIGINT) AS energy,
       CAST(SUM(contrast * (i + 5)) AS BIGINT) AS checksum
FROM per GROUP BY 1
"""


# --- emerging_hotspots: space-time-cube trend classification ----------------------
#
# The "emerging hot spot analysis" analog: per level-6 cell, a
# Mann-Kendall trend S over the DAILY count series (exact integer pair
# signs), crossed with an adaptive hot threshold (cell total ≥ 2× the
# mean occupied-cell total, compared as integers cross-multiplied — no
# float boundary).  Every post-agg set is bounded by lattice × day-span,
# never by corpus size; the pair join is per-cell over ≤ span days.

HOT_LVL = 6


def q_emerging_hotspots(spark, sf_dir):
    cell = cells.cell_sql(f"({fixtures.EVENT_LON_SQL})",
                          f"({fixtures.EVENT_LAT_SQL})", HOT_LVL)
    daily = (_t(spark, sf_dir, "events")
             .selectExpr(f"{cell} AS cell",
                         "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ))"
                         " / 86400000000) AS BIGINT) AS d")
             .groupBy("cell", "d").agg(F.count(F.lit(1)).alias("c")))
    tot = daily.groupBy("cell").agg(F.sum("c").alias("total"))
    grand = tot.agg(F.sum("total").alias("gt"),
                    F.count(F.lit(1)).alias("nc"))
    a, b = daily.alias("a"), daily.alias("b")
    s = (a.join(b, (F.col("a.cell") == F.col("b.cell"))
                & (F.col("a.d") < F.col("b.d")))
         .selectExpr("a.cell AS cell",
                     "CASE WHEN b.c > a.c THEN 1 "
                     "WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn")
         .groupBy("cell").agg(F.sum("sgn").alias("s")))
    per = (tot.join(s, "cell", "left")
           .crossJoin(F.broadcast(grand))
           .selectExpr("cell", "total",
                       "COALESCE(s, 0) AS s",
                       "CASE WHEN total * nc >= 2 * gt THEN 1 ELSE 0 END "
                       "AS hot"))
    return (per.selectExpr(
        "hot",
        "CASE WHEN s > 0 THEN 'up' WHEN s < 0 THEN 'down' ELSE 'flat' END "
        "AS trend", "total", "s", "cell")
        .groupBy("hot", "trend")
        .agg(F.count(F.lit(1)).alias("n_cells"),
             F.sum("total").alias("n_events"),
             F.sum("s").alias("sum_s"),
             F.sum("cell").alias("checksum"))
        .selectExpr("CAST(hot AS INT) AS hot", "trend",
                    "CAST(n_cells AS BIGINT) AS n_cells",
                    "CAST(n_events AS BIGINT) AS n_events",
                    "CAST(sum_s AS BIGINT) AS sum_s",
                    "CAST(checksum AS BIGINT) AS checksum"))


def _oracle_hotspots() -> str:
    cell = cells.cell_sql(f"({fixtures.EVENT_LON_SQL})",
                          f"({fixtures.EVENT_LAT_SQL})", HOT_LVL)
    return f"""
WITH daily AS (
  SELECT {cell} AS cell,
         CAST(FLOOR(epoch_us(ts) / 86400000000) AS BIGINT) AS d,
         COUNT(*) AS c
  FROM events GROUP BY 1, 2),
tot AS (SELECT cell, SUM(c) AS total FROM daily GROUP BY 1),
grand AS (SELECT SUM(total) AS gt, COUNT(*) AS nc FROM tot),
s AS (
  SELECT a.cell,
         SUM(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END)
           AS s
  FROM daily a JOIN daily b ON a.cell = b.cell AND a.d < b.d
  GROUP BY 1),
per AS (
  SELECT tot.cell, tot.total, COALESCE(s.s, 0) AS s,
         CASE WHEN tot.total * grand.nc >= 2 * grand.gt THEN 1 ELSE 0 END
           AS hot
  FROM tot LEFT JOIN s ON tot.cell = s.cell CROSS JOIN grand)
SELECT CAST(hot AS INT) AS hot,
       CASE WHEN s > 0 THEN 'up' WHEN s < 0 THEN 'down' ELSE 'flat' END
         AS trend,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(total) AS BIGINT) AS n_events,
       CAST(SUM(s) AS BIGINT) AS sum_s,
       CAST(SUM(cell) AS BIGINT) AS checksum
FROM per GROUP BY 1, 2
"""


QUERIES: dict = {
    "std_dev_ellipse": (q_std_dev_ellipse, ORACLE_ELLIPSE),
    "codec_distortion": (q_codec_distortion, _oracle_distortion()),
    "glcm_texture": (q_glcm_texture, _oracle_glcm()),
    "emerging_hotspots": (q_emerging_hotspots, _oracle_hotspots()),
}
