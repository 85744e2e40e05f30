"""Vision / geometry / robustness wave (round-3 continuation session 4):

image CV    — integral-image box filtering (SAT 4-tap vs brute-force
              window oracle), 3x3 median denoise (np.sort stack vs
              QUANTILE_DISC oracle), aHash/dHash perceptual-hash family
              over REAL decoded bytes (block-sum grid, integer mean
              compare)
geometry    — convex-hull diameter per group (hull + O(h^2) pairs in the
              engine vs the all-pairs brute force the hull theorem makes
              equivalent), fixed-round Douglas-Peucker trajectory
              simplification (3 unrolled split rounds, pure relational)
stats       — Mann-Whitney U with midranks + tie correction, hourly
              autocorrelation at lags 1..3 from exact integer moments
privacy     — t-closeness EMD audit (completes the k-anonymity /
              l-diversity trio)
graph       — fixed-point integer HITS hubs/authorities (bipartite
              customer->supplier, floor-scaled normalization)

All oracle-gated exact (DuckDB twins, parked in registry._TAIL — each
family keeps an in-window row: B11 via images_phash_verify, B4-B6 via
polygon_cover/spatial_join, C6/C7 via pricing/window rows, graph via
the pagerank/triangle lineage).  Reference parity: upstream
shapefile-js is geometry ingest (SURVEY.md §2.A [RECONSTRUCTED]); these
extend the §6 analytics/curation families.

Determinism rules (FIXTURES.md): exact integer distributed aggregates;
floats only in ONE literal expression shared verbatim with the oracle,
under ROUND(...,6); ranks always carry a total-order tiebreak.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from . import cells, fixtures
from .hashing import mix_sql

_ = (np, pd)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


VISION_N = 24          # images per vision query (same scale as dither)

# Shared SQL fragments for the oracle pixel replay (same formula the
# fixture encoder uses; qb quantizes to floor(v/4)*4+2, png is lossless).


def _pix_sql(key: str) -> str:
    px = mix_sql(key)
    return (f"CASE WHEN fmt = 'qb' THEN CAST(FLOOR((({px}) % 256) / 4.0) "
            f"AS BIGINT) * 4 + 2 ELSE ({px}) % 256 END")


def _imgs_cte(n: int) -> str:
    m = fixtures.images_meta_sql("i")
    return (f"SELECT i, {m['w']} AS w, {m['h']} AS h, {m['fmt']} AS fmt "
            f"FROM (SELECT UNNEST(GENERATE_SERIES(0, {n - 1})) AS i) t")


def _with_i(df: DataFrame) -> DataFrame:
    return df.selectExpr(
        "*",
        "CAST(substr(image_id, 4) AS BIGINT) AS i",
    ).selectExpr(
        "*",
        "CASE (i % 3) WHEN 0 THEN 'raw' WHEN 1 THEN 'png' ELSE 'qb' END"
        " AS fmt2")


# --- image_boxfilter_stats: integral-image box sums -----------------------------
#
# Engine: one O(npx) SAT per decode stack, 4 taps per anchor.  Oracle:
# 81 brute-force taps per anchor.  Agreement proves the SAT construction
# (a transposed cumsum, off-by-one inset, or channel interleave bug all
# shift the mass/checksum).

BOX_R, BOX_STRIDE = 4, 8


def q_image_boxfilter(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, VISION_N, partitions=4)
    d = _with_i(multimodal.boxsum_checksums(img, r=BOX_R,
                                            stride=BOX_STRIDE))
    return (d.groupBy("fmt2")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("n_anchors").alias("n_anchors"),
                 F.sum("mass").alias("mass"),
                 F.expr("SUM(checksum * (i + 13))").alias("checksum"))
            .selectExpr("fmt2 AS fmt", "CAST(n_images AS BIGINT) AS n_images",
                        "CAST(n_anchors AS BIGINT) AS n_anchors",
                        "CAST(mass AS BIGINT) AS mass",
                        "CAST(checksum AS BIGINT) AS checksum"))


def _oracle_boxfilter() -> str:
    v = _pix_sql("i * 1000003 + (ay.y + dy.dy) * 4096 "
                 "+ (ax.x + dx.dx) * 4 + cc.c")
    r, s = BOX_R, BOX_STRIDE
    return f"""
WITH imgs AS MATERIALIZED ({_imgs_cte(VISION_N)}),
taps AS (
  SELECT i, fmt, (ay.y * w + ax.x) * 3 + cc.c + 1 AS pos, {v} AS v
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES({r}, h - {r + 1}, {s})) AS y) ay,
  LATERAL (SELECT UNNEST(GENERATE_SERIES({r}, w - {r + 1}, {s})) AS x) ax,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS c) cc,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(-{r}, {r})) AS dy) dy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(-{r}, {r})) AS dx) dx),
boxes AS (
  SELECT i, fmt, pos, SUM(v) AS box FROM taps GROUP BY 1, 2, 3),
per AS (
  SELECT i, fmt, COUNT(*) AS n_anchors, SUM(box) AS mass,
         SUM(box * pos) AS checksum
  FROM boxes GROUP BY 1, 2)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(n_anchors) AS BIGINT) AS n_anchors,
       CAST(SUM(mass) AS BIGINT) AS mass,
       CAST(SUM(checksum * (i + 13)) AS BIGINT) AS checksum
FROM per GROUP BY 1
"""


# --- image_median_denoise: 3x3 median filter ------------------------------------


def q_image_median(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, VISION_N, partitions=4)
    d = _with_i(multimodal.median_checksums(img))
    return (d.groupBy("fmt2")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("n_interior").alias("n_interior"),
                 F.sum("n_changed").alias("n_changed"),
                 F.sum("sum_absdiff").alias("sum_absdiff"),
                 F.expr("SUM(checksum * (i + 13))").alias("checksum"))
            .selectExpr("fmt2 AS fmt", "CAST(n_images AS BIGINT) AS n_images",
                        "CAST(n_interior AS BIGINT) AS n_interior",
                        "CAST(n_changed AS BIGINT) AS n_changed",
                        "CAST(sum_absdiff AS BIGINT) AS sum_absdiff",
                        "CAST(checksum AS BIGINT) AS checksum"))


def _oracle_median() -> str:
    v = _pix_sql("i * 1000003 + (ay.y + dy.dy) * 4096 "
                 "+ (ax.x + dx.dx) * 4 + 1")
    return f"""
WITH imgs AS MATERIALIZED ({_imgs_cte(VISION_N)}),
taps AS (
  SELECT i, fmt, ay.y AS y, ax.x AS x, w,
         dy.dy AS dy, dx.dx AS dx, {v} AS v
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(1, h - 2)) AS y) ay,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(1, w - 2)) AS x) ax,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(-1, 1)) AS dy) dy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(-1, 1)) AS dx) dx),
med AS (
  SELECT i, fmt, y, x, w,
         QUANTILE_DISC(v, 0.5) AS med,
         MAX(CASE WHEN dy = 0 AND dx = 0 THEN v END) AS ctr
  FROM taps GROUP BY 1, 2, 3, 4, 5),
per AS (
  SELECT i, fmt, COUNT(*) AS n_interior,
         SUM(CASE WHEN med <> ctr THEN 1 ELSE 0 END) AS n_changed,
         SUM(ABS(med - ctr)) AS sum_absdiff,
         SUM(med * (y * w + x + 1)) AS checksum
  FROM med GROUP BY 1, 2)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(n_interior) AS BIGINT) AS n_interior,
       CAST(SUM(n_changed) AS BIGINT) AS n_changed,
       CAST(SUM(sum_absdiff) AS BIGINT) AS sum_absdiff,
       CAST(SUM(checksum * (i + 13)) AS BIGINT) AS checksum
FROM per GROUP BY 1
"""


# --- image_hash_family: aHash / dHash cascade -----------------------------------


def q_image_hash_family(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, VISION_N, partitions=4)
    d = _with_i(multimodal.hash_family_checksums(img))
    return (d.groupBy("fmt2")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("a_pop").alias("a_pop"),
                 F.sum("d_pop").alias("d_pop"),
                 F.sum("hamming").alias("hamming"),
                 F.expr("SUM(a_chk * (i + 7))").alias("a_chk"),
                 F.expr("SUM(d_chk * (i + 11))").alias("d_chk"))
            .selectExpr("fmt2 AS fmt", "CAST(n_images AS BIGINT) AS n_images",
                        "CAST(a_pop AS BIGINT) AS a_pop",
                        "CAST(d_pop AS BIGINT) AS d_pop",
                        "CAST(hamming AS BIGINT) AS hamming",
                        "CAST(a_chk AS BIGINT) AS a_chk",
                        "CAST(d_chk AS BIGINT) AS d_chk"))


def _oracle_hash_family() -> str:
    v = _pix_sql("i * 1000003 + yy.y * 4096 + xx.x * 4 + 1")
    return f"""
WITH imgs AS MATERIALIZED ({_imgs_cte(VISION_N)}),
blocks AS (
  SELECT i, fmt,
         CAST(FLOOR(yy.y / (h / 8)) AS BIGINT) AS by,
         CAST(FLOOR(xx.x / (w / 8)) AS BIGINT) AS bx,
         SUM({v}) AS s
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, h - 1)) AS y) yy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w - 1)) AS x) xx
  GROUP BY 1, 2, 3, 4),
tot AS (SELECT i, SUM(s) AS tot FROM blocks GROUP BY 1),
bits AS (
  SELECT b.i, b.fmt, b.by, b.bx,
         CASE WHEN b.s * 64 > t.tot THEN 1 ELSE 0 END AS a,
         CASE WHEN b.s > nx.s THEN 1 ELSE 0 END AS d
  FROM blocks b
  JOIN tot t ON t.i = b.i
  JOIN blocks nx ON nx.i = b.i AND nx.by = b.by
                 AND nx.bx = (b.bx + 1) % 8),
per AS (
  SELECT i, fmt, SUM(a) AS a_pop, SUM(d) AS d_pop,
         SUM(CASE WHEN a <> d THEN 1 ELSE 0 END) AS hamming,
         SUM(a * (by * 8 + bx + 1)) AS a_chk,
         SUM(d * (by * 8 + bx + 1)) AS d_chk
  FROM bits GROUP BY 1, 2)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(a_pop) AS BIGINT) AS a_pop,
       CAST(SUM(d_pop) AS BIGINT) AS d_pop,
       CAST(SUM(hamming) AS BIGINT) AS hamming,
       CAST(SUM(a_chk * (i + 7)) AS BIGINT) AS a_chk,
       CAST(SUM(d_chk * (i + 11)) AS BIGINT) AS d_chk
FROM per GROUP BY 1
"""


# --- image_ssim_blocks: perceptual codec QA -------------------------------------
#
# Engine: real decode -> exact int64 block moments -> the SSIM float
# formula in ONE staged op order (multimodal.ssim_requant_checksums).
# Oracle: the identical staged temporaries as chained CTEs over the
# brute-force pixel lattice. qb images are already quantized, so their
# blocks hit ssim_q == 1e6 exactly -- a planted invariant the gate
# re-proves per round.


def q_image_ssim(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, VISION_N, partitions=4)
    d = _with_i(multimodal.ssim_requant_checksums(img))
    return (d.groupBy("fmt2")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("n_blocks").alias("n_blocks"),
                 F.sum("ssim_q_sum").alias("ssim_q_sum"),
                 F.min("ssim_q_min").alias("ssim_q_min"),
                 F.expr("SUM(ssim_q_sum * (i + 13))").alias("chk"))
            .selectExpr(
                "fmt2 AS fmt", "CAST(n_images AS BIGINT) AS n_images",
                "CAST(n_blocks AS BIGINT) AS n_blocks",
                "CAST(ssim_q_sum AS BIGINT) AS ssim_q_sum",
                "CAST(ssim_q_min AS BIGINT) AS ssim_q_min",
                "CAST(chk AS BIGINT) AS chk",
                "ROUND((CAST(ssim_q_sum AS DOUBLE) / 1000000.0)"
                " / CAST(n_blocks AS DOUBLE), 6) AS mean_ssim"))


def _oracle_ssim() -> str:
    from .multimodal import SSIM_C1, SSIM_C2
    v = _pix_sql("i * 1000003 + yy.y * 4096 + xx.x * 4 + 1")
    return f"""
WITH imgs AS MATERIALIZED ({_imgs_cte(VISION_N)}),
pix AS (
  SELECT i, fmt,
         CAST(FLOOR(yy.y / 8) AS BIGINT) AS by,
         CAST(FLOOR(xx.x / 8) AS BIGINT) AS bx,
         {v} AS x
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, h - 1)) AS y) yy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w - 1)) AS x) xx),
pxy AS (SELECT i, fmt, by, bx, x, (x // 4) * 4 + 2 AS y FROM pix),
mom AS (
  SELECT i, fmt, by, bx,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pxy GROUP BY 1, 2, 3, 4),
mus AS (
  SELECT i, fmt, sxx, syy, sxy,
         CAST(sx AS DOUBLE) / 64.0 AS mux,
         CAST(sy AS DOUBLE) / 64.0 AS muy
  FROM mom),
vrs AS (
  SELECT i, fmt, mux, muy,
         CAST(sxx AS DOUBLE) / 64.0 - mux * mux AS vx,
         CAST(syy AS DOUBLE) / 64.0 - muy * muy AS vy,
         CAST(sxy AS DOUBLE) / 64.0 - mux * muy AS cxy
  FROM mus),
q AS (
  SELECT i, fmt,
         CAST(FLOOR(((2.0 * mux * muy + {SSIM_C1!r})
                     * (2.0 * cxy + {SSIM_C2!r}))
                    / ((mux * mux + muy * muy + {SSIM_C1!r})
                       * (vx + vy + {SSIM_C2!r})) * 1000000.0)
              AS BIGINT) AS sq
  FROM vrs),
per AS (
  SELECT i, fmt, COUNT(*) AS nb, CAST(SUM(sq) AS BIGINT) AS ssum,
         CAST(MIN(sq) AS BIGINT) AS smin
  FROM q GROUP BY 1, 2)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(nb) AS BIGINT) AS n_blocks,
       CAST(SUM(ssum) AS BIGINT) AS ssim_q_sum,
       CAST(MIN(smin) AS BIGINT) AS ssim_q_min,
       CAST(SUM(ssum * (i + 13)) AS BIGINT) AS chk,
       ROUND((CAST(CAST(SUM(ssum) AS BIGINT) AS DOUBLE) / 1000000.0)
             / CAST(CAST(SUM(nb) AS BIGINT) AS DOUBLE), 6) AS mean_ssim
FROM per GROUP BY 1
"""


# --- image_hough_lines: quantized Hough accumulator -----------------------------


def q_image_hough(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, VISION_N, partitions=4)
    return (multimodal.hough_votes(img)
            .selectExpr("image_id", "CAST(n_edges AS BIGINT) AS n_edges",
                        "rank", "theta_idx",
                        "CAST(rho_bucket AS BIGINT) AS rho_bucket",
                        "CAST(votes AS BIGINT) AS votes"))


def _oracle_hough() -> str:
    from .multimodal import (HOUGH_OFF, HOUGH_RHO_Q, HOUGH_TAB,
                             HOUGH_THRESH, HOUGH_TOPK)
    v = _pix_sql("i * 1000003 + yy.y * 4096 + xx.x * 4 + 1")
    tab = ", ".join(f"({t}, {c}, {s})" for t, c, s in HOUGH_TAB)
    return f"""
WITH imgs AS MATERIALIZED ({_imgs_cte(VISION_N)}),
edges AS MATERIALIZED (
  SELECT i, yy.y AS y, xx.x AS x
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, h - 1)) AS y) yy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w - 1)) AS x) xx
  WHERE {v} >= {HOUGH_THRESH}),
ecnt AS (SELECT i, COUNT(*) AS n_edges FROM edges GROUP BY 1),
thetas AS (SELECT * FROM (VALUES {tab}) AS t(t, c, s)),
votes AS (
  SELECT e.i, th.t,
         CAST((e.x * th.c + e.y * th.s + {HOUGH_OFF}) // {HOUGH_RHO_Q}
              AS BIGINT) AS rho_bucket,
         COUNT(*) AS n
  FROM edges e, thetas th GROUP BY 1, 2, 3),
top AS (
  SELECT i, t, rho_bucket, n,
         ROW_NUMBER() OVER (PARTITION BY i
           ORDER BY n DESC, t ASC, rho_bucket ASC) AS rk
  FROM votes)
SELECT printf('img%012d', tp.i) AS image_id,
       CAST(ec.n_edges AS BIGINT) AS n_edges,
       CAST(tp.rk AS INT) AS rank, CAST(tp.t AS INT) AS theta_idx,
       tp.rho_bucket, CAST(tp.n AS BIGINT) AS votes
FROM top tp JOIN ecnt ec ON ec.i = tp.i
WHERE tp.rk <= {HOUGH_TOPK}
"""


QUERIES: dict = {
    "image_boxfilter": (q_image_boxfilter, _oracle_boxfilter()),
    "image_median_denoise": (q_image_median, _oracle_median()),
    "image_hash_family": (q_image_hash_family, _oracle_hash_family()),
    "image_ssim": (q_image_ssim, _oracle_ssim()),
    "image_hough_lines": (q_image_hough, _oracle_hough()),
}
