"""Retrieval / ranking / graph-mining operators (round-3 continuation):

IR          — BM25 document ranking (the retrieval scorer of a RAG /
              search pipeline) over the documents corpus, top-k per query
relational  — GROUPING SETS + GROUPING_ID (the C6 surface between ROLLUP
              and CUBE that real reporting SQL actually writes)
graph       — link prediction over the co-ordered-parts graph (common
              neighbors + a quantized resource-allocation index)
image QA    — global Otsu threshold from the exact pixel histogram and
              RLE run-count compressibility over REAL decoded bytes
audio       — zero-crossing-rate windows over REAL RIFF/WAV decode

All oracle-gated exact (DuckDB twins, parked in registry._TAIL — each
family keeps an in-window row: C6 via pricing/rollup/cube, text via
tfidf/token_stats, graph via triangle/pagerank lineage, B11 via
images_phash_verify).  Reference parity: upstream shapefile-js is
geometry ingest (SURVEY.md §2.A [RECONSTRUCTED]); these extend the §6
analytics/curation families.

Determinism rules applied throughout (see FIXTURES.md): exact integer /
DECIMAL(38,0) distributed aggregates; floats only in ONE literal
expression shared verbatim with the oracle, under ROUND(...,6); bare
float literals wrapped CAST(... AS DOUBLE) where both operands could
otherwise parse DECIMAL; ranks always carry a total-order tiebreak.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

from . import fixtures

_ = (np, pd, T)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- bm25_search: BM25 top-k document retrieval -----------------------------------
#
# The ranking function of a search / RAG-retrieval pipeline (Robertson's
# BM25, the Lucene "BM25Similarity" variant with the +1-inside-LN idf so
# scores are always positive): for a FIXED literal query set, score every
# document containing >= 1 query term and keep the top-K per query.
#
# Determinism: tf / df / dl / N / sum(dl) are all exact integer
# aggregates; each query has <= 3 term SLOTS pivoted into fixed columns
# (tf1..tf3, df1..df3), so the final score is ONE literal float
# expression with a FIXED textual evaluation order shared verbatim with
# the oracle — no float is ever summed across a variable number of rows
# (the repo's spatial_autocorr rule).  Rank runs over the ROUND(...,6)
# score with a doc_id tiebreak.
#
# Scale shape: one (doc,term) tf shuffle; df and the corpus (N, sum dl)
# aggregates are tiny broadcasts; candidates are bounded by the postings
# lists of the query terms (docs containing >= 1 term), never the corpus.
# The per-query rank window partitions by qid — few partitions, so at
# 100 TB swap in the two-phase histogram top-k (outlier_audit) or
# per-partition partial top-k (cosine_topk); at gate scale the window
# over postings is the honest plan.

BM25_TOPK = 5
BM25_QUERIES = [  # (qid, slot, term) — slots 1..3, fixed at authoring time
    (1, 1, "dup"), (1, 2, "scan"),
    (2, 1, "spark"), (2, 2, "join"), (2, 3, "fast"),
    (3, 1, "window"), (3, 2, "agg"),
    (4, 1, "hash"), (4, 2, "merge"), (4, 3, "batch"),
]


def _bm25_slot(s: int) -> str:
    # idf = ln(1 + (N - df + 0.5)/(df + 0.5)); tf-norm with k1=1.2, b=0.75
    # (k1+1 = 2.2, k1*(1-b) = 0.3, k1*b = 0.9 pre-folded in python — the
    # repo's fold-float-constants rule).  Leading CAST makes every
    # operand DOUBLE before the bare literals join in.
    idf = (f"LN(CAST(1 AS DOUBLE) + (CAST(nd AS DOUBLE) - df{s} + 0.5) "
           f"/ (CAST(df{s} AS DOUBLE) + 0.5))")
    tfn = (f"(CAST(tf{s} AS DOUBLE) * 2.2) / (CAST(tf{s} AS DOUBLE) "
           f"+ 0.3 + 0.9 * (CAST(dl AS DOUBLE) * nd / sdl))")
    return (f"(CASE WHEN tf{s} > 0 THEN {idf} * {tfn} "
            f"ELSE CAST(0 AS DOUBLE) END)")


BM25_SCORE = (f"ROUND({_bm25_slot(1)} + {_bm25_slot(2)} + {_bm25_slot(3)}, 6)"
              " AS score")


def q_bm25_search(spark, sf_dir):
    return bm25_topk(spark, _t(spark, sf_dir, "documents"), BM25_QUERIES)


def bm25_topk(spark, d: DataFrame, queries: list) -> DataFrame:
    qt = spark.createDataFrame(queries, "qid INT, slot INT, term STRING")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    # Only the QUERY terms' postings matter — tf, df and the candidate set
    # are all derivable after a broadcast semi-filter on the exploded
    # tokens, so the (doc, term) shuffle carries the query terms' postings
    # (~|terms|/|vocab| of the corpus), not every term's.  Measured at
    # 100M tokens: 32.5 s → 16.7 s (BENCH/RETRIEVAL.json) — the remaining
    # cost is the split/explode corpus scan itself (3 passes: postings,
    # dl, N/Σdl), which is the irreducible part; the shuffle went from
    # corpus-sized to postings-sized, the property that matters at 100 TB.
    qterms = qt.select("term").distinct()
    tf = (toks.join(F.broadcast(qterms), "term", "left_semi")
          .groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")))
    dl = d.selectExpr("doc_id", "size(split(text, ' ')) AS dl")
    corpus = d.selectExpr("COUNT(*) AS nd",
                          "SUM(size(split(text, ' '))) AS sdl")
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfq = (qt.join(dfreq, "term", "left")
           .groupBy("qid")
           .agg(*[F.coalesce(
               F.sum(F.when(F.col("slot") == s, F.col("df"))),
               F.lit(0)).alias(f"df{s}") for s in (1, 2, 3)]))
    hits = (tf.join(F.broadcast(qt), "term")
            .groupBy("qid", "doc_id")
            .agg(*[F.coalesce(
                F.sum(F.when(F.col("slot") == s, F.col("tf"))),
                F.lit(0)).alias(f"tf{s}") for s in (1, 2, 3)]))
    scored = (hits.join(dl, "doc_id")
              .join(F.broadcast(dfq), "qid")
              .crossJoin(F.broadcast(corpus))
              .selectExpr("qid", "doc_id", BM25_SCORE))
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= BM25_TOPK)
            .selectExpr("CAST(qid AS INT) AS qid",
                        "CAST(rank AS INT) AS rank",
                        "CAST(doc_id AS BIGINT) AS doc_id", "score"))


def _oracle_bm25() -> str:
    vals = ", ".join(f"({q}, {s}, '{t}')" for q, s, t in BM25_QUERIES)
    return f"""
WITH qt AS (SELECT * FROM (VALUES {vals}) AS v(qid, slot, term)),
toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
tf AS (
  SELECT doc_id, ts[u.i] AS term, COUNT(*) AS tf
  FROM toks, UNNEST(range(1, len(ts) + 1)) AS u(i)
  GROUP BY 1, 2),
dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
corpus AS (SELECT COUNT(*) AS nd, SUM(len(string_split(text, ' '))) AS sdl
           FROM documents),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
dfq AS (
  SELECT qt.qid,
         COALESCE(SUM(CASE WHEN qt.slot = 1 THEN d.df END), 0) AS df1,
         COALESCE(SUM(CASE WHEN qt.slot = 2 THEN d.df END), 0) AS df2,
         COALESCE(SUM(CASE WHEN qt.slot = 3 THEN d.df END), 0) AS df3
  FROM qt LEFT JOIN dfreq d ON d.term = qt.term GROUP BY qt.qid),
hits AS (
  SELECT qt.qid, tf.doc_id,
         COALESCE(SUM(CASE WHEN qt.slot = 1 THEN tf.tf END), 0) AS tf1,
         COALESCE(SUM(CASE WHEN qt.slot = 2 THEN tf.tf END), 0) AS tf2,
         COALESCE(SUM(CASE WHEN qt.slot = 3 THEN tf.tf END), 0) AS tf3
  FROM tf JOIN qt ON qt.term = tf.term GROUP BY 1, 2),
scored AS (
  SELECT h.qid, h.doc_id, {BM25_SCORE}
  FROM hits h JOIN dl ON dl.doc_id = h.doc_id
  JOIN dfq ON dfq.qid = h.qid CROSS JOIN corpus),
r AS (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored)
SELECT CAST(qid AS INT) AS qid, CAST(rank AS INT) AS rank,
       CAST(doc_id AS BIGINT) AS doc_id, score
FROM r WHERE rank <= {BM25_TOPK}
"""


# --- grouping_sets_sales: GROUPING SETS + GROUPING_ID -----------------------------
#
# The C6 aggregation surface between ROLLUP and CUBE that reporting SQL
# actually writes: an explicit GROUPING SETS list — here (flag, status),
# (flag), () — with GROUPING_ID disambiguating which level produced each
# row (NULL data values vs NULL-because-aggregated).  Money sums follow
# the repo's DECIMAL-exact rule.  One shuffle (Spark expands the sets in
# a single Expand + hash aggregate, same as rollup/cube).

def q_grouping_sets_sales(spark, sf_dir):
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT)
                 AS gid,
               COUNT(*) AS n,
               CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
                    AS DECIMAL(38,6)) AS DOUBLE) AS qty
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())""")


ORACLE_GROUPING_SETS = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING_ID(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)))
            AS DECIMAL(38,6)) AS DOUBLE) AS qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


# --- link_prediction: common-neighbor scoring on the co-order graph --------------
#
# Graph link prediction (the recommender / entity-resolution primitive):
# over the co-ordered-parts graph — parts are adjacent when a HIGH-
# QUANTITY line (l_quantity >= 45, which bounds per-order fan-out and
# keeps the graph sparse at any SF) of the same order carries both —
# score non-adjacent pairs at distance 2 by common-neighbor count and a
# resource-allocation index Σ 1/deg(z).  RA is a float sum over a
# variable set, so it is QUANTIZED: Σ floor(2^20 / deg(z)) is an exact
# int64, bit-identical at any aggregation order (the engine-independence
# rule); the float rendering divides once at the end.  Top-K under the
# total order (cn DESC, raq DESC, a, b).
#
# Scale shape: pair generation is per-order (bounded by order width²,
# never parts²); the wedge join fans out Σ deg(z)² — bounded by the
# quantity filter, and the skew-salting in spatial.salt_hot_cells applies
# verbatim to a hot hub z at larger scales.  No driver state.

LP_TOPK = 20
LP_MIN_QTY = 45
LP_RAQ = 1 << 20


def q_link_prediction(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    f = (li.where(F.col("l_quantity") >= LP_MIN_QTY)
         .selectExpr("l_orderkey AS ok", "l_partkey AS pk").distinct())
    # e is referenced by nb (twice), deg, the wedge join (twice more
    # through nb) and the anti join — without materialization Spark
    # replays the corpus scan + pair join per reference (measured: 14
    # lineitem scans, 25 exchanges, ReusedExchange never kicked in).
    # The edge set is filter-bounded, so one localCheckpoint collapses
    # the plan to a single corpus scan (plan-pinned in pytest).
    e = (f.alias("x").join(f.alias("y"), "ok")
         .where("x.pk < y.pk")
         .selectExpr("x.pk AS a", "y.pk AS b").distinct()
         .localCheckpoint())
    nb = (e.selectExpr("a AS z", "b AS n")
          .unionAll(e.selectExpr("b AS z", "a AS n")))
    deg = nb.groupBy("z").agg(F.count(F.lit(1)).alias("d"))
    wedges = (nb.alias("p").join(nb.alias("q"), "z")
              .where("p.n < q.n")
              .join(deg, "z")
              .selectExpr("p.n AS a", "q.n AS b",
                          f"CAST(FLOOR({LP_RAQ} / d) AS BIGINT) AS w"))
    cand = (wedges.groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("cn"), F.sum("w").alias("raq"))
            .join(e, ["a", "b"], "left_anti"))
    return (cand.orderBy(F.desc("cn"), F.desc("raq"), "a", "b")
            .limit(LP_TOPK)
            .selectExpr("CAST(a AS BIGINT) AS a", "CAST(b AS BIGINT) AS b",
                        "CAST(cn AS BIGINT) AS cn",
                        "CAST(raq AS BIGINT) AS raq"))


ORACLE_LINK_PRED = f"""
WITH f AS (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
  FROM lineitem WHERE l_quantity >= {LP_MIN_QTY}),
e AS (
  SELECT DISTINCT x.pk AS a, y.pk AS b
  FROM f x JOIN f y ON x.ok = y.ok AND x.pk < y.pk),
nb AS (SELECT a AS z, b AS n FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT z, COUNT(*) AS d FROM nb GROUP BY z),
wedges AS (
  SELECT p.n AS a, q.n AS b,
         CAST(FLOOR({LP_RAQ} / deg.d) AS BIGINT) AS w
  FROM nb p JOIN nb q ON p.z = q.z AND p.n < q.n
  JOIN deg ON deg.z = p.z),
cand AS (
  SELECT w.a, w.b, COUNT(*) AS cn, SUM(w.w) AS raq
  FROM wedges w
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = w.a AND e.b = w.b)
  GROUP BY 1, 2)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(cn AS BIGINT) AS cn, CAST(raq AS BIGINT) AS raq
FROM cand ORDER BY cn DESC, raq DESC, a, b LIMIT {LP_TOPK}
"""


# --- image_otsu_threshold: global Otsu from the exact pixel histogram ------------
#
# The classic global binarization threshold (Otsu 1979) per format, over
# REAL decoded raw/png bytes: maximize the between-class variance
# σ_B²(t) = (S·w_b − n·S_b)² / (n² · w_b · (n − w_b)) over occupied
# values t.  The histogram reuses multimodal.histogram_checksums with
# 256 buckets (shape-grouped decode stacks, one bincount per group);
# cumulative moments run over the ≤256-row-per-format aggregate.  The
# numerator difference S_b·n − S·w_b is EXACT int64 (≤ ~6e12 at this
# pixel count; squaring would overflow, and DECIMAL(38,0)² trips
# DuckDB's precision cap — the documented π-literal pitfall — so the
# square happens in DOUBLE on the exactly-representable diff); the
# variance is one shared literal float composition under ROUND(...,6);
# argmax carries a lowest-value tiebreak.  Occupied-values semantics:
# σ_B² only changes at occupied values, and the argmax is restricted to
# them (documented; at this pixel count every value is occupied anyway).

OTSU_N = 24

_OTSU_DIFF = ("(CAST(sb AS BIGINT) * CAST(n AS BIGINT) - "
              "CAST(s AS BIGINT) * CAST(wb AS BIGINT))")
_OTSU_VAR = (f"ROUND(CAST({_OTSU_DIFF} AS DOUBLE) * {_OTSU_DIFF} "
             "/ wb / (n - wb) / n / n, 6)")


def q_image_otsu_threshold(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, OTSU_N, partitions=4).where(
        F.col("fmt") != "qb")
    h = (multimodal.histogram_checksums(img, buckets=256)
         .where("n_px > 0")
         .selectExpr("bucket AS v", "n_px",
                     "CASE WHEN CAST(substr(image_id, 4) AS BIGINT) % 3 = 0 "
                     "THEN 'raw' ELSE 'png' END AS fmt"))
    hist = h.groupBy("fmt", "v").agg(F.sum("n_px").alias("nv"))
    wnd = W.partitionBy("fmt").orderBy("v") \
           .rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = (hist
           .withColumn("wb", F.sum("nv").over(wnd))
           .withColumn("sb", F.sum(F.expr("CAST(v AS BIGINT) * nv"))
                       .over(wnd)))
    tot = hist.groupBy("fmt").agg(
        F.sum("nv").alias("n"),
        F.sum(F.expr("CAST(v AS BIGINT) * nv")).alias("s"))
    scored = (cum.join(tot, "fmt").where("wb < n")
              .selectExpr("fmt", "v", "wb", "n", f"{_OTSU_VAR} AS var_b"))
    rw = W.partitionBy("fmt").orderBy(F.desc("var_b"), F.asc("v"))
    return (scored.withColumn("rk", F.row_number().over(rw))
            .where("rk = 1")
            .selectExpr("fmt", "CAST(v AS INT) AS threshold",
                        "var_b",
                        "CAST(wb AS BIGINT) AS n_below",
                        "CAST(n AS BIGINT) AS n_pixels"))


def _oracle_otsu() -> str:
    from .hashing import mix_sql
    m = fixtures.images_meta_sql("i")
    px = mix_sql("i * 1000003 + yy.y * 4096 + xx.x * 4 + cc.c")
    return f"""
WITH imgs AS (
  SELECT i, {m['w']} AS w, {m['h']} AS h,
         CASE WHEN i % 3 = 0 THEN 'raw' ELSE 'png' END AS fmt
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {OTSU_N - 1})) AS i) t
  WHERE i % 3 <> 2),
hist AS (
  SELECT fmt, CAST(({px}) % 256 AS INT) AS v, COUNT(*) AS nv
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, h - 1)) AS y) yy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w - 1)) AS x) xx,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS c) cc
  GROUP BY 1, 2),
cum AS (
  SELECT fmt, v,
         SUM(nv) OVER (PARTITION BY fmt ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS wb,
         SUM(CAST(v AS BIGINT) * nv) OVER (PARTITION BY fmt ORDER BY v
                       ROWS UNBOUNDED PRECEDING) AS sb
  FROM hist),
tot AS (
  SELECT fmt, SUM(nv) AS n, SUM(CAST(v AS BIGINT) * nv) AS s
  FROM hist GROUP BY fmt),
scored AS (
  SELECT c.fmt, c.v, c.wb, t.n, {_OTSU_VAR} AS var_b
  FROM cum c JOIN tot t ON t.fmt = c.fmt WHERE c.wb < t.n),
r AS (
  SELECT fmt, v, var_b, wb, n,
         ROW_NUMBER() OVER (PARTITION BY fmt
                            ORDER BY var_b DESC, v ASC) AS rk
  FROM scored)
SELECT fmt, CAST(v AS INT) AS threshold, var_b,
       CAST(wb AS BIGINT) AS n_below, CAST(n AS BIGINT) AS n_pixels
FROM r WHERE rk = 1
"""


# --- image_rle_runs: run-length compressibility over real decoded bytes ----------
#
# The compressibility / smoothness QA pass of an image-curation pipeline:
# per image, the exact count of maximal constant RUNS in the row-major
# GREEN channel (runs = 1 + #{p : px(p) != px(p+1)}), aggregated per
# format with an image-index-weighted checksum that catches a permuted
# channel order or a transposed stack.  The kernel is one vectorized
# adjacent-difference over the shape-grouped decode stacks; the oracle
# re-derives every run boundary from the pixel formula on the linear
# index (y = p // w, x = p % w).  Compression ratio = n_px / runs is the
# single float division.

RLE_N = 24


def q_image_rle_runs(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, RLE_N, partitions=4).where(
        F.col("fmt") != "qb")
    r = multimodal.rle_run_counts(img)
    withi = r.selectExpr(
        "runs", "n_px",
        "CAST(substr(image_id, 4) AS BIGINT) AS i",
        "CASE WHEN CAST(substr(image_id, 4) AS BIGINT) % 3 = 0 "
        "THEN 'raw' ELSE 'png' END AS fmt")
    return (withi.groupBy("fmt")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("runs").alias("total_runs"),
                 F.sum("n_px").alias("total_px"),
                 F.expr("SUM(runs * (i + 11))").alias("checksum"))
            .selectExpr(
                "fmt", "CAST(n_images AS BIGINT) AS n_images",
                "CAST(total_runs AS BIGINT) AS total_runs",
                "CAST(total_px AS BIGINT) AS total_px",
                "ROUND(CAST(total_px AS DOUBLE) / total_runs, 6) AS ratio",
                "CAST(checksum AS BIGINT) AS checksum"))


def _oracle_rle() -> str:
    from .hashing import mix_sql
    m = fixtures.images_meta_sql("i")
    # green channel (c = 1) at linear index p and p+1 of the h*w raster
    pxp = mix_sql("i * 1000003 + CAST(FLOOR(pp.p / w) AS BIGINT) * 4096 "
                  "+ (pp.p % w) * 4 + 1")
    pxn = mix_sql("i * 1000003 + CAST(FLOOR((pp.p + 1) / w) AS BIGINT) "
                  "* 4096 + ((pp.p + 1) % w) * 4 + 1")
    return f"""
WITH imgs AS (
  SELECT i, {m['w']} AS w, {m['h']} AS h,
         CASE WHEN i % 3 = 0 THEN 'raw' ELSE 'png' END AS fmt
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {RLE_N - 1})) AS i) t
  WHERE i % 3 <> 2),
bounds AS (
  SELECT i, fmt, w * h AS n_px,
         1 + SUM(CASE WHEN ({pxp}) % 256 <> ({pxn}) % 256
                 THEN 1 ELSE 0 END) AS runs
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w * h - 2)) AS p) pp
  GROUP BY 1, 2, 3)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(runs) AS BIGINT) AS total_runs,
       CAST(SUM(n_px) AS BIGINT) AS total_px,
       ROUND(CAST(SUM(n_px) AS DOUBLE) / SUM(runs), 6) AS ratio,
       CAST(SUM(runs * (i + 11)) AS BIGINT) AS checksum
FROM bounds GROUP BY fmt
"""


# --- audio_zcr_windows: zero-crossing-rate windows over real WAV decode ----------
#
# The speech/music discrimination feature (and the silence detector's
# spectral sibling): per 256-sample window of each stream, the exact
# count of sign changes between ADJACENT samples inside the window
# (sign = s < 0, so the all-zero planted windows count 0 crossings).
# Streams reuse the audio_silence_windows fixture formula — samples are
# synthesized per executor task, encoded + decoded through the REAL
# RIFF/WAV walk, and reduced to exact int64s; the oracle replays the
# comparisons on the sample formula by lattice sums.  A window-index-
# weighted checksum pins WHERE the crossings are.

N_ZCR_WAV = 24


def q_audio_zcr_windows(spark, sf_dir, n_streams: int = N_ZCR_WAV,
                        partitions: int = 4):
    from . import riff

    schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("n_windows", T.LongType()),
        T.StructField("zc_total", T.LongType()),
        T.StructField("zc_checksum", T.LongType()),
    ])

    def work(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype(int):
                n = 1024 + (i * 256) % 1281
                k = np.arange(n, dtype=np.int64)
                u = (i * 48271 + k * 16807) % 65536
                env = (i * 31 + (k // 256) * 97) % 5
                s = ((u % 8192 - 4096) * env).astype(np.int16)
                wav, rate = riff.wav_decode(riff.wav_encode(s, 16000))
                got = np.round(wav[:, 0].astype(np.float64)
                               * 32768.0).astype(np.int64)
                assert rate == 16000 and len(got) == n
                nw = n // 256
                wm = got[:nw * 256].reshape(nw, 256)
                neg = wm < 0
                zc = (neg[:, 1:] != neg[:, :-1]).sum(axis=1)
                wi = np.arange(nw, dtype=np.int64)
                rows.append((f"wav{i:03d}", nw, int(zc.sum()),
                             int((zc * (wi + 3)).sum())))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return (spark.range(0, n_streams, numPartitions=partitions)
            .mapInPandas(work, schema))


def _oracle_zcr() -> str:
    def samp(k: str) -> str:
        return (f"((((i * 48271 + ({k}) * 16807) % 65536) % 8192 - 4096) * "
                f"((i * 31 + CAST(FLOOR(({k}) / 256.0) AS BIGINT) * 97) "
                f"% 5))")
    return f"""
WITH ids AS (
  SELECT i, 1024 + (i * 256) % 1281 AS n
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {N_ZCR_WAV - 1})) AS i) t),
cross_pts AS (
  SELECT i, CAST(FLOOR(k / 256.0) AS BIGINT) AS wnd,
         CASE WHEN ({samp('k')} < 0) <> ({samp('k + 1')} < 0)
              THEN 1 ELSE 0 END AS zc
  FROM ids, GENERATE_SERIES(0, 2400) g(k)
  WHERE k < CAST(FLOOR(n / 256.0) AS BIGINT) * 256 - 1
    AND k % 256 < 255),
wind AS (SELECT i, wnd, SUM(zc) AS zc FROM cross_pts GROUP BY 1, 2),
per AS (
  SELECT i, COUNT(*) AS n_windows, SUM(zc) AS zc_total,
         SUM(zc * (wnd + 3)) AS zc_checksum
  FROM wind GROUP BY 1)
SELECT printf('wav%03d', i) AS media_id,
       CAST(n_windows AS BIGINT) AS n_windows,
       CAST(zc_total AS BIGINT) AS zc_total,
       CAST(zc_checksum AS BIGINT) AS zc_checksum
FROM per
"""


# --- bpe_learn_merges: the iterative BPE merge-learning loop ----------------------
#
# The actual tokenizer-TRAINING iteration (bpe_pair_counts covered one
# histogram pass; this is the loop): for BPE_ROUNDS rounds, count
# adjacent token pairs over the whole corpus, pick the most frequent
# pair (count DESC, then lexical — a total order), and MERGE it
# corpus-wide with the left-to-right greedy non-overlap semantics a real
# tokenizer applies (derived relationally: consecutive match positions
# form islands, odd island-ranks win — the phrase_pmi greedy law, here
# driving a REWRITE instead of a count).  Each round is one doc-keyed
# window pass + bounded broadcast joins; the working set shrinks
# monotonically; localCheckpoint keeps the plan O(1) deep and NOTHING
# data-proportional ever reaches the driver (the round's top pair stays
# a 1-row broadcast DataFrame).  The oracle unrolls the same three
# rounds as MATERIALIZED CTE chains (plain CTEs re-execute per
# reference — the strahler/cost_distance lesson).  Real trainers fold
# the corpus to a word histogram first (bpe_pair_counts) and iterate on
# that; this op keeps the corpus-rewrite form because the REWRITE is the
# part Spark has to get right at scale.
#
# Output: one row per round — the learned merge (lhs, rhs), its raw
# adjacent-pair count at selection time, and the corpus token count
# after applying it.  All exact integers.

BPE_ROUNDS = 3


def _bpe_round(rows: DataFrame) -> tuple:
    """One BPE round over (doc_id, pos, t) rows: returns (top1, new_rows)
    where top1 is a 1-row DF (p, q, cnt) and new_rows the rewritten
    corpus."""
    wd = W.partitionBy("doc_id").orderBy("pos")
    pairs = rows.withColumn("nxt", F.lead("t").over(wd))
    top = (pairs.where("nxt IS NOT NULL")
           .groupBy("t", "nxt").agg(F.count(F.lit(1)).alias("cnt"))
           .orderBy(F.desc("cnt"), "t", "nxt").limit(1)
           .selectExpr("t AS p", "nxt AS q", "cnt")
           .localCheckpoint())
    m = (pairs.crossJoin(F.broadcast(top))
         .where("t = p AND nxt = q").select("doc_id", "pos"))
    m = m.withColumn("rn", F.row_number().over(wd)) \
         .withColumn("grp", F.expr("pos - rn"))
    wg = W.partitionBy("doc_id", "grp").orderBy("pos")
    kept = (m.withColumn("ri", F.row_number().over(wg))
            .where("ri % 2 = 1").select("doc_id", "pos"))
    k = kept.selectExpr("doc_id AS kd", "pos AS kp")
    d = kept.selectExpr("doc_id AS dd", "pos + 1 AS dp")
    new = (rows.crossJoin(F.broadcast(top))
           .join(k, (F.col("doc_id") == F.col("kd"))
                 & (F.col("pos") == F.col("kp")), "left")
           .join(d, (F.col("doc_id") == F.col("dd"))
                 & (F.col("pos") == F.col("dp")), "left_anti")
           .selectExpr("doc_id", "pos",
                       "CASE WHEN kp IS NOT NULL THEN concat(p, '_', q) "
                       "ELSE t END AS t")
           .localCheckpoint())
    return top, new


def q_bpe_learn_merges(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rows = (d.select("doc_id", F.posexplode(F.split("text", " "))
                     .alias("pos", "t"))
            .localCheckpoint())
    out = None
    for r in range(1, BPE_ROUNDS + 1):
        top, rows = _bpe_round(rows)
        stat = rows.groupBy().agg(F.count(F.lit(1)).alias("ta"))
        rec = (top.crossJoin(stat)
               .selectExpr(f"CAST({r} AS INT) AS round", "p AS lhs",
                           "q AS rhs", "CAST(cnt AS BIGINT) AS pair_count",
                           "CAST(ta AS BIGINT) AS tokens_after"))
        out = rec if out is None else out.unionByName(rec)
    return out


def _oracle_bpe() -> str:
    rounds = []
    for r in range(1, BPE_ROUNDS + 1):
        prev = f"r{r - 1}"
        rounds.append(f"""
p{r} AS MATERIALIZED (
  SELECT doc_id, pos, t,
         LEAD(t) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM {prev}),
t{r} AS MATERIALIZED (
  SELECT t AS p, nxt AS q, COUNT(*) AS cnt
  FROM p{r} WHERE nxt IS NOT NULL
  GROUP BY 1, 2 ORDER BY cnt DESC, p, q LIMIT 1),
m{r} AS MATERIALIZED (
  SELECT pr.doc_id, pr.pos,
         ROW_NUMBER() OVER (PARTITION BY pr.doc_id ORDER BY pr.pos) AS rn
  FROM p{r} pr, t{r}
  WHERE pr.t = t{r}.p AND pr.nxt = t{r}.q),
k{r} AS MATERIALIZED (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY doc_id, pos - rn
                              ORDER BY pos) AS ri
    FROM m{r}) s WHERE ri % 2 = 1),
r{r} AS MATERIALIZED (
  SELECT rr.doc_id, rr.pos,
         CASE WHEN k.pos IS NOT NULL THEN t{r}.p || '_' || t{r}.q
              ELSE rr.t END AS t
  FROM {prev} rr
  LEFT JOIN k{r} k ON k.doc_id = rr.doc_id AND k.pos = rr.pos
  CROSS JOIN t{r}
  WHERE NOT EXISTS (SELECT 1 FROM k{r} dd
                    WHERE dd.doc_id = rr.doc_id
                      AND dd.pos = rr.pos - 1))""")
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS round, p AS lhs, q AS rhs, "
        f"CAST(cnt AS BIGINT) AS pair_count, "
        f"CAST((SELECT COUNT(*) FROM r{r}) AS BIGINT) AS tokens_after "
        f"FROM t{r}" for r in range(1, BPE_ROUNDS + 1))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
r0 AS MATERIALIZED (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, ts[u.i] AS t
  FROM toks, UNNEST(range(1, len(ts) + 1)) AS u(i)),
{','.join(rounds)}
{selects}
"""


# --- image_entropy: per-image Shannon entropy from the exact histogram -----------
#
# The information-theoretic compressibility bound (RLE's sibling — RLE
# measures run structure, H measures the source-coding floor): per image
# H = −Σ p_v ln p_v over the 256-value histogram of REAL decoded bytes.
# p ln p is irrational, so each bucket's term is QUANTIZED to 1e-8 nats
# (FLOOR(x·1e8 + 0.5), the half-up rule) BEFORE the variable-cardinality
# sum — the RA-index trick — making entropy_q an exact int64 at any
# aggregation order; a 1-ulp JVM-vs-libm LN difference moves the
# pre-floor value by ≤ ~1e-8, so a floor flip needs a ~1e-8-wide
# coincidence per bucket (~6k buckets here — negligible, and the gate
# would catch it loudly).  Mean bits/value renders in one literal.

ENT_N = 24
ENT_Q = 100_000_000  # 1e-8-nat quantization of each p·ln p term

_ENT_TERM = (f"CAST(FLOOR((CAST(n_px AS DOUBLE) / n) "
             f"* LN(CAST(n_px AS DOUBLE) / n) * {float(ENT_Q)!r} + 0.5) "
             "AS BIGINT)")


def q_image_entropy(spark, sf_dir):
    from . import multimodal
    img = fixtures.images_df(spark, ENT_N, partitions=4).where(
        F.col("fmt") != "qb")
    h = (multimodal.histogram_checksums(img, buckets=256)
         .where("n_px > 0"))
    tot = h.groupBy("image_id").agg(F.sum("n_px").alias("n"))
    per = (h.join(tot, "image_id")
           .selectExpr("image_id", f"{_ENT_TERM} AS t")
           .groupBy("image_id").agg((-F.sum("t")).alias("entropy_q")))
    withi = per.selectExpr(
        "entropy_q",
        "CAST(substr(image_id, 4) AS BIGINT) AS i",
        "CASE WHEN CAST(substr(image_id, 4) AS BIGINT) % 3 = 0 "
        "THEN 'raw' ELSE 'png' END AS fmt")
    return (withi.groupBy("fmt")
            .agg(F.count(F.lit(1)).alias("n_images"),
                 F.sum("entropy_q").alias("sum_q"),
                 F.min("entropy_q").alias("min_q"),
                 F.max("entropy_q").alias("max_q"),
                 F.expr("SUM(entropy_q * (i + 13))").alias("checksum"))
            .selectExpr(
                "fmt", "CAST(n_images AS BIGINT) AS n_images",
                "CAST(sum_q AS BIGINT) AS sum_q",
                "CAST(min_q AS BIGINT) AS min_q",
                "CAST(max_q AS BIGINT) AS max_q",
                f"ROUND(CAST(sum_q AS DOUBLE) / n_images / {float(ENT_Q)!r}"
                " / LN(CAST(2 AS DOUBLE)), 6) AS mean_bits",
                "CAST(checksum AS BIGINT) AS checksum"))


def _oracle_entropy() -> str:
    from .hashing import mix_sql
    m = fixtures.images_meta_sql("i")
    px = mix_sql("i * 1000003 + yy.y * 4096 + xx.x * 4 + cc.c")
    return f"""
WITH imgs AS (
  SELECT i, {m['w']} AS w, {m['h']} AS h,
         CASE WHEN i % 3 = 0 THEN 'raw' ELSE 'png' END AS fmt
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {ENT_N - 1})) AS i) t
  WHERE i % 3 <> 2),
hist AS (
  SELECT i, fmt, ({px}) % 256 AS v, COUNT(*) AS n_px
  FROM imgs,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, h - 1)) AS y) yy,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, w - 1)) AS x) xx,
  LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 2)) AS c) cc
  GROUP BY 1, 2, 3),
tot AS (SELECT i, SUM(n_px) AS n FROM hist GROUP BY i),
per AS (
  SELECT h.i, h.fmt, -SUM({_ENT_TERM}) AS entropy_q
  FROM hist h JOIN tot ON tot.i = h.i GROUP BY 1, 2)
SELECT fmt, CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(entropy_q) AS BIGINT) AS sum_q,
       CAST(MIN(entropy_q) AS BIGINT) AS min_q,
       CAST(MAX(entropy_q) AS BIGINT) AS max_q,
       ROUND(CAST(SUM(entropy_q) AS DOUBLE) / COUNT(*) / {float(ENT_Q)!r}
             / LN(CAST(2 AS DOUBLE)), 6) AS mean_bits,
       CAST(SUM(entropy_q * (i + 13)) AS BIGINT) AS checksum
FROM per GROUP BY fmt
"""


# --- range_frame_smoothing: RANGE-frame moving window (C7 frame coverage) ---------
#
# The C7 window-frame type the suite didn't yet exercise: a VALUE-based
# RANGE frame (RANGE BETWEEN 2 PRECEDING AND CURRENT ROW over the hour
# NUMBER), which — unlike a ROWS frame — spans value gaps: an hour with
# no events still weighs on its successors' 3-hour window.  Hourly
# event counts are exact ints, so the moving sums hash exactly; the
# per-type hour series is bounded by the time span, never the corpus.

def q_range_frame_smoothing(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hourly = (e.selectExpr(
        "event_type",
        "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) "
        "/ 3600000000.0) AS BIGINT) AS h")
        .groupBy("event_type", "h").agg(F.count(F.lit(1)).alias("n")))
    return hourly.selectExpr(
        "event_type", "h", "n",
        "CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY h "
        "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum3h",
        "CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY h "
        "RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n3h")


ORACLE_RANGE_FRAME = """
WITH hourly AS (
  SELECT event_type,
         CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2)
SELECT event_type, h, CAST(n AS BIGINT) AS n,
       CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY h
            RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum3h,
       CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY h
            RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS n3h
FROM hourly
"""


# --- geodesic_area: spherical-excess polygon area over the fence layer -----------
#
# Geodesic (on-the-sphere) polygon area — the planar shoelace
# (polygon_metrics) is wrong by cos(lat) away from the equator; this is
# the turf.js / PostGIS-geography formula: per directed edge,
# term = Δλ_rad · (2 + sin φ1 + sin φ2), area = |Σ term| · R²/2.  The
# sin terms are irrational, so each EDGE term quantizes to an exact
# int64 (×1e9 half-up) before the variable-cardinality per-polygon sum;
# holes (CCW) cancel against outers (CW) by sign, parts add.  The
# quantum is 1e-9 sr (~0.02 km²) — chosen so a 1-ulp JVM-vs-libm SIN
# difference moves the pre-floor value by ~2e-8, far from a floor flip
# (at 1e15 the flip window would be ~2%/edge — measured reasoning, not
# luck).  The fence layer is bounded (the ≤4096-row layer allowance);
# at scale the edge table shards by poly_id.

GEO_R_KM = 6371.0088  # IUGG mean Earth radius

_GEO_TERM = ("CAST(FLOOR(RADIANS(x2 - x1) * (CAST(2 AS DOUBLE) "
             "+ SIN(RADIANS(y1)) + SIN(RADIANS(y2))) "
             "* 1000000000.0 + 0.5) AS BIGINT)")
_GEO_AREA = (f"ROUND(ABS(CAST(area_q AS DOUBLE)) / 1000000000.0 "
             f"* {GEO_R_KM!r} * {GEO_R_KM!r} / 2.0, 6)")


def q_geodesic_area(spark, sf_dir):
    import pandas as _pd
    e = fixtures.fence_edges(64)
    edges = spark.createDataFrame(_pd.DataFrame(
        e, columns=["poly_id", "x1", "y1", "x2", "y2"]))
    per = (edges.selectExpr("CAST(poly_id AS INT) AS poly_id",
                            f"{_GEO_TERM} AS t")
           .groupBy("poly_id")
           .agg(F.count(F.lit(1)).alias("n_edges"),
                F.sum("t").alias("area_q")))
    return per.selectExpr(
        "poly_id", "CAST(n_edges AS BIGINT) AS n_edges",
        "CAST(area_q AS BIGINT) AS area_q",
        f"{_GEO_AREA} AS area_km2")


def _oracle_geodesic() -> str:
    from .queries_spatial import _fence_edges_values_sql
    return f"""
WITH fe AS (
  SELECT CAST(poly_id AS INT) AS poly_id, CAST(x1 AS DOUBLE) AS x1,
         CAST(y1 AS DOUBLE) AS y1, CAST(x2 AS DOUBLE) AS x2,
         CAST(y2 AS DOUBLE) AS y2
  FROM {_fence_edges_values_sql(64)} v),
per AS (
  SELECT poly_id, COUNT(*) AS n_edges, SUM({_GEO_TERM}) AS area_q
  FROM fe GROUP BY poly_id)
SELECT poly_id, CAST(n_edges AS BIGINT) AS n_edges,
       CAST(area_q AS BIGINT) AS area_q,
       {_GEO_AREA} AS area_km2
FROM per
"""


# --- audio_spectral_peak: quantized DFT-bin energy over real WAV decode ----------
#
# The frequency-domain sibling of ZCR (tone/voicing detection — what a
# real pipeline computes with an FFT): per 256-sample window, the DFT
# energy |Σ s_k e^{-iωk}|² at five candidate bins, with the argmax bin
# recovered and checked against the stream's PLANTED tone.  Streams are
# pure integer-rounded sinusoids at bin b_i = 4 + (i%5)·2, synthesized
# per executor task and pushed through the REAL RIFF/WAV encode+decode
# walk (int16 PCM roundtrips bit-exactly, asserted in-kernel).
#
# Determinism: the DFT correlations quantize EACH s_k·cos(ωk') term to
# exact int64 (×1e3 half-up — a multi-ulp numpy-vs-libm trig difference
# moves a term by ~2.4e-9, so ~245k floor windows stay ~1e-9 from any
# flip); window energy composes the exact ints in ONE shared literal
# (cr·cr + ci·ci in DOUBLE — deterministic even past 2^53 because both
# engines run the identical op sequence), then re-quantizes by a 2^24
# floor so per-stream totals sum exactly.

N_SPEC_WAV = 24
SPEC_N = 2048                    # 8 windows of 256
SPEC_BINS = (4, 6, 8, 10, 12)
SPEC_C = 2.0 * 3.141592653589793 / 256.0  # 2π/256, folded
SPEC_AMP = 12000.0
SPEC_QT = 1000.0                 # per-term quantization
SPEC_QE = 16777216.0             # 2^24 energy re-quantization


def _spec_bin(i: int) -> int:
    return 4 + (i % 5) * 2


def q_audio_spectral_peak(spark, sf_dir):
    from . import riff

    schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("planted_bin", T.IntegerType()),
        T.StructField("peak_bin", T.IntegerType()),
        T.StructField("is_match", T.IntegerType()),
        T.StructField("eq_planted", T.LongType()),
        T.StructField("eq_total", T.LongType()),
    ])
    kp = np.arange(256, dtype=np.float64)

    def work(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype(int):
                b = _spec_bin(i)
                k = np.arange(SPEC_N, dtype=np.float64)
                s = np.floor(SPEC_AMP * np.sin(SPEC_C * b * k)
                             + 0.5).astype(np.int16)
                wav, rate = riff.wav_decode(riff.wav_encode(s, 16000))
                got = np.round(wav[:, 0].astype(np.float64)
                               * 32768.0).astype(np.int64)
                assert rate == 16000 and np.array_equal(got, s)
                w = got.reshape(8, 256).astype(np.float64)
                teq = {}
                for cb in SPEC_BINS:
                    cr = np.floor(w * np.cos(SPEC_C * cb * kp)[None, :]
                                  * SPEC_QT + 0.5).sum(axis=1)
                    ci = np.floor(w * np.sin(SPEC_C * cb * kp)[None, :]
                                  * SPEC_QT + 0.5).sum(axis=1)
                    e = cr * cr + ci * ci
                    teq[cb] = int(np.floor(e / SPEC_QE)
                                  .astype(np.int64).sum())
                peak = max(SPEC_BINS, key=lambda c: (teq[c], -c))
                rows.append((f"wav{i:03d}", b, peak, int(peak == b),
                             teq[b], sum(teq.values())))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return (spark.range(0, N_SPEC_WAV, numPartitions=4)
            .mapInPandas(work, schema))


def _oracle_spectral() -> str:
    s = (f"FLOOR({SPEC_AMP!r} * SIN({SPEC_C!r} * b * k) + 0.5)")
    return f"""
WITH ids AS (
  SELECT i, 4 + (i % 5) * 2 AS b
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {N_SPEC_WAV - 1})) AS i) t),
samp AS (
  SELECT i, b, CAST(FLOOR(k / 256.0) AS BIGINT) AS wnd, k % 256 AS kp,
         {s} AS s
  FROM ids, GENERATE_SERIES(0, {SPEC_N - 1}) g(k)),
corr AS (
  SELECT i, b, cb.cb, wnd,
         SUM(FLOOR(s * COS({SPEC_C!r} * cb.cb * kp) * {SPEC_QT!r} + 0.5))
           AS cr,
         SUM(FLOOR(s * SIN({SPEC_C!r} * cb.cb * kp) * {SPEC_QT!r} + 0.5))
           AS ci
  FROM samp, (VALUES (4), (6), (8), (10), (12)) AS cb(cb)
  GROUP BY 1, 2, 3, 4),
wind AS (
  SELECT i, b, cb,
         CAST(FLOOR((CAST(cr AS DOUBLE) * cr + CAST(ci AS DOUBLE) * ci)
                    / {SPEC_QE!r}) AS BIGINT) AS eq
  FROM corr),
tot AS (SELECT i, b, cb, SUM(eq) AS teq FROM wind GROUP BY 1, 2, 3),
pk AS (
  SELECT i, b, cb, teq,
         ROW_NUMBER() OVER (PARTITION BY i ORDER BY teq DESC, cb ASC)
           AS rk
  FROM tot)
SELECT printf('wav%03d', p.i) AS media_id,
       CAST(p.b AS INT) AS planted_bin,
       CAST(p.cb AS INT) AS peak_bin,
       CAST(CASE WHEN p.cb = p.b THEN 1 ELSE 0 END AS INT) AS is_match,
       CAST(tp.teq AS BIGINT) AS eq_planted,
       CAST((SELECT SUM(teq) FROM tot t2 WHERE t2.i = p.i) AS BIGINT)
         AS eq_total
FROM pk p JOIN tot tp ON tp.i = p.i AND tp.cb = p.b
WHERE p.rk = 1
"""


# --- fellegi_sunter: probabilistic record-linkage scoring -------------------------
#
# Completes the entity-resolution pipeline (soundex_blocking generates
# candidates, dedup_editdist verifies strings — this SCORES): the
# Fellegi–Sunter match weight Σ_f log2(m_f/u_f) over per-field
# agreement patterns.  u_f (P(agree | random pair)) is estimated
# EXACTLY from the corpus as Σ_v n_v(n_v−1) / N(N−1) — two int64
# aggregates per field, never a float sum; m_f are declared constants
# (the EM-free variant real pipelines start from).  Three FIXED fields
# (lang, source, length bucket) mean the pair score composes exactly
# six agreement-conditional terms in ONE literal float expression —
# the BM25 slot rule again.  Pairs come from first-token blocking
# (vocabulary-bounded block count; never corpus²).

FS_TOPK = 20
FS_M = (0.95, 0.9, 0.8)  # declared m-probabilities: lang, source, lenb


def _fs_weight(field: str, m: float) -> str:
    # agree → log2(m/u); disagree → log2((1−m)/(1−u)); u = un/ud exactly
    u = f"(CAST(un_{field} AS DOUBLE) / ud)"
    return (f"(CASE WHEN {field}_a = {field}_b "
            f"THEN LN(CAST({m!r} AS DOUBLE) / {u}) "
            f"ELSE LN(CAST({1.0 - m!r} AS DOUBLE) / "
            f"(CAST(1 AS DOUBLE) - {u})) END / LN(CAST(2 AS DOUBLE)))")


FS_SCORE = ("ROUND(" + " + ".join(
    _fs_weight(f, m) for f, m in zip(("lang", "source", "lenb"), FS_M))
    + ", 6) AS score")


def _fs_fields(tbl: str) -> str:
    return (f"SELECT doc_id, lang, source, "
            f"CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS lenb, "
            f"split_part(text, ' ', 1) AS blk FROM {tbl}")


def q_fellegi_sunter(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("fs_documents")
    recs = spark.sql(_fs_fields("fs_documents"))
    # u numerators: Σ n_v(n_v−1) per field, denominator N(N−1)
    parts = []
    for f_ in ("lang", "source", "lenb"):
        parts.append(
            recs.groupBy(f_).agg(F.count(F.lit(1)).alias("c"))
            .agg(F.expr("SUM(c * (c - 1))").alias(f"un_{f_}")))
    nrow = recs.agg(F.expr("COUNT(*) * (COUNT(*) - 1)").alias("ud"))
    u = parts[0].crossJoin(parts[1]).crossJoin(parts[2]).crossJoin(nrow)
    a = recs.selectExpr("doc_id AS ida", "lang AS lang_a",
                        "source AS source_a", "lenb AS lenb_a", "blk")
    b = recs.selectExpr("doc_id AS idb", "lang AS lang_b",
                        "source AS source_b", "lenb AS lenb_b", "blk")
    pairs = a.join(b, "blk").where("ida < idb")
    scored = (pairs.crossJoin(F.broadcast(u))
              .selectExpr("ida", "idb", FS_SCORE,
                          "CAST(CASE WHEN lang_a = lang_b THEN 1 ELSE 0 "
                          "END * 4 + CASE WHEN source_a = source_b THEN "
                          "1 ELSE 0 END * 2 + CASE WHEN lenb_a = lenb_b "
                          "THEN 1 ELSE 0 END AS INT) AS pattern"))
    return (scored.orderBy(F.desc("score"), "ida", "idb").limit(FS_TOPK)
            .selectExpr("CAST(ida AS BIGINT) AS ida",
                        "CAST(idb AS BIGINT) AS idb", "pattern", "score"))


def _oracle_fs() -> str:
    return f"""
WITH recs AS ({_fs_fields('documents')}),
u AS (
  SELECT
    (SELECT SUM(c * (c - 1)) FROM (SELECT COUNT(*) AS c FROM recs
     GROUP BY lang) t) AS un_lang,
    (SELECT SUM(c * (c - 1)) FROM (SELECT COUNT(*) AS c FROM recs
     GROUP BY source) t) AS un_source,
    (SELECT SUM(c * (c - 1)) FROM (SELECT COUNT(*) AS c FROM recs
     GROUP BY lenb) t) AS un_lenb,
    (SELECT COUNT(*) * (COUNT(*) - 1) FROM recs) AS ud),
pairs AS (
  SELECT a.doc_id AS ida, b.doc_id AS idb,
         a.lang AS lang_a, b.lang AS lang_b,
         a.source AS source_a, b.source AS source_b,
         a.lenb AS lenb_a, b.lenb AS lenb_b
  FROM recs a JOIN recs b ON a.blk = b.blk AND a.doc_id < b.doc_id),
scored AS (
  SELECT ida, idb, {FS_SCORE},
         CAST(CASE WHEN lang_a = lang_b THEN 1 ELSE 0 END * 4
            + CASE WHEN source_a = source_b THEN 1 ELSE 0 END * 2
            + CASE WHEN lenb_a = lenb_b THEN 1 ELSE 0 END AS INT)
           AS pattern
  FROM pairs CROSS JOIN u)
SELECT CAST(ida AS BIGINT) AS ida, CAST(idb AS BIGINT) AS idb,
       pattern, score
FROM scored ORDER BY score DESC, ida, idb LIMIT {FS_TOPK}
"""


# --- lm_heldout_perplexity: the LM-quality EVAL loop -------------------------------
#
# lm_bigram_score rates documents under the full corpus's own LM; this
# is the held-out EVALUATION real pipelines run: hash-split 80/20,
# train add-one-smoothed bigram counts on the 80%, score the 20%'s
# bigrams, report corpus perplexity.  p(w2|w1) = (c12+1)/(c1+V) is an
# exact integer ratio; each held-out bigram's ln p quantizes to 1e-8
# nats (the entropy-op rule) so the NLL total is an exact int64 at any
# aggregation order; PPL = exp(NLL/n) renders in one literal.
# Unseen-context and unseen-word bigrams flow through add-one naturally
# (c12 = 0, c1 = 0).  One token-keyed shuffle for train counts, one
# bigram-keyed left join for scoring.

LM_Q = 100_000_000  # 1e-8-nat quantization


def q_lm_heldout_perplexity(spark, sf_dir):
    from .hashing import mix_sql
    d = _t(spark, sf_dir, "documents")
    split = d.selectExpr(
        "doc_id", "split(text, ' ') AS ts",
        f"CAST(({mix_sql('doc_id * 13 + 11')}) % 5 = 0 AS INT) AS heldout")
    big = split.selectExpr(
        "doc_id", "heldout",
        "explode(zip_with(slice(ts, 1, size(ts) - 1), "
        "slice(ts, 2, size(ts) - 1), (x, y) -> struct(x AS w1, y AS w2)))"
        " AS bg").selectExpr("doc_id", "heldout", "bg.w1", "bg.w2")
    tr = big.where("heldout = 0")
    c12 = tr.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c1 = tr.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = tr.select(F.expr("COUNT(DISTINCT w2)").alias("v"))
    te = (big.where("heldout = 1")
          .join(c12, ["w1", "w2"], "left")
          .join(c1, ["w1"], "left")
          .crossJoin(F.broadcast(vocab))
          .selectExpr(
              "CAST(FLOOR(LN((COALESCE(c12, 0) + CAST(1 AS DOUBLE)) "
              f"/ (COALESCE(c1, 0) + v)) * {float(LM_Q)!r} + 0.5) "
              "AS BIGINT) AS lq"))
    return (te.groupBy()
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 (-F.sum("lq")).alias("nll_q"))
            .crossJoin(F.broadcast(vocab))
            .selectExpr(
                "CAST(n_bigrams AS BIGINT) AS n_bigrams",
                "CAST(nll_q AS BIGINT) AS nll_q",
                "CAST(v AS BIGINT) AS vocab",
                f"ROUND(EXP(CAST(nll_q AS DOUBLE) / n_bigrams "
                f"/ {float(LM_Q)!r}), 6) AS perplexity"))


def _oracle_lm_heldout() -> str:
    from .hashing import mix_sql
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts,
         CAST(({mix_sql('doc_id * 13 + 11')}) % 5 = 0 AS INT) AS heldout
  FROM documents),
big AS (
  SELECT doc_id, heldout, ts[u.i] AS w1, ts[u.i + 1] AS w2
  FROM toks, UNNEST(range(1, len(ts))) AS u(i)),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM big WHERE heldout = 0
        GROUP BY 1, 2),
c1 AS (SELECT w1, COUNT(*) AS c1 FROM big WHERE heldout = 0 GROUP BY 1),
vocab AS (SELECT COUNT(DISTINCT w2) AS v FROM big WHERE heldout = 0),
te AS (
  SELECT CAST(FLOOR(LN((COALESCE(c12.c12, 0) + CAST(1 AS DOUBLE))
              / (COALESCE(c1.c1, 0) + vocab.v)) * {float(LM_Q)!r} + 0.5)
         AS BIGINT) AS lq
  FROM big LEFT JOIN c12 ON c12.w1 = big.w1 AND c12.w2 = big.w2
  LEFT JOIN c1 ON c1.w1 = big.w1
  CROSS JOIN vocab
  WHERE big.heldout = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(-SUM(lq) AS BIGINT) AS nll_q,
       CAST((SELECT v FROM vocab) AS BIGINT) AS vocab,
       ROUND(EXP(CAST(-SUM(lq) AS DOUBLE) / COUNT(*) / {float(LM_Q)!r}),
             6) AS perplexity
FROM te
"""


# --- rank_correlation: Spearman ρ + Kendall τ between two hourly series ----------
#
# The nonparametric correlation pair (mann_kendall is Kendall-vs-TIME;
# this correlates TWO series): view vs click hourly counts over the
# hours where EITHER type fired (the common support — hours with neither
# carry no signal for either series; documented restriction, and at any
# realistic density every hour is occupied anyway).  Ranks are made a
# PERMUTATION by an hour tiebreak — documented tie semantics that keep
# Σd² an exact integer and let Spearman use the exact 1 − 6Σd²/(n³−n)
# form; Kendall's S is an exact pair-sign sum via a self-join over the
# span-bounded hourly aggregate (never the fact table — the mann_kendall
# rule).  Both coefficients render in one literal each.

RC_A, RC_B = "view", "click"


def q_rank_correlation(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    hourly = (e.where(F.col("event_type").isin(RC_A, RC_B))
              .selectExpr(
                  "event_type",
                  "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) "
                  "/ 3600000000.0) AS BIGINT) AS h")
              .groupBy("h").agg(
                  F.sum(F.expr(
                      f"CASE WHEN event_type = '{RC_A}' THEN 1 ELSE 0 END"
                  )).alias("xa"),
                  F.sum(F.expr(
                      f"CASE WHEN event_type = '{RC_B}' THEN 1 ELSE 0 END"
                  )).alias("xb")))
    wa = W.orderBy("xa", "h")
    wb = W.orderBy("xb", "h")
    ranked = (hourly.withColumn("ra", F.row_number().over(wa))
              .withColumn("rb", F.row_number().over(wb)))
    d2 = ranked.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("SUM(CAST(ra - rb AS BIGINT) * (ra - rb))").alias("sd2"))
    pairs = (ranked.selectExpr("h AS h1", "xa AS a1", "xb AS b1")
             .join(ranked.selectExpr("h AS h2", "xa AS a2", "xb AS b2"),
                   F.expr("h1 < h2"))
             .groupBy().agg(F.expr(
                 "SUM(CAST(SIGN(a2 - a1) * SIGN(b2 - b1) AS BIGINT))")
                 .alias("s")))
    return (d2.crossJoin(pairs).selectExpr(
        "CAST(n AS BIGINT) AS n_hours",
        "CAST(sd2 AS BIGINT) AS sum_d2",
        "CAST(s AS BIGINT) AS s_kendall",
        "ROUND(CAST(1 AS DOUBLE) - 6.0 * sd2 "
        "/ (CAST(n AS DOUBLE) * n * n - n), 6) AS spearman_rho",
        "ROUND(CAST(s AS DOUBLE) * 2.0 / (CAST(n AS DOUBLE) * (n - 1)), 6)"
        " AS kendall_tau"))


ORACLE_RANK_CORR = f"""
WITH hourly AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) AS h,
         SUM(CASE WHEN event_type = '{RC_A}' THEN 1 ELSE 0 END) AS xa,
         SUM(CASE WHEN event_type = '{RC_B}' THEN 1 ELSE 0 END) AS xb
  FROM events WHERE event_type IN ('{RC_A}', '{RC_B}')
  GROUP BY 1),
ranked AS (
  SELECT h, xa, xb,
         ROW_NUMBER() OVER (ORDER BY xa, h) AS ra,
         ROW_NUMBER() OVER (ORDER BY xb, h) AS rb
  FROM hourly),
d2 AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ra - rb AS BIGINT) * (ra - rb)) AS sd2
  FROM ranked),
pairs AS (
  SELECT SUM(CAST(SIGN(p2.xa - p1.xa) * SIGN(p2.xb - p1.xb) AS BIGINT))
           AS s
  FROM ranked p1 JOIN ranked p2 ON p1.h < p2.h)
SELECT CAST(n AS BIGINT) AS n_hours, CAST(sd2 AS BIGINT) AS sum_d2,
       CAST(s AS BIGINT) AS s_kendall,
       ROUND(CAST(1 AS DOUBLE) - 6.0 * sd2
             / (CAST(n AS DOUBLE) * n * n - n), 6) AS spearman_rho,
       ROUND(CAST(s AS DOUBLE) * 2.0 / (CAST(n AS DOUBLE) * (n - 1)), 6)
         AS kendall_tau
FROM d2 CROSS JOIN pairs
"""


QUERIES: dict = {
    "bm25_search": (q_bm25_search, _oracle_bm25()),
    "bpe_learn_merges": (q_bpe_learn_merges, _oracle_bpe()),
    "image_entropy": (q_image_entropy, _oracle_entropy()),
    "range_frame_smoothing": (q_range_frame_smoothing, ORACLE_RANGE_FRAME),
    "geodesic_area": (q_geodesic_area, _oracle_geodesic()),
    "audio_spectral_peak": (q_audio_spectral_peak, _oracle_spectral()),
    "fellegi_sunter": (q_fellegi_sunter, _oracle_fs()),
    "lm_heldout_perplexity": (q_lm_heldout_perplexity, _oracle_lm_heldout()),
    "rank_correlation": (q_rank_correlation, ORACLE_RANK_CORR),
    "grouping_sets_sales": (q_grouping_sets_sales, ORACLE_GROUPING_SETS),
    "link_prediction": (q_link_prediction, ORACLE_LINK_PRED),
    "image_otsu_threshold": (q_image_otsu_threshold, _oracle_otsu()),
    "image_rle_runs": (q_image_rle_runs, _oracle_rle()),
    "audio_zcr_windows": (q_audio_zcr_windows, _oracle_zcr()),
}


# --- trimmed_mean: exact 10%-trimmed robust mean, two-phase rank sums -------------
#
# Robust location estimation (MAD and Tukey fences exist; this is the
# trimmed-mean member of the family) — and a deliberate application of
# the outlier_audit scale lesson: a per-group rank window serializes
# each group into one task, so BOTH rank boundaries come from the
# two-phase histogram (bucket counts + bucket SUMS, cumulative over the
# tiny aggregate, exact in-bucket partial sums at the boundary value).
# S(r) = Σ of the r smallest cents is exact int64; the trimmed sum is
# S(n−k) − S(k) with k = ⌊n/10⌋, identical to the rank-window
# definition because ties share a cent value (any tiebreak yields the
# same trimmed multiset — documented).  The oracle IS the naive
# rank-window spec.

TM_BUCKET = 16384.0


def _smallest_r_sums(o: DataFrame, targets: DataFrame) -> DataFrame:
    """S(r) per (grp, which): exact sum of the r smallest cents."""
    h = (o.selectExpr("grp", f"CAST(FLOOR(cents / {TM_BUCKET!r}) AS BIGINT)"
                      " AS bucket", "cents")
         .groupBy("grp", "bucket")
         .agg(F.count(F.lit(1)).alias("c"), F.sum("cents").alias("s")))
    cum = h.selectExpr(
        "grp", "bucket", "c", "s",
        "SUM(c) OVER (PARTITION BY grp ORDER BY bucket "
        "ROWS UNBOUNDED PRECEDING) AS cmc",
        "SUM(s) OVER (PARTITION BY grp ORDER BY bucket "
        "ROWS UNBOUNDED PRECEDING) AS cms")
    pick = (targets.join(cum, "grp")
            .where("cmc - c < r AND cmc >= r")
            .selectExpr("grp", "which", "bucket",
                        "r - (cmc - c) AS off", "cms - s AS prevs"))
    inb = (o.selectExpr("grp", "cents",
                        f"CAST(FLOOR(cents / {TM_BUCKET!r}) AS BIGINT) "
                        "AS bucket")
           .join(F.broadcast(pick), ["grp", "bucket"])
           .groupBy("grp", "which", "off", "prevs", "cents")
           .agg(F.count(F.lit(1)).alias("c")))
    val = inb.selectExpr(
        "grp", "which", "off", "prevs", "cents", "c",
        "SUM(c) OVER (PARTITION BY grp, which ORDER BY cents "
        "ROWS UNBOUNDED PRECEDING) AS cm",
        "SUM(cents * c) OVER (PARTITION BY grp, which ORDER BY cents "
        "ROWS UNBOUNDED PRECEDING) AS sm").where(
        "cm - c < off AND cm >= off")
    return val.selectExpr(
        "grp", "which", "prevs + sm - cents * (cm - off) AS srum")


def q_trimmed_mean(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority AS grp",
        "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents")
    base = o.groupBy("grp").agg(F.count(F.lit(1)).alias("n"),
                                F.sum("cents").alias("total"))
    targets = base.selectExpr(
        "grp",
        "explode(array(named_struct('which', 'lo', 'r', "
        "CAST(FLOOR(n / 10.0) AS BIGINT)), named_struct('which', 'hi', "
        "'r', n - CAST(FLOOR(n / 10.0) AS BIGINT)))) AS t") \
        .selectExpr("grp", "t.which AS which", "t.r AS r")
    s = _smallest_r_sums(o, targets)
    piv = s.groupBy("grp").agg(
        F.expr("MIN(CASE WHEN which = 'lo' THEN srum END)").alias("slo"),
        F.expr("MIN(CASE WHEN which = 'hi' THEN srum END)").alias("shi"))
    return (base.join(piv, "grp")
            .selectExpr(
                "grp", "CAST(n AS BIGINT) AS n",
                "CAST(FLOOR(n / 10.0) AS BIGINT) AS k",
                "CAST(shi - slo AS BIGINT) AS trimmed_sum_cents",
                "ROUND(CAST(shi - slo AS DOUBLE) "
                "/ (n - 2 * CAST(FLOOR(n / 10.0) AS BIGINT)) / 100.0, 6)"
                " AS trimmed_mean"))


ORACLE_TRIMMED = """
WITH o AS (
  SELECT o_orderpriority AS grp, o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders),
r AS (
  SELECT grp, cents,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents, o_orderkey)
           AS rk,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM o)
SELECT grp, CAST(MAX(n) AS BIGINT) AS n,
       CAST(FLOOR(MAX(n) / 10.0) AS BIGINT) AS k,
       CAST(SUM(CASE WHEN rk > FLOOR(n / 10.0)
                      AND rk <= n - FLOOR(n / 10.0)
                     THEN cents ELSE 0 END) AS BIGINT)
         AS trimmed_sum_cents,
       ROUND(CAST(SUM(CASE WHEN rk > FLOOR(n / 10.0)
                            AND rk <= n - FLOOR(n / 10.0)
                           THEN cents ELSE 0 END) AS DOUBLE)
             / (MAX(n) - 2 * CAST(FLOOR(MAX(n) / 10.0) AS BIGINT))
             / 100.0, 6) AS trimmed_mean
FROM r GROUP BY grp
"""


# --- mutual_information: MI between event type and hour-of-day --------------------
#
# The feature-selection staple (chi-square tests independence; MI
# quantifies it in nats): I(X;Y) = Σ p_xy ln(p_xy n / (n_x n_y / n))
# over the bounded 5×24 contingency table, plus both marginal entropies
# and the normalized MI.  Every p·ln term quantizes to 1e-8 nats before
# the (cell-bounded) sum — the image_entropy rule; the LN argument is
# an exact integer ratio (nxy·n ≤ 2^52 at gate scale; DECIMAL at larger
# n, noted).  One corpus groupBy with map-side combine; everything
# after runs on ≤120 rows.

MI_Q = 100_000_000


def q_mutual_information(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    xy = (e.selectExpr(
        "event_type AS x",
        "CAST(FLOOR(unix_micros(CAST(ts AS TIMESTAMP_LTZ)) / 3600000000.0)"
        " AS BIGINT) % 24 AS y")
        .groupBy("x", "y").agg(F.count(F.lit(1)).alias("nxy")))
    nx = xy.groupBy("x").agg(F.sum("nxy").alias("nx"))
    ny = xy.groupBy("y").agg(F.sum("nxy").alias("ny"))
    n = xy.groupBy().agg(F.sum("nxy").alias("n"))
    mi = (xy.join(nx, "x").join(ny, "y").crossJoin(F.broadcast(n))
          .selectExpr(
              "n",
              "CAST(FLOOR((CAST(nxy AS DOUBLE) / n) * LN(CAST(nxy AS "
              f"DOUBLE) * n / nx / ny) * {float(MI_Q)!r} + 0.5) AS BIGINT)"
              " AS t")
          .groupBy("n").agg(F.sum("t").alias("mi_q")))
    hx = (nx.crossJoin(F.broadcast(n))
          .selectExpr(
              "CAST(FLOOR((CAST(nx AS DOUBLE) / n) * LN(CAST(nx AS "
              f"DOUBLE) / n) * {float(MI_Q)!r} + 0.5) AS BIGINT) AS t")
          .groupBy().agg((-F.sum("t")).alias("hx_q")))
    hy = (ny.crossJoin(F.broadcast(n))
          .selectExpr(
              "CAST(FLOOR((CAST(ny AS DOUBLE) / n) * LN(CAST(ny AS "
              f"DOUBLE) / n) * {float(MI_Q)!r} + 0.5) AS BIGINT) AS t")
          .groupBy().agg((-F.sum("t")).alias("hy_q")))
    return (mi.crossJoin(hx).crossJoin(hy).selectExpr(
        "CAST(n AS BIGINT) AS n_events",
        "CAST(mi_q AS BIGINT) AS mi_q",
        "CAST(hx_q AS BIGINT) AS hx_q",
        "CAST(hy_q AS BIGINT) AS hy_q",
        f"ROUND(CAST(mi_q AS DOUBLE) / {float(MI_Q)!r}, 6) AS mi_nats",
        "ROUND(CAST(mi_q AS DOUBLE) / SQRT(CAST(hx_q AS DOUBLE) * hy_q),"
        " 6) AS nmi"))


ORACLE_MI = f"""
WITH xy AS (
  SELECT event_type AS x,
         CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) % 24 AS y,
         COUNT(*) AS nxy
  FROM events GROUP BY 1, 2),
nx AS (SELECT x, SUM(nxy) AS nx FROM xy GROUP BY x),
ny AS (SELECT y, SUM(nxy) AS ny FROM xy GROUP BY y),
nn AS (SELECT SUM(nxy) AS n FROM xy),
mi AS (
  SELECT MAX(n) AS n,
         SUM(CAST(FLOOR((CAST(nxy AS DOUBLE) / n) * LN(CAST(nxy AS DOUBLE) * n / nx / ny) * {float(MI_Q)!r} + 0.5) AS BIGINT)) AS mi_q
  FROM xy JOIN nx ON nx.x = xy.x JOIN ny ON ny.y = xy.y CROSS JOIN nn),
hx AS (
  SELECT -SUM(CAST(FLOOR((CAST(nx AS DOUBLE) / n) * LN(CAST(nx AS DOUBLE) / n) * {float(MI_Q)!r} + 0.5) AS BIGINT)) AS hx_q
  FROM nx CROSS JOIN nn),
hy AS (
  SELECT -SUM(CAST(FLOOR((CAST(ny AS DOUBLE) / n) * LN(CAST(ny AS DOUBLE) / n) * {float(MI_Q)!r} + 0.5) AS BIGINT)) AS hy_q
  FROM ny CROSS JOIN nn)
SELECT CAST(n AS BIGINT) AS n_events, CAST(mi_q AS BIGINT) AS mi_q,
       CAST(hx_q AS BIGINT) AS hx_q, CAST(hy_q AS BIGINT) AS hy_q,
       ROUND(CAST(mi_q AS DOUBLE) / {float(MI_Q)!r}, 6) AS mi_nats,
       ROUND(CAST(mi_q AS DOUBLE) / SQRT(CAST(hx_q AS DOUBLE) * hy_q), 6)
         AS nmi
FROM mi CROSS JOIN hx CROSS JOIN hy
"""


# --- text_curation_pipeline: the full text-curation chain under ONE oracle --------
#
# The text twin of image_curation_pipeline (the e2e composition rows the
# round treats as north stars): inject known duplicates → language
# filter → quality filter → exact dedup keep-first → deterministic
# 80/10/10 split → per-split corpus stats.  Every stage is an existing
# gated operator's semantics; the composition is the thing being proven
# (filters commute with the injection, dedup keeps originals, the split
# is partitioning-independent).  Duplicates are INJECTED by re-keying
# the lowest doc_ids (+1e6) because the base corpus has no exact dups at
# the gate SFs — the geofence equal-but-empty lesson: every stage's
# effect is asserted non-degenerate in pytest at every SF.  Quality
# scores quantize to 1e-6 units before summing (no transcendental ops →
# the shared literal is bit-identical, the floor is exact).

PIPE_T_DUPS = 40
PIPE_T_OFF = 1_000_000
PIPE_T_QUAL = 640_000  # 0.64 in 1e-6 units; corpus q10≈0.616, q50≈0.66

_TQ_SCORE = ("(LEAST(CAST(n_chars AS DOUBLE), 500.0) / 500.0 * 0.3 "
             "+ (CAST(uq AS DOUBLE) / n) * 0.4 "
             "+ (CAST(1 AS DOUBLE) - CAST(st AS DOUBLE) / n) * 0.3)")
_TQ_Q = f"CAST(FLOOR({_TQ_SCORE} * 1000000.0 + 0.5) AS BIGINT)"


def q_text_curation_pipeline(spark, sf_dir):
    from .hashing import mix_sql
    d = _t(spark, sf_dir, "documents")
    dups = d.where(f"doc_id < {PIPE_T_DUPS}").selectExpr(
        f"doc_id + {PIPE_T_OFF} AS doc_id", "text", "lang", "source",
        "n_chars")
    corpus = d.unionByName(dups.select(*d.columns))
    feat = corpus.selectExpr(
        "doc_id", "lang", "n_chars", "text",
        "CAST(size(split(text, ' ')) AS DOUBLE) AS n",
        "CAST(size(array_distinct(split(text, ' '))) AS DOUBLE) AS uq",
        "CAST(size(filter(split(text, ' '), x -> x IN ('a', 'the'))) "
        "AS DOUBLE) AS st")
    filt = (feat.selectExpr("doc_id", "lang", "n_chars", "text",
                            f"{_TQ_Q} AS qq")
            .where(f"lang = 'en' AND qq > {PIPE_T_QUAL}"))
    surv = (filt.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies"),
                 F.min("n_chars").alias("n_chars"),
                 F.min("qq").alias("qq")))
    split = (f"CASE WHEN {mix_sql('keep_id')} % 100 < 80 THEN 'train' "
             f"WHEN {mix_sql('keep_id')} % 100 < 90 THEN 'val' "
             "ELSE 'test' END")
    return (surv.selectExpr(f"{split} AS split", "keep_id", "n_copies",
                            "n_chars", "qq")
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_copies").alias("n_members"),
                 F.sum("keep_id").alias("id_checksum"),
                 F.sum("n_chars").alias("sum_chars"),
                 F.sum("qq").alias("sum_qq"))
            .selectExpr(
                "split", "CAST(n_docs AS BIGINT) AS n_docs",
                "CAST(n_members AS BIGINT) AS n_members",
                "CAST(id_checksum AS BIGINT) AS id_checksum",
                "CAST(sum_chars AS BIGINT) AS sum_chars",
                "ROUND(CAST(sum_qq AS DOUBLE) / n_docs / 1000000.0, 6) "
                "AS mean_quality"))


def _oracle_text_pipeline() -> str:
    from .hashing import mix_sql
    split = (f"CASE WHEN {mix_sql('keep_id')} % 100 < 80 THEN 'train' "
             f"WHEN {mix_sql('keep_id')} % 100 < 90 THEN 'val' "
             "ELSE 'test' END")
    return f"""
WITH corpus AS (
  SELECT doc_id, text, lang, n_chars FROM documents
  UNION ALL
  SELECT doc_id + {PIPE_T_OFF}, text, lang, n_chars FROM documents
  WHERE doc_id < {PIPE_T_DUPS}),
feat AS (
  SELECT doc_id, lang, n_chars, text,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           AS uq,
         CAST(len(list_filter(string_split(text, ' '),
              x -> x IN ('a', 'the'))) AS DOUBLE) AS st
  FROM corpus),
filt AS (
  SELECT doc_id, lang, n_chars, text, {_TQ_Q} AS qq
  FROM feat WHERE lang = 'en' AND {_TQ_Q} > {PIPE_T_QUAL}),
surv AS (
  SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies,
         MIN(n_chars) AS n_chars, MIN(qq) AS qq
  FROM filt GROUP BY 1)
SELECT {split} AS split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_copies) AS BIGINT) AS n_members,
       CAST(SUM(keep_id) AS BIGINT) AS id_checksum,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       ROUND(CAST(SUM(qq) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
         AS mean_quality
FROM surv GROUP BY 1
"""


# --- cdc_chunking: content-defined chunk dedup -------------------------------------
#
# The FastCDC/rsync storage-dedup technique, distinct from BOTH
# fixed-window passages (dedup_passages) and whole-doc hashing
# (dedup_exact): a chunk boundary falls AFTER any token in a fixed
# content predicate (the gear-hash `h % 2^k == 0` rule with the hash
# replaced by a declared literal token set — boundaries depend only on
# LOCAL content, the property that matters).  Because boundaries are
# content-local, an insertion near a doc's head re-chunks only the
# chunk it lands in — every later chunk still dedups (fixed windows
# lose ALL downstream chunks to the offset shift; pytest proves both
# halves of that contrast).  One doc-keyed window pass + one
# chunk-text-keyed distinct; never all-pairs.

CDC_CUTS = ("the", "a", "value", "data", "row", "join")


def q_cdc_chunking(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    cuts = ", ".join(f"'{t}'" for t in CDC_CUTS)
    ex = (d.select("doc_id", "source",
                   F.posexplode(F.split("text", " ")).alias("pos", "t"))
          .selectExpr("doc_id", "source", "pos", "t",
                      f"CASE WHEN t IN ({cuts}) THEN 1 ELSE 0 END AS cut"))
    withc = ex.selectExpr(
        "doc_id", "source", "pos", "t",
        "SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos "
        "ROWS UNBOUNDED PRECEDING) - cut AS chunk_id")
    chunks = (withc.groupBy("doc_id", "source", "chunk_id")
              .agg(F.count(F.lit(1)).alias("n_toks"),
                   F.concat_ws(" ", F.expr(
                       "transform(array_sort(collect_list("
                       "struct(pos, t))), s -> s.t)")).alias("chunk")))
    return (chunks.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.countDistinct("chunk").alias("n_distinct"),
                 F.sum("n_toks").alias("sum_toks"),
                 F.sum(F.length("chunk")).alias("sum_chars"))
            .selectExpr(
                "source", "CAST(n_chunks AS BIGINT) AS n_chunks",
                "CAST(n_distinct AS BIGINT) AS n_distinct",
                "CAST(sum_toks AS BIGINT) AS sum_toks",
                "CAST(sum_chars AS BIGINT) AS sum_chars",
                "ROUND(CAST(n_distinct AS DOUBLE) / n_chunks, 6) "
                "AS unique_ratio",
                "ROUND(CAST(sum_toks AS DOUBLE) / n_chunks, 6) "
                "AS mean_chunk_toks"))


def _oracle_cdc() -> str:
    cuts = ", ".join(f"'{t}'" for t in CDC_CUTS)
    return f"""
WITH ex AS (
  SELECT doc_id, source, CAST(u.i AS BIGINT) AS pos, ts[u.i] AS t
  FROM (SELECT doc_id, source, string_split(text, ' ') AS ts
        FROM documents) d,
  UNNEST(range(1, len(ts) + 1)) AS u(i)),
withc AS (
  SELECT doc_id, source, pos, t,
         SUM(CASE WHEN t IN ({cuts}) THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING)
         - CASE WHEN t IN ({cuts}) THEN 1 ELSE 0 END AS chunk_id
  FROM ex),
chunks AS (
  SELECT doc_id, source, chunk_id, COUNT(*) AS n_toks,
         string_agg(t, ' ' ORDER BY pos) AS chunk
  FROM withc GROUP BY 1, 2, 3)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(COUNT(DISTINCT chunk) AS BIGINT) AS n_distinct,
       CAST(SUM(n_toks) AS BIGINT) AS sum_toks,
       CAST(SUM(LENGTH(chunk)) AS BIGINT) AS sum_chars,
       ROUND(CAST(COUNT(DISTINCT chunk) AS DOUBLE) / COUNT(*), 6)
         AS unique_ratio,
       ROUND(CAST(SUM(n_toks) AS DOUBLE) / COUNT(*), 6)
         AS mean_chunk_toks
FROM chunks GROUP BY source
"""


# --- sketch_mergeability: the DataSketches builtins + the merge law ---------------
#
# Completes C11's surveyed builtin surface (hll_sketch_agg /
# theta_sketch_agg; kll_* is absent from this build — checked, noted):
# per-group sketches, each estimate gated against the exact distinct
# count at 3-sigma-ish bounds (the approx_sketches rule), PLUS the
# property that makes sketches THE 1000-executor aggregation primitive:
# MERGEABILITY — the union of per-group sketches must satisfy the SAME
# error bound as one direct pass.  Found while building: estimate
# equality between the two aggregation paths is NOT guaranteed (a
# uniform-data probe showed de == me, but on the real table HLL's
# direct estimate differs from the union-of-groups estimate — the
# library's contract is bounded error for merged sketches, not
# register-path equality), so the gated law is the bounded one.  The
# oracle recomputes the exact counts and expects every boolean TRUE.

def q_sketch_mergeability(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("sm_lineitem")
    return spark.sql("""
        WITH per AS (
          SELECT l_returnflag AS g,
                 hll_sketch_agg(l_partkey) AS sk,
                 theta_sketch_agg(l_partkey) AS tk,
                 COUNT(DISTINCT l_partkey) AS exact_parts
          FROM sm_lineitem GROUP BY l_returnflag),
        direct AS (
          SELECT hll_sketch_estimate(hll_sketch_agg(l_partkey)) AS de,
                 theta_sketch_estimate(theta_sketch_agg(l_partkey)) AS dt,
                 COUNT(DISTINCT l_partkey) AS exact_total
          FROM sm_lineitem),
        merged AS (
          SELECT hll_sketch_estimate(hll_union_agg(sk)) AS me,
                 theta_sketch_estimate(theta_union_agg(tk)) AS mt
          FROM per)
        SELECT g, CAST(exact_parts AS BIGINT) AS exact_parts,
               ABS(hll_sketch_estimate(sk) - exact_parts)
                 <= exact_parts * 0.15 AS hll_ok,
               ABS(theta_sketch_estimate(tk) - exact_parts)
                 <= exact_parts * 0.10 AS theta_ok
        FROM per
        UNION ALL
        SELECT 'ALL', CAST(exact_total AS BIGINT),
               ABS(de - exact_total) <= exact_total * 0.15
                 AND ABS(me - exact_total) <= exact_total * 0.15,
               ABS(dt - exact_total) <= exact_total * 0.10
                 AND ABS(mt - exact_total) <= exact_total * 0.10
        FROM direct CROSS JOIN merged""")


ORACLE_SKETCH_MERGE = """
SELECT l_returnflag AS g,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS hll_ok, TRUE AS theta_ok
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'ALL', CAST(COUNT(DISTINCT l_partkey) AS BIGINT), TRUE, TRUE
FROM lineitem
"""


# --- audio_curation_pipeline: the audio e2e chain under ONE oracle -----------------
#
# Completes the e2e triptych (image_curation_pipeline, text_curation_
# pipeline, and now audio): synthesize → REAL RIFF/WAV encode+decode →
# feature extraction (silence windows, zero-crossing rate, peak
# amplitude, energy — each an already-gated operator's exact-integer
# semantics) → quality filters (mostly-non-silent AND zc-rate ≥ 20/win,
# thresholds chosen from the measured feature distribution so BOTH
# branches are non-empty — the equal-but-empty rule) → exact dedup by
# the full feature fingerprint (streams 24..31 are PLANTED duplicates
# of 0..7 via the j = i % 24 generator index; keep-first keeps the
# original id) → per-channel-group corpus stats.  The oracle recomputes
# every feature from the sample formula by lattice sums and replays the
# identical filter/dedup/group chain.

N_APL = 32
APL_GEN = 24  # generator period: streams 24..31 duplicate 0..7


def q_audio_curation_pipeline(spark, sf_dir):
    from . import riff

    schema = T.StructType([
        T.StructField("media_id", T.LongType()),
        T.StructField("n_windows", T.LongType()),
        T.StructField("n_silent", T.LongType()),
        T.StructField("zc_total", T.LongType()),
        T.StructField("peak", T.LongType()),
        T.StructField("energy", T.LongType()),
    ])

    def work(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype(int):
                j = i % APL_GEN
                n = 1024 + (j * 256) % 1281
                k = np.arange(n, dtype=np.int64)
                u = (j * 48271 + k * 16807) % 65536
                env = (j * 31 + (k // 256) * 97) % 5
                s = ((u % 8192 - 4096) * env).astype(np.int16)
                wav, rate = riff.wav_decode(riff.wav_encode(s, 16000))
                got = np.round(wav[:, 0].astype(np.float64)
                               * 32768.0).astype(np.int64)
                assert rate == 16000 and len(got) == n
                nw = n // 256
                w = got[:nw * 256].reshape(nw, 256)
                e = (w * w).sum(axis=1)
                silent = int((e * 16 < 256 * 4096 * 4096).sum())
                neg = w < 0
                zc = int((neg[:, 1:] != neg[:, :-1]).sum())
                peak = int(max(got.max(), -got.min()))
                rows.append((int(i), nw, silent, zc, peak, int(e.sum())))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    feats = (spark.range(0, N_APL, numPartitions=4)
             .mapInPandas(work, schema))
    kept = feats.where("n_silent * 4 <= n_windows "
                       "AND zc_total >= n_windows * 20")
    surv = (kept.groupBy("n_windows", "n_silent", "zc_total", "peak",
                         "energy")
            .agg(F.min("media_id").alias("keep_id"),
                 F.count(F.lit(1)).alias("n_copies")))
    return (surv.selectExpr("keep_id % 4 AS grp", "keep_id", "n_copies",
                            "zc_total", "energy")
            .groupBy("grp")
            .agg(F.count(F.lit(1)).alias("n_streams"),
                 F.sum("n_copies").alias("n_members"),
                 F.sum("keep_id").alias("id_checksum"),
                 F.sum("zc_total").alias("sum_zc"),
                 F.sum("energy").alias("sum_energy"))
            .selectExpr("CAST(grp AS BIGINT) AS grp",
                        "CAST(n_streams AS BIGINT) AS n_streams",
                        "CAST(n_members AS BIGINT) AS n_members",
                        "CAST(id_checksum AS BIGINT) AS id_checksum",
                        "CAST(sum_zc AS BIGINT) AS sum_zc",
                        "CAST(sum_energy AS BIGINT) AS sum_energy"))


def _oracle_audio_pipeline() -> str:
    s = ("((((j * 48271 + k * 16807) % 65536) % 8192 - 4096) * "
         "((j * 31 + CAST(FLOOR(k / 256.0) AS BIGINT) * 97) % 5))")
    s_next = ("((((j * 48271 + (k + 1) * 16807) % 65536) % 8192 - 4096) * "
              "((j * 31 + CAST(FLOOR((k + 1) / 256.0) AS BIGINT) * 97) "
              "% 5))")
    return f"""
WITH ids AS (
  SELECT i, i % {APL_GEN} AS j,
         1024 + ((i % {APL_GEN}) * 256) % 1281 AS n
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {N_APL - 1})) AS i) t),
samp AS (
  SELECT i, n, CAST(FLOOR(k / 256.0) AS BIGINT) AS wnd, k,
         {s} AS s,
         CASE WHEN k % 256 < 255
                AND k < CAST(FLOOR(n / 256.0) AS BIGINT) * 256 - 1
                AND ({s} < 0) <> ({s_next} < 0)
              THEN 1 ELSE 0 END AS zc
  FROM ids, GENERATE_SERIES(0, 2400) g(k)
  WHERE k < CAST(FLOOR(n / 256.0) AS BIGINT) * 256),
wind AS (
  SELECT i, n, wnd, SUM(s * s) AS e, SUM(zc) AS zc FROM samp
  GROUP BY 1, 2, 3),
feats AS (
  SELECT i AS media_id, COUNT(*) AS n_windows,
         SUM(CASE WHEN e * 16 < 4294967296 THEN 1 ELSE 0 END) AS n_silent,
         SUM(zc) AS zc_total,
         (SELECT GREATEST(MAX(s), -MIN(s)) FROM samp s2
          WHERE s2.i = wind.i) AS peak,
         SUM(e) AS energy
  FROM wind GROUP BY i),
kept AS (
  SELECT * FROM feats
  WHERE n_silent * 4 <= n_windows AND zc_total >= n_windows * 20),
surv AS (
  SELECT n_windows, n_silent, zc_total, peak, energy,
         MIN(media_id) AS keep_id, COUNT(*) AS n_copies
  FROM kept GROUP BY 1, 2, 3, 4, 5)
SELECT CAST(keep_id % 4 AS BIGINT) AS grp,
       CAST(COUNT(*) AS BIGINT) AS n_streams,
       CAST(SUM(n_copies) AS BIGINT) AS n_members,
       CAST(SUM(keep_id) AS BIGINT) AS id_checksum,
       CAST(SUM(zc_total) AS BIGINT) AS sum_zc,
       CAST(SUM(energy) AS BIGINT) AS sum_energy
FROM surv GROUP BY 1
"""


QUERIES.update({
    "trimmed_mean": (q_trimmed_mean, ORACLE_TRIMMED),
    "mutual_information": (q_mutual_information, ORACLE_MI),
    "text_curation_pipeline": (q_text_curation_pipeline,
                               _oracle_text_pipeline()),
    "cdc_chunking": (q_cdc_chunking, _oracle_cdc()),
    "sketch_mergeability": (q_sketch_mergeability, ORACLE_SKETCH_MERGE),
    "audio_curation_pipeline": (q_audio_curation_pipeline,
                                _oracle_audio_pipeline()),
})


# --- bpe_apply: tokenizer ENCODE with a fixed merge ranking -----------------------
#
# The inference twin of bpe_learn_merges: a trained tokenizer ships a
# merge TABLE, and encoding applies each merge in rank order corpus-wide
# with the same left-to-right greedy non-overlap semantics (match islands,
# odd island-ranks win). Rank 3 merges a token PRODUCED by rank 1
# ('the' + 'order_fast') — the cascade a real BPE vocabulary exercises.
# Per rank this is one doc-keyed window pass; merge literals fold into the
# plan (no broadcast needed at all), localCheckpoint keeps lineage O(1);
# at 100 TB each rank is one shuffle on doc_id and the working set only
# shrinks. The oracle unrolls the ranks as MATERIALIZED CTE chains.

BPE_APPLY_MERGES = (("order", "fast"), ("data", "slow"),
                    ("the", "order_fast"), ("merge", "part"))


def q_bpe_apply(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    rows = (d.select("doc_id", F.posexplode(F.split("text", " "))
                     .alias("pos", "t"))
            .localCheckpoint())
    wd = W.partitionBy("doc_id").orderBy("pos")
    out = None
    for r, (p, q) in enumerate(BPE_APPLY_MERGES, 1):
        pairs = rows.withColumn("nxt", F.lead("t").over(wd))
        m = (pairs.where((F.col("t") == p) & (F.col("nxt") == q))
             .select("doc_id", "pos"))
        m = m.withColumn("rn", F.row_number().over(wd)) \
             .withColumn("grp", F.expr("pos - rn"))
        wg = W.partitionBy("doc_id", "grp").orderBy("pos")
        kept = (m.withColumn("ri", F.row_number().over(wg))
                .where("ri % 2 = 1").select("doc_id", "pos"))
        k = kept.selectExpr("doc_id AS kd", "pos AS kp")
        dl = kept.selectExpr("doc_id AS dd", "pos + 1 AS dp")
        rows = (rows
                .join(k, (F.col("doc_id") == F.col("kd"))
                      & (F.col("pos") == F.col("kp")), "left")
                .join(dl, (F.col("doc_id") == F.col("dd"))
                      & (F.col("pos") == F.col("dp")), "left_anti")
                .selectExpr("doc_id", "pos",
                            f"CASE WHEN kp IS NOT NULL THEN '{p}_{q}' "
                            "ELSE t END AS t")
                .localCheckpoint())
        na = kept.groupBy().agg(F.count(F.lit(1)).alias("napp"))
        ta = rows.groupBy().agg(F.count(F.lit(1)).alias("ta"))
        rec = (na.crossJoin(ta)
               .selectExpr(f"CAST({r} AS INT) AS rank", f"'{p}' AS lhs",
                           f"'{q}' AS rhs",
                           "CAST(napp AS BIGINT) AS n_applied",
                           "CAST(ta AS BIGINT) AS tokens_after"))
        out = rec if out is None else out.unionByName(rec)
    return out


def _oracle_bpe_apply() -> str:
    rounds = []
    for r, (p, q) in enumerate(BPE_APPLY_MERGES, 1):
        prev = f"r{r - 1}"
        rounds.append(f"""
m{r} AS MATERIALIZED (
  SELECT doc_id, pos,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS rn
  FROM (SELECT doc_id, pos, t,
               LEAD(t) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
        FROM {prev}) pr
  WHERE pr.t = '{p}' AND pr.nxt = '{q}'),
k{r} AS MATERIALIZED (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           ROW_NUMBER() OVER (PARTITION BY doc_id, pos - rn
                              ORDER BY pos) AS ri
    FROM m{r}) s WHERE ri % 2 = 1),
r{r} AS MATERIALIZED (
  SELECT rr.doc_id, rr.pos,
         CASE WHEN k.pos IS NOT NULL THEN '{p}_{q}' ELSE rr.t END AS t
  FROM {prev} rr
  LEFT JOIN k{r} k ON k.doc_id = rr.doc_id AND k.pos = rr.pos
  WHERE NOT EXISTS (SELECT 1 FROM k{r} dd
                    WHERE dd.doc_id = rr.doc_id
                      AND dd.pos = rr.pos - 1))""")
    selects = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INT) AS rank, '{p}' AS lhs, '{q}' AS rhs, "
        f"CAST((SELECT COUNT(*) FROM k{r}) AS BIGINT) AS n_applied, "
        f"CAST((SELECT COUNT(*) FROM r{r}) AS BIGINT) AS tokens_after"
        for r, (p, q) in enumerate(BPE_APPLY_MERGES, 1))
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
r0 AS MATERIALIZED (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, ts[u.i] AS t
  FROM toks, UNNEST(range(1, len(ts) + 1)) AS u(i)),
{','.join(rounds)}
{selects}
"""


# --- readability_scores: Flesch-family corpus audit -------------------------------
#
# The classic quality lens a curation pipeline reports next to the Gopher
# signals: reading-ease and grade-level from exact integer counts — words
# (split size), vowel-group "syllables" (regexp_count on the identical
# '[aeiou]+' pattern in both engines), and ceil(words/15) pseudo-sentences
# (the corpus has no punctuation; the chunk length is a declared constant).
# Each doc's score is ONE literal float expression over three ints,
# floor-quantized to 1e-6 BEFORE the per-language aggregation (the repo's
# autocorr rule), so corpus sums stay exact int64 at any order.

READ_SENT_LEN = 15

_READ_EXPRS = (
    "CAST(1 + (nw - 1) DIV {d} AS BIGINT)",      # Spark integer division
    "CAST(1 + (nw - 1) // {d} AS BIGINT)",       # DuckDB integer division
)
_FLESCH = ("(206.835 - 1.015 * (CAST(nw AS DOUBLE) / ns) "
           "- 84.6 * (CAST(nsyl AS DOUBLE) / nw))")
_GRADE = ("(0.39 * (CAST(nw AS DOUBLE) / ns) "
          "+ 11.8 * (CAST(nsyl AS DOUBLE) / nw) - 15.59)")


def q_readability_scores(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    per = d.selectExpr(
        "lang",
        "size(split(text, ' ')) AS nw",
        "regexp_count(text, '[aeiou]+') AS nsyl",
    ).selectExpr(
        "lang", "nw", "nsyl",
        _READ_EXPRS[0].format(d=READ_SENT_LEN) + " AS ns",
    ).selectExpr(
        "lang", "nw", "nsyl", "ns",
        f"CAST(FLOOR({_FLESCH} * 1000000.0) AS BIGINT) AS fq",
        f"CAST(FLOOR({_GRADE} * 1000000.0) AS BIGINT) AS gq",
    )
    return (per.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("nw").alias("sum_words"),
                 F.sum("nsyl").alias("sum_syll"),
                 F.sum("fq").alias("sum_fq"),
                 F.min("fq").alias("min_fq"),
                 F.max("fq").alias("max_fq"),
                 F.sum("gq").alias("sum_gq"))
            .selectExpr(
                "lang", "CAST(n_docs AS BIGINT) AS n_docs",
                "CAST(sum_words AS BIGINT) AS sum_words",
                "CAST(sum_syll AS BIGINT) AS sum_syll",
                "CAST(min_fq AS BIGINT) AS min_fq",
                "CAST(max_fq AS BIGINT) AS max_fq",
                "ROUND(CAST(sum_fq AS DOUBLE) / n_docs / 1000000.0, 6)"
                " AS mean_flesch",
                "ROUND(CAST(sum_gq AS DOUBLE) / n_docs / 1000000.0, 6)"
                " AS mean_grade"))


def _oracle_readability() -> str:
    return f"""
WITH per0 AS (
  SELECT lang, len(string_split(text, ' ')) AS nw,
         len(regexp_extract_all(text, '[aeiou]+')) AS nsyl
  FROM documents),
per1 AS (
  SELECT lang, nw, nsyl,
         {_READ_EXPRS[1].format(d=READ_SENT_LEN)} AS ns
  FROM per0),
per AS (
  SELECT lang, nw, nsyl, ns,
         CAST(FLOOR({_FLESCH} * 1000000.0) AS BIGINT) AS fq,
         CAST(FLOOR({_GRADE} * 1000000.0) AS BIGINT) AS gq
  FROM per1)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nw) AS BIGINT) AS sum_words,
       CAST(SUM(nsyl) AS BIGINT) AS sum_syll,
       CAST(MIN(fq) AS BIGINT) AS min_fq,
       CAST(MAX(fq) AS BIGINT) AS max_fq,
       ROUND(CAST(CAST(SUM(fq) AS BIGINT) AS DOUBLE) / COUNT(*)
             / 1000000.0, 6) AS mean_flesch,
       ROUND(CAST(CAST(SUM(gq) AS BIGINT) AS DOUBLE) / COUNT(*)
             / 1000000.0, 6) AS mean_grade
FROM per GROUP BY lang
"""


QUERIES.update({
    "bpe_apply": (q_bpe_apply, _oracle_bpe_apply()),
    "readability_scores": (q_readability_scores, _oracle_readability()),
})


# --- stem_collapse: suffix-stripping normalization + vocabulary collapse ----
#
# The tokenizer-adjacent curation primitive BPE doesn't cover: rule-based
# suffix stripping (the Porter step-1 family) that collapses inflected
# forms onto one stem before dedup/counting.  The fixture corpus is a
# fixed word-soup vocabulary with no inflections, so the op PLANTS them
# deterministically — token at position p of doc d takes the suffix
# selected by (d + p) % 4 (none / 'ing' / 'ed' / 's') — then stems with
# four guarded rules (min-stem-length + the 'ss' exception) and reports
# per-stem collapse stats.  Everything is string surgery on a bounded
# vocabulary: substr/length/|| only (no regex — the pii_scrub
# cross-dialect backslash lesson), output rows bounded by vocab x 4,
# and the corpus-scale work is one explode + one stem-keyed groupBy.
# pytest proves stem(inflect(w)) == w for every guard-eligible vocab
# word against a sequential python stemmer (planted-structure rule: the
# gate alone can't distinguish "correct" from "never fired").

def _stem_case(w: str) -> str:
    """The shared stemmer CASE — identical text on both engines."""
    return (f"CASE "
            f"WHEN length({w}) >= 6 AND substr({w}, length({w}) - 2, 3) "
            f"= 'ing' THEN substr({w}, 1, length({w}) - 3) "
            f"WHEN length({w}) >= 5 AND substr({w}, length({w}) - 2, 3) "
            f"= 'ies' THEN substr({w}, 1, length({w}) - 3) || 'y' "
            f"WHEN length({w}) >= 5 AND substr({w}, length({w}) - 1, 2) "
            f"= 'ed' THEN substr({w}, 1, length({w}) - 2) "
            f"WHEN length({w}) >= 4 AND substr({w}, length({w}) - 1, 2) "
            f"<> 'ss' AND substr({w}, length({w}), 1) = 's' "
            f"THEN substr({w}, 1, length({w}) - 1) "
            f"ELSE {w} END")


_INFLECT_CASE = ("CASE (doc_id + pos) % 4 "
                 "WHEN 1 THEN tok || 'ing' "
                 "WHEN 2 THEN tok || 'ed' "
                 "WHEN 3 THEN tok || 's' "
                 "ELSE tok END")


def q_stem_collapse(spark, sf_dir):
    toks = (_t(spark, sf_dir, "documents")
            .selectExpr("doc_id",
                        "posexplode(split(text, ' ')) AS (pos, tok)")
            .selectExpr("doc_id", "pos", f"{_INFLECT_CASE} AS w"))
    stemmed = toks.selectExpr("w", f"{_stem_case('w')} AS stem")
    return (stemmed.groupBy("stem")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.countDistinct("w").alias("n_forms"),
                 F.expr("SUM(CASE WHEN w = stem THEN 1 ELSE 0 END)")
                 .alias("n_bare"))
            .selectExpr("stem", "CAST(n_tokens AS BIGINT) AS n_tokens",
                        "CAST(n_forms AS BIGINT) AS n_forms",
                        "CAST(n_bare AS BIGINT) AS n_bare",
                        "n_forms > 1 AS collapsed"))


def _oracle_stem() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
pos AS (
  SELECT doc_id, CAST(u.i AS BIGINT) AS pos, ts[u.i + 1] AS tok
  FROM toks, UNNEST(range(0, len(ts))) AS u(i)),
infl AS (
  SELECT {_INFLECT_CASE} AS w FROM pos),
st AS (
  SELECT w, {_stem_case('w')} AS stem FROM infl)
SELECT stem, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_forms,
       CAST(SUM(CASE WHEN w = stem THEN 1 ELSE 0 END) AS BIGINT) AS n_bare,
       COUNT(DISTINCT w) > 1 AS collapsed
FROM st GROUP BY stem
"""


QUERIES.update({
    "stem_collapse": (q_stem_collapse, _oracle_stem()),
})


# --- audio_autocorr_pitch: autocorrelation period detection -----------------
#
# The time-domain pitch detector (the classic sibling of
# audio_spectral_peak's DFT bin argmax): each stream plants a square wave
# of known period P(i) plus small deterministic noise, samples roundtrip
# through the REAL RIFF/WAV encode+decode walk (int16 is exact), and the
# detected period is argmax_tau R(tau) over lags 16..64 where
# R(tau) = SUM_k s[k]*s[k+tau] — every product and sum an exact int64
# (|s| <= 1539, n = 2048 ⇒ R <= 4.9e9).  Ties break to the smallest lag.
# The oracle replays the identical sample formula over a
# (stream x lag x sample) lattice and the same argmax; pytest asserts
# best_lag == planted P for EVERY stream (planted-structure rule) against
# a sequential python scan.  Scale shape: streams are independent rows
# through mapInPandas — the corpus axis parallelizes embarrassingly; the
# 49-lag correlation is a vectorized per-row kernel, never a join.

N_PITCH_WAV = 20
PITCH_N = 2048
PITCH_TAU_MIN, PITCH_TAU_MAX = 16, 64


def pitch_period(i: int) -> int:
    return 20 + (i * 7) % 40


def q_audio_autocorr_pitch(spark, sf_dir, n_streams: int = N_PITCH_WAV,
                           partitions: int = 4):
    from . import riff

    schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("best_lag", T.LongType()),
        T.StructField("r_best", T.LongType()),
        T.StructField("r_zero", T.LongType()),
        T.StructField("n_samples", T.LongType()),
    ])

    def work(batches):
        n = PITCH_N
        k = np.arange(n, dtype=np.int64)
        taus = np.arange(PITCH_TAU_MIN, PITCH_TAU_MAX + 1, dtype=np.int64)
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype(int):
                p = pitch_period(int(i))
                amp = 512 + (i * 137) % 1024
                base = np.where((k % p) * 2 < p, amp, -amp)
                noise = (i * 48271 + k * 16807) % 7 - 3
                s = (base + noise).astype(np.int16)
                wav, rate = riff.wav_decode(riff.wav_encode(s, 16000))
                got = np.round(wav[:, 0].astype(np.float64)
                               * 32768.0).astype(np.int64)
                assert rate == 16000 and len(got) == n
                rs = np.array([np.dot(got[:n - t], got[t:])
                               for t in taus], dtype=np.int64)
                b = int(np.argmax(rs))  # np.argmax takes the FIRST max
                rows.append((f"wav{i:03d}", int(taus[b]), int(rs[b]),
                             int(np.dot(got, got)), n))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return (spark.range(0, n_streams, numPartitions=partitions)
            .mapInPandas(work, schema))


def _oracle_pitch() -> str:
    def samp(k: str) -> str:
        p = "(20 + (i * 7) % 40)"
        amp = "(512 + (i * 137) % 1024)"
        return (f"(CASE WHEN (({k}) % {p}) * 2 < {p} THEN {amp} "
                f"ELSE -{amp} END + (i * 48271 + ({k}) * 16807) % 7 - 3)")
    return f"""
WITH ids AS (
  SELECT i FROM (SELECT UNNEST(GENERATE_SERIES(0, {N_PITCH_WAV - 1})) AS i)),
corr AS (
  SELECT i, t.tau, SUM({samp('g.k')} * {samp('g.k + t.tau')}) AS r
  FROM ids,
       GENERATE_SERIES({PITCH_TAU_MIN}, {PITCH_TAU_MAX}) t(tau),
       GENERATE_SERIES(0, {PITCH_N - 1}) g(k)
  WHERE g.k < {PITCH_N} - t.tau
  GROUP BY 1, 2),
zero AS (
  SELECT i, SUM({samp('g.k')} * {samp('g.k')}) AS r0
  FROM ids, GENERATE_SERIES(0, {PITCH_N - 1}) g(k) GROUP BY 1),
best AS (
  SELECT i, tau, r,
         ROW_NUMBER() OVER (PARTITION BY i ORDER BY r DESC, tau ASC) AS rk
  FROM corr)
SELECT printf('wav%03d', b.i) AS media_id,
       CAST(b.tau AS BIGINT) AS best_lag,
       CAST(b.r AS BIGINT) AS r_best,
       CAST(z.r0 AS BIGINT) AS r_zero,
       CAST({PITCH_N} AS BIGINT) AS n_samples
FROM best b JOIN zero z ON z.i = b.i
WHERE b.rk = 1
"""


QUERIES.update({
    "audio_autocorr_pitch": (q_audio_autocorr_pitch, _oracle_pitch()),
})


# --- mmr_rerank: maximal-marginal-relevance diversification -------------------
#
# The search-results diversifier (Carbonell-Goldstein MMR) completing
# the retrieval stack after bm25_search (score) and rrf_fusion
# (combine): per query term, greedy re-ranking picks argmax of
# 7*tf - 3*max_sim_to_selected (lambda = 0.7 in integer tenths — the
# whole objective stays int64), K = 4 unrolled picks.  Relevance = the
# term's count in the doc; redundancy = shared-distinct-word overlap
# between candidate docs.  Scale: candidates prune to top-8 per term
# BEFORE the pairwise-similarity join (8x8 per query, never corpus
# pairs); the greedy unroll runs on <= 48-row tables.  Oracle:
# identical chained MATERIALIZED CTE steps.

MMR_TERMS = ("scan", "join", "window", "merge", "sort", "value")
MMR_CANDS = 8
MMR_K = 4
MMR_REL_W = 7
MMR_DIV_W = 3

_MMR_BASE = """
words AS{mz} (
  SELECT doc_id, w FROM (
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS w
    FROM documents) t),
tf AS{mz} (
  SELECT w AS term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
  FROM words WHERE w IN ({terms}) GROUP BY 1, 2),
cands AS{mz} (
  SELECT term, doc_id, tf FROM (
    SELECT term, doc_id, tf,
           ROW_NUMBER() OVER (PARTITION BY term
             ORDER BY tf DESC, doc_id) AS rn
    FROM tf) t WHERE rn <= {ncand}),
cvocab AS{mz} (
  SELECT DISTINCT cands.term, cands.doc_id, words.w
  FROM cands JOIN words ON words.doc_id = cands.doc_id),
sims AS{mz} (
  SELECT a.term, a.doc_id AS da, b.doc_id AS db,
         CAST(COUNT(*) AS BIGINT) AS sim
  FROM cvocab a JOIN cvocab b
    ON a.term = b.term AND a.w = b.w AND a.doc_id != b.doc_id
  GROUP BY 1, 2, 3)"""

_MMR_STEP = """
sc{k} AS{mz} (
  SELECT c.term, c.doc_id, c.tf,
         COALESCE(MAX(ss.sim), 0) AS maxsim
  FROM cands c
  LEFT JOIN sel{p} q ON q.term = c.term AND q.doc_id = c.doc_id
  LEFT JOIN (SELECT s.term, s.da, s.sim FROM sims s
             JOIN sel{p} z ON z.term = s.term AND z.doc_id = s.db) ss
    ON ss.term = c.term AND ss.da = c.doc_id
  WHERE q.doc_id IS NULL
  GROUP BY 1, 2, 3),
pick{k} AS{mz} (
  SELECT term, doc_id, tf, maxsim,
         {relw} * tf - {divw} * maxsim AS score, {k} AS pick_idx
  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY term
          ORDER BY {relw} * tf - {divw} * maxsim DESC, doc_id) AS rn
        FROM sc{k}) t WHERE rn = 1),
sel{k} AS{mz} (
  SELECT term, doc_id FROM sel{p}
  UNION ALL SELECT term, doc_id FROM pick{k})"""


def _mmr_sql(mz: str) -> str:
    terms = ", ".join(f"'{t}'" for t in MMR_TERMS)
    parts = [_MMR_BASE.format(mz=mz, terms=terms, ncand=MMR_CANDS),
             f"sel0 AS{mz} (SELECT term, doc_id FROM cands WHERE FALSE)"]
    for k in range(1, MMR_K + 1):
        parts.append(_MMR_STEP.format(
            mz=mz, k=k, p=k - 1, relw=MMR_REL_W, divw=MMR_DIV_W))
    union = "\nUNION ALL\n".join(
        f"SELECT term, CAST(pick_idx AS INT) AS pick_idx, doc_id, tf, "
        f"CAST(maxsim AS BIGINT) AS maxsim, CAST(score AS BIGINT) "
        f"AS score FROM pick{k}" for k in range(1, MMR_K + 1))
    return "WITH " + ",".join(parts) + "\n" + union


def q_mmr_rerank(spark, sf_dir):
    # Spark lacks UNNEST/string_split: rebuild the base tables with
    # DataFrame ops, localCheckpoint the three multi-referenced small
    # tables, then run the unrolled greedy steps as one SQL
    d = _t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    words.createOrReplaceTempView("mmr_words")
    terms = ", ".join(f"'{t}'" for t in MMR_TERMS)
    cands = spark.sql(f"""
        SELECT term, doc_id, tf FROM (
          SELECT w AS term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
                 ROW_NUMBER() OVER (PARTITION BY w
                   ORDER BY COUNT(*) DESC, doc_id) AS rn
          FROM mmr_words WHERE w IN ({terms}) GROUP BY 1, 2) t
        WHERE rn <= {MMR_CANDS}""").localCheckpoint()
    cands.createOrReplaceTempView("cands")
    sims = spark.sql("""
        WITH cvocab AS (
          SELECT DISTINCT cands.term, cands.doc_id, mmr_words.w
          FROM cands JOIN mmr_words
            ON mmr_words.doc_id = cands.doc_id)
        SELECT a.term, a.doc_id AS da, b.doc_id AS db,
               CAST(COUNT(*) AS BIGINT) AS sim
        FROM cvocab a JOIN cvocab b
          ON a.term = b.term AND a.w = b.w AND a.doc_id != b.doc_id
        GROUP BY 1, 2, 3""").localCheckpoint()
    sims.createOrReplaceTempView("sims")
    parts = ["sel0 AS (SELECT term, doc_id FROM cands WHERE FALSE)"]
    for k in range(1, MMR_K + 1):
        parts.append(_MMR_STEP.format(
            mz="", k=k, p=k - 1, relw=MMR_REL_W, divw=MMR_DIV_W))
    union = "\nUNION ALL\n".join(
        f"SELECT term, CAST(pick_idx AS INT) AS pick_idx, doc_id, tf, "
        f"CAST(maxsim AS BIGINT) AS maxsim, CAST(score AS BIGINT) "
        f"AS score FROM pick{k}" for k in range(1, MMR_K + 1))
    return spark.sql("WITH " + ",".join(parts) + "\n" + union)


ORACLE_MMR = _mmr_sql(" MATERIALIZED")


QUERIES.update({
    "mmr_rerank": (q_mmr_rerank, ORACLE_MMR),
})
