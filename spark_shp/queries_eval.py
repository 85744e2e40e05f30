"""Serving / eval wave (round-3 continuation session 6):

lakehouse    — pit_join_scd2: point-in-time (AS OF) fact-to-dimension
               join against the SCD type-2 dimension scd2_intervals
               builds — the lookup side of every warehouse dimension
               load.  The naive form is an interval theta join (fact.ts
               BETWEEN valid_from AND valid_to) that Spark executes as a
               broadcast-nested-loop or a per-key pair blow-up; this
               re-plans it as the asof_join_event_order union-merge
               (ONE shuffle on the key, linear per key) applied to the
               dimension's change stream.
ML eval      — average_precision: exact AP (area under the PR curve in
               its sum-over-positives form) per segment from integer
               rank sums under a total order, next to roc_auc/lift_gains.
audio QA     — audio_clipping_detect: saturation / clipped-sample audit
               over REAL RIFF/WAV decode (counts, position checksum, and
               the max consecutive-clip run via gaps-and-islands).

All oracle-gated exact (DuckDB twins, parked in registry._TAIL — each
family keeps an in-window row: C5 via asof_join_event_order, C6/C7 via
pricing/window rows, AV via the images/wav lineage).  Reference parity:
upstream shapefile-js is geometry ingest (SURVEY.md §2.A
[RECONSTRUCTED]); these extend the §6 analytics/curation families.

Determinism rules (FIXTURES.md): exact integer distributed aggregates;
floats only in ONE literal expression shared verbatim with the oracle,
under ROUND(...,6); ranks always carry a total-order tiebreak.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql import types as T

_ = (np, pd)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- pit_join_scd2: point-in-time join against the SCD-2 dimension -----------
#
# Semantics: each event picks the dimension version whose half-open
# validity interval [valid_from, valid_to) contains its ts (the version
# with the greatest valid_from <= ts).  Zero-width intervals (two
# priority changes on the same order date) match nothing, exactly as the
# BETWEEN-style oracle join computes.
#
# Plan: the dimension IS its change stream, so the interval join
# collapses to an as-of merge — union the dimension change rows (kind 0,
# at valid_from, ordered by version seq so the last same-instant change
# wins) with the events (kind 1) and carry the latest version forward
# with last(ignorenulls) over an unbounded-preceding window.  ONE
# shuffle on the key and linear work per key; the theta-join form
# materializes every (event x candidate-version) pair first.


def q_pit_join_scd2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = F.when(
        F.lag("o_orderpriority").over(w).isNull()
        | (F.lag("o_orderpriority").over(w) != F.col("o_orderpriority")),
        1).otherwise(0)
    dim = (o.withColumn("chg", chg)
           .withColumn("grp", F.sum("chg").over(
               w.rowsBetween(W.unboundedPreceding, 0)))
           .groupBy("o_custkey", "grp")
           .agg(F.min("o_orderpriority").alias("priority"),
                F.min("o_orderdate").alias("valid_from"),
                F.count(F.lit(1)).alias("n_orders")))

    e = _t(spark, sf_dir, "events")
    dimrows = dim.selectExpr(
        "o_custkey AS user_id", "valid_from AS t", "0 AS kind",
        "grp AS seq", "CAST(NULL AS BIGINT) AS event_id",
        "priority", "valid_from", "CAST(n_orders AS BIGINT) AS n_orders")
    evrows = e.selectExpr(
        "user_id", "ts AS t", "1 AS kind", "event_id AS seq", "event_id",
        "CAST(NULL AS STRING) AS priority",
        "CAST(NULL AS TIMESTAMP) AS valid_from",
        "CAST(NULL AS BIGINT) AS n_orders")
    u = dimrows.unionByName(evrows)
    wm = (W.partitionBy("user_id")
          .orderBy(F.col("t").asc(), F.col("kind").asc(),
                   F.col("seq").asc())
          .rowsBetween(W.unboundedPreceding, 0))
    picked = F.last(
        F.when(F.col("kind") == 0,
               F.struct("priority", "valid_from", "n_orders")),
        ignorenulls=True).over(wm)
    return (u.withColumn("_p", picked)
            .where((F.col("kind") == 1) & F.col("_p").isNotNull())
            .select("event_id", "user_id",
                    F.col("_p.priority").alias("priority"),
                    F.col("_p.valid_from").alias("valid_from"),
                    F.col("_p.n_orders").alias("n_orders")))


ORACLE_PIT = """
WITH o AS (
  SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
         CASE WHEN LAG(o_orderpriority) OVER w IS NULL
              OR LAG(o_orderpriority) OVER w != o_orderpriority
         THEN 1 ELSE 0 END AS chg
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
g0 AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
         SUM(chg) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM o),
g AS (
  SELECT o_custkey, grp, MIN(o_orderpriority) AS priority,
         MIN(o_orderdate) AS valid_from, COUNT(*) AS n_orders
  FROM g0 GROUP BY o_custkey, grp),
scd2 AS (
  SELECT o_custkey, priority, valid_from, n_orders,
         LEAD(valid_from) OVER (PARTITION BY o_custkey ORDER BY grp)
           AS valid_to
  FROM g)
SELECT e.event_id, e.user_id, d.priority, d.valid_from,
       CAST(d.n_orders AS BIGINT) AS n_orders
FROM events e JOIN scd2 d
  ON e.user_id = d.o_custkey
 AND e.ts >= d.valid_from
 AND (d.valid_to IS NULL OR e.ts < d.valid_to)
"""


# --- average_precision: exact AP per segment from integer rank sums ----------
#
# AP in its sum-over-positives form: (1/P) * sum over positive ranks k of
# precision@k.  The ranking is a TOTAL order (score desc, key asc — the
# lift_gains rule), so every engine sees the same permutation; each
# precision@k term is quantized to floor(Q * cum_pos / k) BEFORE the
# variable-cardinality sum, so the distributed aggregate is exact int64
# and the only float op is the final one-literal division.  Plan: one
# shuffle on segment, per-row window inside it (an eval-table shape — at
# corpus scale the per-segment serialization would move to the two-phase
# histogram rank the exact_order_statistics/outlier_audit ops use).

AP_Q = 1_000_000


def q_average_precision(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    r = o.selectExpr(
        "o_orderpriority AS seg",
        "CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS s",
        "o_orderkey AS key",
        "CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y")
    w = W.partitionBy("seg").orderBy(F.desc("s"), F.asc("key"))
    k = (r.withColumn("k", F.row_number().over(w))
         .withColumn("cp", F.sum("y").over(
             w.rowsBetween(W.unboundedPreceding, 0))))
    return (k.groupBy("seg")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("y").alias("p"),
                 F.sum(F.expr(
                     f"CASE WHEN y = 1 THEN ({AP_Q} * cp) DIV k "
                     "ELSE 0 END")).alias("ap_sum_q"))
            .selectExpr(
                "seg", "CAST(n AS BIGINT) AS n", "CAST(p AS BIGINT) AS p",
                "CAST(ap_sum_q AS BIGINT) AS ap_sum_q",
                f"ROUND(CAST(ap_sum_q AS DOUBLE) / "
                f"(CAST(p AS DOUBLE) * {float(AP_Q)!r}), 6) AS ap"))


ORACLE_AP = f"""
WITH r AS (
  SELECT o_orderpriority AS seg,
         CAST(FLOOR(o_totalprice * 100.0) AS BIGINT) AS s,
         o_orderkey AS key,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
  FROM orders),
k AS (
  SELECT seg, y,
         ROW_NUMBER() OVER (PARTITION BY seg ORDER BY s DESC, key) AS k,
         SUM(y) OVER (PARTITION BY seg ORDER BY s DESC, key
                      ROWS UNBOUNDED PRECEDING) AS cp
  FROM r)
SELECT seg, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS p,
       CAST(SUM(CASE WHEN y = 1 THEN ({AP_Q} * cp) // k ELSE 0 END)
            AS BIGINT) AS ap_sum_q,
       ROUND(CAST(SUM(CASE WHEN y = 1 THEN ({AP_Q} * cp) // k ELSE 0 END)
                  AS DOUBLE)
             / (CAST(SUM(y) AS DOUBLE) * {float(AP_Q)!r}), 6) AS ap
FROM k GROUP BY seg
"""


# --- audio_clipping_detect: saturation audit over real WAV decode ------------
#
# The mastering/ingest QA pass every audio pipeline runs: decode PCM
# through the real RIFF walk and count full-scale samples (32767 /
# -32768 — the detector definition: a sample AT the rail is potentially
# clipped), their position-weighted checksum (catches off-by-one frame
# alignment), total |x| mass, and the LONGEST consecutive clipped run
# (gaps-and-islands over sample index).  The synthesis holds its level
# constant over 8-sample blocks (+ a small per-sample dither) and drives
# ~9% of blocks past full scale before the int16 clamp, so clipping is
# BURSTY — multi-sample runs, like real clipped audio; a per-sample
# white synth never clips twice in a row and the max-run column would
# gate nothing (the planted-structure rule caught exactly that on the
# first draft).  Fixture-sized (24 streams), SF-independent, like the
# ZCR/spectral-peak rows; the per-stream kernel is one numpy pass.

N_CLIP_WAV = 24


def q_audio_clipping(spark, sf_dir, n_streams: int = N_CLIP_WAV,
                     partitions: int = 4):
    from . import riff

    schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("n_clip_hi", T.LongType()),
        T.StructField("n_clip_lo", T.LongType()),
        T.StructField("max_clip_run", T.LongType()),
        T.StructField("sum_abs", T.LongType()),
        T.StructField("clip_checksum", T.LongType()),
    ])

    def work(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].astype(int):
                n = 1024 + (i * 256) % 1281
                k = np.arange(n, dtype=np.int64)
                u = (i * 48271 + (k // 8) * 16807) % 65536
                raw = ((u % 9000) - 4500) * 8 + (k % 8)
                s = np.clip(raw, -32768, 32767).astype(np.int16)
                wav, rate = riff.wav_decode(riff.wav_encode(s, 16000))
                got = np.round(wav[:, 0].astype(np.float64)
                               * 32768.0).astype(np.int64)
                assert rate == 16000 and len(got) == n
                clip = (got == 32767) | (got == -32768)
                if clip.any():
                    idx = np.flatnonzero(clip)
                    grp = idx - np.arange(len(idx))
                    runs = np.bincount(grp - grp.min())
                    max_run = int(runs.max())
                else:
                    max_run = 0
                rows.append((f"wav{i:03d}", n,
                             int((got == 32767).sum()),
                             int((got == -32768).sum()),
                             max_run,
                             int(np.abs(got).sum()),
                             int(((k + 1) * clip).sum())))
            yield pd.DataFrame(rows, columns=[f.name for f in schema])

    return (spark.range(0, n_streams, numPartitions=partitions)
            .mapInPandas(work, schema))


def _oracle_clipping() -> str:
    samp = ("LEAST(32767, GREATEST(-32768, "
            "(((i * 48271 + (k // 8) * 16807) % 65536) % 9000 - 4500) * 8"
            " + (k % 8)))")
    return f"""
WITH ids AS (
  SELECT i, 1024 + (i * 256) % 1281 AS n
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {N_CLIP_WAV - 1})) AS i) t),
s AS MATERIALIZED (
  SELECT i, k, {samp} AS v
  FROM ids, GENERATE_SERIES(0, 2400) g(k)
  WHERE k < n),
c AS MATERIALIZED (
  SELECT i, k, v,
         CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END AS clip
  FROM s),
isl AS (
  SELECT i, k - ROW_NUMBER() OVER (PARTITION BY i ORDER BY k) AS grp
  FROM c WHERE clip = 1),
runs AS (SELECT i, COUNT(*) AS run FROM isl GROUP BY i, grp),
mr AS (SELECT i, MAX(run) AS max_run FROM runs GROUP BY i),
per AS (
  SELECT c.i, COUNT(*) AS n_samples,
         SUM(CASE WHEN v = 32767 THEN 1 ELSE 0 END) AS n_clip_hi,
         SUM(CASE WHEN v = -32768 THEN 1 ELSE 0 END) AS n_clip_lo,
         SUM(ABS(v)) AS sum_abs,
         SUM(clip * (k + 1)) AS clip_checksum
  FROM c GROUP BY c.i)
SELECT printf('wav%03d', per.i) AS media_id,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(n_clip_hi AS BIGINT) AS n_clip_hi,
       CAST(n_clip_lo AS BIGINT) AS n_clip_lo,
       CAST(COALESCE(mr.max_run, 0) AS BIGINT) AS max_clip_run,
       CAST(sum_abs AS BIGINT) AS sum_abs,
       CAST(clip_checksum AS BIGINT) AS clip_checksum
FROM per LEFT JOIN mr ON per.i = mr.i
"""


QUERIES: dict = {
    "pit_join_scd2": (q_pit_join_scd2, ORACLE_PIT),
    "average_precision": (q_average_precision, ORACLE_AP),
    "audio_clipping_detect": (q_audio_clipping, _oracle_clipping()),
}


# --- rouge_lcs_pairs: ROUGE-L candidate/reference eval via staged LCS DP ------
#
# The summarization/translation eval metric (Lin 2004): longest common
# SUBSEQUENCE between token sequences, then ROUGE-L F1 = 2*LCS/(m+n).
# Docs pair up (2j = candidate, 2j+1 = reference); each side contributes
# a variable-length token prefix (m = 5 + doc_id % 4 — variable lengths
# exercise the padding semantics a fixed 8x8 grid would hide).  The DP
# d[r][c] = a_r==b_c ? d[r-1][c-1]+1 : max(d[r-1][c], d[r][c-1]) unrolls
# into anti-diagonal staged projections (the trajectory_alignment DTW
# machinery applied to strings): pure codegen CASE/GREATEST over 64
# cells, no Python in the hot path, ONE pair-keyed equi-join.  Padding
# tokens are position-and-side-unique literals, so they never match.
# The F1 is the one-literal float division from exact ints.

LCS_L = 8


def _lcs_pivot(side: str, one_based_brackets: bool = True) -> list:
    """(alias, expr) for the per-doc token-prefix pivot: tok k if k < m
    else a side+position-unique pad literal.  Token access is 1-based in
    both dialects but spelled differently: DuckDB list brackets are
    1-based, Spark brackets are 0-based so the Spark side uses the
    1-based element_at()."""
    acc = (lambda k: f"tk[{k + 1}]") if one_based_brackets \
        else (lambda k: f"element_at(tk, {k + 1})")
    return [(f"{side}_{k}",
             f"CASE WHEN {k} < mlen THEN {acc(k)} "
             f"ELSE '#{side.upper()}{k}' END")
            for k in range(LCS_L)]


def _lcs_dp_stages() -> list:
    """Anti-diagonal LCS DP stages; stage k references stages < k only."""
    L = LCS_L
    match = [(f"e_{r}_{c}",
              f"(CASE WHEN a_{r} = b_{c} THEN 1 ELSE 0 END)")
             for r in range(L) for c in range(L)]
    stages = [match]
    for diag in range(2 * L - 1):
        st = []
        for r in range(L):
            c = diag - r
            if not 0 <= c < L:
                continue
            e = f"e_{r}_{c}"
            if r == 0 and c == 0:
                st.append((f"l_{r}_{c}", f"({e})"))
            elif r == 0:
                st.append((f"l_{r}_{c}",
                           f"(GREATEST(l_{r}_{c - 1}, {e}))"))
            elif c == 0:
                st.append((f"l_{r}_{c}",
                           f"(GREATEST(l_{r - 1}_{c}, {e}))"))
            else:
                st.append((
                    f"l_{r}_{c}",
                    f"(CASE WHEN {e} = 1 THEN l_{r - 1}_{c - 1} + 1 "
                    f"ELSE GREATEST(l_{r - 1}_{c}, l_{r}_{c - 1}) "
                    f"END)"))
        stages.append(st)
    return stages


def q_rouge_lcs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").selectExpr(
        "doc_id", "split(text, ' ') AS tk",
        "5 + doc_id % 4 AS mlen")
    apiv = [f"{e} AS {al}"
            for al, e in _lcs_pivot("a", one_based_brackets=False)]
    bpiv = [f"{e} AS {al}"
            for al, e in _lcs_pivot("b", one_based_brackets=False)]
    a = d.where("doc_id % 2 = 0").selectExpr(
        "doc_id DIV 2 AS pair_id", "mlen AS m", *apiv)
    b = d.where("doc_id % 2 = 1").selectExpr(
        "doc_id DIV 2 AS pair_id", "mlen AS n", *bpiv)
    pairs = a.join(b, "pair_id")
    for st in _lcs_dp_stages():
        pairs = pairs.selectExpr("*", *[f"{e} AS {al}" for al, e in st])
    last = LCS_L - 1
    return pairs.selectExpr(
        "pair_id", "CAST(m AS BIGINT) AS m", "CAST(n AS BIGINT) AS n",
        f"CAST(l_{last}_{last} AS BIGINT) AS lcs",
        f"ROUND(CAST(2 * l_{last}_{last} AS DOUBLE) "
        f"/ CAST(m + n AS DOUBLE), 6) AS rouge_f1")


def _oracle_rouge() -> str:
    apiv = ", ".join(f"{e} AS {al}" for al, e in _lcs_pivot("a"))
    bpiv = ", ".join(f"{e} AS {al}" for al, e in _lcs_pivot("b"))
    ctes = [f"""
base AS (
  SELECT doc_id, string_split(text, ' ') AS tk, 5 + doc_id % 4 AS mlen
  FROM documents),
pa AS (SELECT doc_id // 2 AS pair_id, mlen AS m, {apiv}
       FROM base WHERE doc_id % 2 = 0),
pb AS (SELECT doc_id // 2 AS pair_id, mlen AS n, {bpiv}
       FROM base WHERE doc_id % 2 = 1),
t0 AS (SELECT * FROM pa JOIN pb USING (pair_id))"""]
    prev = "t0"
    for k, st in enumerate(_lcs_dp_stages(), start=1):
        cols = ", ".join(f"{e} AS {al}" for al, e in st)
        ctes.append(f"t{k} AS (SELECT *, {cols} FROM {prev})")
        prev = f"t{k}"
    last = LCS_L - 1
    return ("WITH " + ",".join(ctes) + f"""
SELECT pair_id, CAST(m AS BIGINT) AS m, CAST(n AS BIGINT) AS n,
       CAST(l_{last}_{last} AS BIGINT) AS lcs,
       ROUND(CAST(2 * l_{last}_{last} AS DOUBLE)
             / CAST(m + n AS DOUBLE), 6) AS rouge_f1
FROM {prev}""")


QUERIES.update({
    "rouge_lcs_pairs": (q_rouge_lcs, _oracle_rouge()),
})
