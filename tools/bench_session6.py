"""Scale evidence for the continuation-session-6 batch: run the EXACT
gated code paths (same functions __spark_entry__ serves) at ~1000x the
sf0.1 gate volume and record throughput.

- pit_join_scd2      : 100M events x 10M orders over 1M customers
                       (ONE user-keyed shuffle, linear per key)
- business_day_lag   : 100M events (window min + closed-form calendar)
- geodesic_waypoints : 100M events, user%20 cohort (slerp trig codegen)
- randomized_response: 100M events (pure integer mechanism)
- rouge_lcs_pairs    : 10M documents -> 5M pairs x 64-cell staged DP
- unigram_lm_round   : 10M documents (histogram pass + vocab-bounded DP)
- url_canonicalize   : 10M documents (regex canonical keys + groupBy)
- average_precision  : 10M orders — measured at the DOCUMENTED
                       per-segment serialization (5 segments): the
                       honest cost of the per-row rank window; the
                       two-phase histogram form is the scale path
- image_brief_descriptor / image_bayer_demosaic: 40k real-decode images
- audio_clipping_detect: 4096 RIFF/WAV streams

Methodology per the repo bench rules: clearCache() before each timed
trial, plan rebuilt per trial, min over trials.

Usage: python tools/bench_session6.py [n_rows] (default 100_000_000)
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_shp.hashing import u01_sql  # noqa: E402
from spark_shp.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
ND = N // 10          # documents
NO = N // 10          # orders
OUT = "/tmp/bench_session6_sf"
TRIALS = 2
WORDS = ("the fast key order sort table scan merge part window small hash "
         "join batch stream spark customer line data slow filter value agg "
         "query row group big column vector dup a").split()


def synthesize(spark):
    if os.path.isdir(os.path.join(OUT, "documents.parquet")):
        return
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    (spark.range(0, N, 1, 256)
     .selectExpr(
         "id AS event_id",
         "timestamp_micros(CAST(1600000000000000 + "
         f"{u01_sql('id * 11 + 5')} * 2592000000000.0 AS BIGINT)) AS ts",
         "id % 1000000 AS user_id",
         "CASE id % 7 WHEN 0 THEN 'purchase' WHEN 1 THEN 'view' "
         "WHEN 2 THEN 'click' WHEN 3 THEN 'view' ELSE 'scroll' END "
         "AS event_type")
     .write.parquet(f"{OUT}/events.parquet"))
    (spark.range(0, NO, 1, 256)
     .selectExpr(
         "id AS o_orderkey", "id % 1000000 AS o_custkey",
         "CASE id % 3 WHEN 0 THEN 'F' WHEN 1 THEN 'O' ELSE 'P' END "
         "AS o_orderstatus",
         f"{u01_sql('id * 13 + 7')} * 100000.0 AS o_totalprice",
         "timestamp_micros(CAST(1598000000000000 + "
         f"{u01_sql('id * 17 + 9')} * 31536000000000.0 AS BIGINT)) "
         "AS o_orderdate",
         "CASE id % 5 WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH' "
         "WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN '4-NOT SPECIFIED' "
         "ELSE '5-LOW' END AS o_orderpriority")
     .write.parquet(f"{OUT}/orders.parquet"))
    picks = " , ' ', ".join(
        "CASE CAST(({h}) % {m} AS INT) {arms} END".format(
            h=u01_sql(f"id * 31 + {k}") + " * 4294967296.0",
            m=len(WORDS),
            arms=" ".join(f"WHEN {i} THEN '{w}'"
                          for i, w in enumerate(WORDS)))
        for k in range(10))
    (spark.range(0, ND, 1, 256)
     .selectExpr("id AS doc_id", f"concat({picks}) AS text")
     .selectExpr("doc_id", "text", "LENGTH(text) AS n_chars")
     .write.parquet(f"{OUT}/documents.parquet"))


def timed(name, fn, rows, results, unit="rows"):
    spark = results.pop("_spark")
    times, out_rows = [], None
    for _ in range(TRIALS):
        spark.catalog.clearCache()
        t = time.time()
        res = fn().collect()
        times.append(time.time() - t)
        out_rows = len(res)
    best = min(times)
    results[name] = {
        f"input_{unit}": rows, "out_rows": out_rows,
        "sec": round(best, 2),
        f"{unit}_per_sec": round(rows / best),
    }
    results["_spark"] = spark
    print(f"# {name}: {rows} {unit} in {best:.2f}s "
          f"({rows / best / 1e6:.3f}M {unit}/s)", flush=True)


def main():
    spark = get_spark(cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    results = {"_spark": spark}
    synthesize(spark)

    from spark_shp import queries_eval as qe
    from spark_shp import queries_vision as qv

    timed("pit_join_scd2", lambda: qe.q_pit_join_scd2(spark, OUT)
          .groupBy("priority").count(), N, results)
    timed("business_day_lag", lambda: qe.q_business_day_lag(spark, OUT),
          N, results)
    timed("geodesic_waypoints",
          lambda: qe.q_geodesic_waypoints(spark, OUT)
          .selectExpr("SUM(CAST(mid_lon * 1000.0 AS BIGINT)) AS s",
                      "COUNT(*) AS n"), N, results)
    timed("randomized_response",
          lambda: qe.q_randomized_response(spark, OUT), N, results)
    timed("rouge_lcs_pairs", lambda: qe.q_rouge_lcs(spark, OUT)
          .groupBy("lcs").count(), ND, results, unit="docs")
    timed("unigram_lm_round", lambda: qe.q_unigram_lm_round(spark, OUT),
          ND, results, unit="docs")
    timed("url_canonicalize", lambda: qe.q_url_canonicalize(spark, OUT)
          .selectExpr("COUNT(*) AS n", "SUM(n_docs) AS d"),
          ND, results, unit="docs")
    timed("average_precision_serialized_form",
          lambda: qe.q_average_precision(spark, OUT), NO, results)

    qv.VISION_N = 40000
    timed("image_brief_descriptor",
          lambda: qv.q_image_brief(spark, OUT), 40000, results,
          unit="images")
    timed("image_bayer_demosaic",
          lambda: qv.q_image_demosaic(spark, OUT), 40000, results,
          unit="images")
    timed("audio_clipping_detect",
          lambda: qe.q_audio_clipping(spark, OUT, n_streams=4096,
                                      partitions=64),
          4096, results, unit="streams")

    results.pop("_spark")
    print(json.dumps({"n": N, "results": results}))


if __name__ == "__main__":
    main()
