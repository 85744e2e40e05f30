"""Scale evidence for the continuation-session-7 batch: run the EXACT
gated code paths (same functions __spark_entry__ serves) at ~1000x the
sf0.1 gate volume and record throughput.

- ndcg_at_k        : 100M orders, 40 query groups (two qid-partitioned
                     rank windows sharing one shuffle)
- cuped_adjustment : 100M events (user-keyed aggregate + 4-row moments)
- ipf_raking       : 100M orders (two map-side groupBys + 15-row IPF)
- ransac_line      : 100M events (bucket-min selection pass + ONE
                     broadcast counting/refit pass, 8 candidates)
- polyline_encode  : 100M events over 1M users (one user-keyed shuffle,
                     6-chunk varint string algebra in codegen)
- stable_matching  : 100M lineitem x 10M orders (the corpus join +
                     16-row aggregate dominate; 12 GS rounds are
                     16-row algebra)
- image_seam_carve : 40k real-decode images (12-pass vectorized DP
                     across images x columns per decode stack)

Methodology per the repo bench rules: clearCache() before each timed
trial, plan rebuilt per trial, min over trials.

Usage: python tools/bench_session7.py [n_rows] (default 100_000_000)
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
NO = N // 10          # orders
OUT = "/tmp/bench_session7_sf"
TRIALS = 2


def synthesize(spark):
    marker = os.path.join(OUT, f"N_{N}")
    if os.path.isdir(os.path.join(OUT, "lineitem.parquet")) \
            and os.path.exists(marker):
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
         f"{u01_sql('id * 7 + 3')} * 1000.0 AS value")
     .write.parquet(f"{OUT}/events.parquet"))
    (spark.range(0, NO, 1, 256)
     .selectExpr(
         "id AS o_orderkey", "id % 1000000 AS o_custkey",
         # (id % 9) DIV 3 decorrelates status from the id % 3 == 0
         # sample filter ipf_raking applies (id % 3 alone would make
         # the sample all-'F' and collapse the cell table)
         "CASE (id % 9) DIV 3 WHEN 0 THEN 'F' WHEN 1 THEN 'O' "
         "ELSE 'P' END AS o_orderstatus",
         f"{u01_sql('id * 13 + 7')} * 100000.0 AS o_totalprice",
         "CASE id % 5 WHEN 0 THEN '1-URGENT' WHEN 1 THEN '2-HIGH' "
         "WHEN 2 THEN '3-MEDIUM' WHEN 3 THEN '4-NOT SPECIFIED' "
         "ELSE '5-LOW' END AS o_orderpriority")
     .write.parquet(f"{OUT}/orders.parquet"))
    (spark.range(0, N, 1, 256)
     .selectExpr(
         f"id % {NO} AS l_orderkey", "id % 100000 AS l_suppkey",
         f"1.0 + FLOOR({u01_sql('id * 19 + 1')} * 50.0) AS l_quantity",
         f"{u01_sql('id * 23 + 2')} * 90000.0 AS l_extendedprice")
     .write.parquet(f"{OUT}/lineitem.parquet"))
    # marker LAST: a crash mid-write must force resynthesis next run
    open(marker, "w").close()


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

    from spark_shp import queries_analytics as qa
    from spark_shp import queries_eval as qe
    from spark_shp import queries_ml as qm
    from spark_shp import queries_vision as qv

    timed("ndcg_at_k", lambda: qe.q_ndcg_at_k(spark, OUT), NO, results)
    timed("cuped_adjustment",
          lambda: qe.q_cuped_adjustment(spark, OUT), N, results)
    timed("ipf_raking", lambda: qe.q_ipf_raking(spark, OUT), NO, results)
    timed("ransac_line", lambda: qm.q_ransac_line(spark, OUT), N, results)
    timed("polyline_encode",
          lambda: qa.q_polyline_encode(spark, OUT)
          .selectExpr("COUNT(*) AS users", "SUM(n_chars) AS chars"),
          N, results)
    timed("stable_matching",
          lambda: qe.q_stable_matching(spark, OUT), N, results)

    qv.VISION_N = 40000
    timed("image_seam_carve",
          lambda: qv.q_image_seam_carve(spark, OUT)
          .selectExpr("COUNT(*) AS n", "SUM(dp_checksum) AS chk"),
          40000, results, unit="images")

    results.pop("_spark")
    print(json.dumps({"n": N, "results": results}))


if __name__ == "__main__":
    main()
